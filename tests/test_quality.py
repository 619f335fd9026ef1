"""Quality operators: self-trained bigram-LM cross-entropy and benchmark
decontamination (operators/quality.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.dedup import ngram_shingles
from simplir_spark.operators.quality import decontaminate, lm_cross_entropy


def test_lm_cross_entropy_hand_computed(spark):
    # corpus: d1 = "aaa bbb aaa bbb", d2 = "aaa bbb ccc"
    # bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b),(b,c)
    # C(a,b)=3 C(b,a)=1 C(b,c)=1 ; C(a.)=3 C(b.)=2 ; V={aaa,bbb,ccc}=3
    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa bbb"), (2, "aaa bbb ccc"), (3, "solo")],
        "doc_key long, content string",
    )
    tok = with_tokens(docs).withColumnRenamed("doc_key", "doc_id")
    out = {r.doc_id: r for r in lm_cross_entropy(tok, round_dp=None).collect()}

    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    h1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    h2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1].n_bigrams == 3 and out[1].cross_entropy == pytest.approx(h1)
    assert out[2].n_bigrams == 2 and out[2].cross_entropy == pytest.approx(h2)
    assert out[3].n_bigrams == 0 and out[3].cross_entropy is None
    # the repetitive doc is more predictable than the novel-bigram doc
    assert out[1].cross_entropy < out[2].cross_entropy


def test_decontaminate_planted_copy(spark):
    bench_text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, bench_text),                             # the benchmark doc
            (2, "prefix " + bench_text + " suffix"),     # contains it -> hit
            (3, "alpha beta nothing shared here at all"),  # partial, no 5-gram
        ],
        "doc_key long, content string",
    )
    tok = with_tokens(docs).withColumnRenamed("doc_key", "doc_id")
    sh = ngram_shingles(tok, n=5)
    bench = ngram_shingles(tok.filter(F.col("doc_id") == 1), n=5)
    out = {r.doc_id: (r.n_hits, r.contaminated) for r in decontaminate(sh, bench).collect()}
    assert out[1] == (1, True)   # self
    assert out[2] == (1, True)   # planted copy inside longer doc
    assert out[3] == (0, False)


def test_decontaminate_bloom_matches_broadcast(spark, corpus_small):
    """The Bloom scale path (bitset prefilter + exact confirm join) must
    be bit-identical to the exact broadcast path: no false negatives by
    construction, false positives removed by the confirm join."""
    tok = with_tokens(corpus_small).withColumnRenamed("doc_key", "doc_id")
    sh = ngram_shingles(tok, n=3)
    # benchmark = shingles of a deterministic ~1/7 of docs (mixed hit/miss)
    bench = sh.filter(F.pmod(F.xxhash64("doc_id"), F.lit(7)) == 0).select(
        "doc_id", "shingle"
    )
    exact = sorted(
        tuple(r) for r in decontaminate(sh, bench, method="broadcast").collect()
    )
    bloom = sorted(
        tuple(r)
        for r in decontaminate(sh, bench, method="bloom", bloom_fpp=0.05).collect()
    )
    assert bloom == exact
    assert any(r[2] for r in exact) and not all(r[2] for r in exact)


def test_bloom_bitset_no_false_negatives_and_bounded_fp(spark):
    """Membership contract of the Bloom primitive itself: every inserted
    value passes the prefilter; the FP rate on disjoint values stays near
    the configured fpp (generous x5 bound for a small-m fixture)."""
    from simplir_spark.operators.quality import (
        bloom_parameters,
        bloom_prefilter,
        build_bloom_bitset,
    )

    n = 2000
    inserted = spark.range(n).select(
        F.concat(F.lit("in-"), F.col("id")).alias("v")
    )
    other = spark.range(20000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("v")
    )
    bits, m, k = build_bloom_bitset(inserted, "v", n, fpp=0.01)
    assert (m, k) == bloom_parameters(n, 0.01)
    assert bloom_prefilter(inserted, "v", bits, m, k).count() == n
    fp = bloom_prefilter(other, "v", bits, m, k).count()
    assert fp / 20000 <= 0.05


def test_repetition_stats_hand_computed(spark):
    """Hand-checked duplicate-token / duplicate-n-gram fractions,
    including the too-short-for-n-gram edge (fraction 0)."""
    from pyspark.sql import functions as F

    from simplir_spark.functions.text import repetition_stats

    rows = [
        # terms: [aaa bbb aaa bbb] -> tokens 4 distinct 2 -> dup_tok 0.5
        # 2-grams: [aaa bbb, bbb aaa, aaa bbb] -> 3 total 2 distinct -> 1/3
        # 3-grams: [aaa bbb aaa, bbb aaa bbb] -> 2 total 2 distinct -> 0
        (1, ["aaa", "bbb", "aaa", "bbb"]),
        (2, ["unique"]),          # too short for any n-gram
        (3, []),                  # empty doc
        (4, ["xxx", "xxx", "xxx"]),  # all repeated: dup_tok 2/3, g2 1/2, g3 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, terms array<string>")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert (got[1]["n_tokens"], got[1]["dup_token_frac"]) == (4, 0.5)
    assert got[1]["dup_2gram_frac"] == round(1 / 3, 6)
    assert got[1]["dup_3gram_frac"] == 0.0
    assert (got[2]["n_tokens"], got[2]["dup_2gram_frac"]) == (1, 0.0)
    assert (got[3]["n_tokens"], got[3]["dup_token_frac"]) == (0, 0.0)
    assert got[4]["dup_token_frac"] == round(2 / 3, 6)
    assert got[4]["dup_2gram_frac"] == 0.5
    assert got[4]["dup_3gram_frac"] == 0.0


def test_pii_stats_and_redaction_planted(spark):
    """Planted PII of every class is counted and redacted; clean text is
    untouched; URL digits are not double-matched as phones."""
    from simplir_spark.operators.pii import pii_stats, redact_pii

    rows = [
        (1, "contact me at jane.doe+x@example.org or bob@sub.host.co"),
        (2, "see https://example.com/a/123-456-7890?q=1 for details"),
        (3, "server at 10.0.255.7 and call +1 (415) 555-0132 now"),
        (4, "a perfectly clean sentence with number 42 and word seven"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_stats(docs).collect()}
    assert (got[1].n_email, got[1].n_pii) == (2, 2)
    assert (got[2].n_url, got[2].n_phone, got[2].n_pii) == (1, 0, 1)
    assert (got[3].n_ipv4, got[3].n_phone, got[3].n_pii) == (1, 1, 2)
    assert got[4].n_pii == 0 and got[5].n_pii == 0

    red = {r.doc_id: r.redacted_text for r in redact_pii(docs).collect()}
    assert red[1] == "contact me at <EMAIL> or <EMAIL>"
    assert red[2] == "see <URL> for details"
    assert "<IPV4>" in red[3] and "<PHONE>" in red[3]
    assert "555" not in red[3] and "10.0.255.7" not in red[3]
    assert red[4] == rows[3][1] and red[5] == ""


def test_pii_counts_match_duckdb_patterns(spark):
    """The Spark regexp_count and the oracle's regexp_extract_all must
    agree on awkward inputs (shared Java/RE2 pattern subset)."""
    import duckdb

    from simplir_spark.operators.pii import pii_oracle_sql_columns, pii_stats

    rows = [
        (1, "a@b.co c@d.io http://x.io/9-555-123-4567 9.9.9.9"),
        (2, "+44 20 7946 0958, 999.999.999.999, not@an@email"),
        (3, "digits 12 34 56 78 90 11 22 in prose and v1.2.3.4 tag"),
        (4, "mixed: foo@bar.museum https://a.b/c?d=e#f 0.0.0.0 (02) 1234 5678"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spark_rows = {r.doc_id: r.asDict() for r in pii_stats(docs).collect()}
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    ora = con.sql(
        f"SELECT doc_id, {pii_oracle_sql_columns()} FROM documents"
    ).df()
    for _, orow in ora.iterrows():
        srow = spark_rows[orow.doc_id]
        for c in ("n_email", "n_url", "n_ipv4", "n_phone", "n_pii"):
            assert srow[c] == orow[c], (orow.doc_id, c, srow[c], orow[c])


def test_histogram_ignores_nulls_and_handles_constant_column(spark):
    # regression: NULL values used to land in the TOP bin (width_bucket
    # returns NULL and F.least skips nulls); a constant column under auto
    # bounds made every bucket NULL
    from simplir_spark.operators.stats import histogram

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (None,), (3.0,)], "v double"
    )
    out = {r["bucket"]: r["n"] for r in histogram(df, "v", n_bins=2).collect()}
    assert sum(out.values()) == 3  # nulls contribute to NO bin
    const = spark.createDataFrame([(7.0,)] * 4, "v double")
    out2 = {r["bucket"]: r["n"] for r in histogram(const, "v", n_bins=5).collect()}
    assert out2 == {1: 4}  # degenerate range widens; all rows in bucket 1
    empty = spark.createDataFrame([], "v double")
    assert histogram(empty, "v", n_bins=3).count() == 0


def test_pii_phone_does_not_eat_dates_and_url_is_engine_identical(spark):
    # regression: the phone pattern matched ISO dates (8 digits with
    # dashes) and the URL pattern used [^\s], whose \s differs between
    # Java regex and RE2 on \x0B
    import duckdb

    from simplir_spark.operators.pii import (
        PII_PATTERNS,
        pii_oracle_sql_columns,
        pii_stats,
    )

    rows = [
        (1, "released on 2026-08-17 and 2027-01-02"),
        (2, "call +1 (415) 555-0123 or 4155550123"),
        (3, "see http://a.com\x0b1.2.3.4 now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_phone"], r["n_url"], r["n_ipv4"])
           for r in pii_stats(docs).collect()}
    assert got[1][0] == 0  # dates are not phones
    assert got[2][0] == 2
    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in rows)
            + ") t(doc_id, text)")
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            "SELECT doc_id, n_phone, n_url, n_ipv4 FROM (SELECT doc_id, "
            + pii_oracle_sql_columns()
            + " FROM documents)"
        ).fetchall()
    }
    assert got == want  # including the \x0B document

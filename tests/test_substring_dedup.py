"""Repeated-substring detection/removal (Lee et al. 2021 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _tokdf(spark, docs):
    return spark.createDataFrame(
        [(i, toks) for i, toks in docs], "doc_id long, terms array<string>"
    )


def test_cross_doc_shared_block_detected_exactly(spark):
    from simplir_spark.operators.substring_dedup import repeated_spans

    shared = [f"shr{i}" for i in range(12)]
    a = [f"apre{i}" for i in range(6)] + shared + [f"asuf{i}" for i in range(4)]
    b = [f"bpre{i}" for i in range(3)] + shared + [f"bsuf{i}" for i in range(7)]
    c = [f"uniq{i}" for i in range(20)]
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(_tokdf(spark, [(1, a), (2, b), (3, c)]), n=5).collect()
    }
    # the maximal duplicated span is exactly the shared block in each doc
    assert spans == {(1, 6, 18), (2, 3, 15)}


def test_within_doc_repetition_detected(spark):
    from simplir_spark.operators.substring_dedup import repeated_spans

    t = [f"rep{i}" for i in range(5)]
    d = [f"x{i}" for i in range(7)] + t + [f"y{i}" for i in range(8)] + t
    spans = sorted(
        (r.span_start, r.span_end)
        for r in repeated_spans(_tokdf(spark, [(9, d)]), n=5).collect()
    )
    assert spans == [(7, 12), (20, 25)]


def test_adjacent_and_overlapping_windows_merge_into_one_span(spark):
    from simplir_spark.operators.substring_dedup import repeated_spans

    # two copies of a LONG block -> many overlapping duplicate windows
    # that must fuse into one maximal span per copy, not window confetti
    blk = [f"blk{i}" for i in range(30)]
    d1 = [f"p{i}" for i in range(4)] + blk
    d2 = blk + [f"q{i}" for i in range(6)]
    out = repeated_spans(_tokdf(spark, [(1, d1), (2, d2)]), n=8).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in out}
    assert got == {(1, 4, 34), (2, 0, 30)}


def test_strip_removes_exactly_the_spans(spark):
    from simplir_spark.operators.substring_dedup import (
        repeated_spans,
        strip_repeated_spans,
    )

    shared = [f"shr{i}" for i in range(12)]
    a = [f"apre{i}" for i in range(6)] + shared + [f"asuf{i}" for i in range(4)]
    b = [f"bpre{i}" for i in range(3)] + shared + [f"bsuf{i}" for i in range(7)]
    c = [f"uniq{i}" for i in range(20)]
    tok = _tokdf(spark, [(1, a), (2, b), (3, c)])
    spans = repeated_spans(tok, n=5)
    out = {r.doc_id: r for r in strip_repeated_spans(tok, spans).collect()}
    assert out[1].n_removed == 12 and out[2].n_removed == 12
    assert out[3].n_removed == 0
    assert out[1].cleaned_text.split() == a[:6] + a[18:]
    assert out[2].cleaned_text.split() == b[:3] + b[15:]
    assert out[3].cleaned_text.split() == c
    assert all(out[i].n_tokens == len(t) for i, t in [(1, a), (2, b), (3, c)])


def test_short_docs_and_no_duplicates_are_safe(spark):
    from simplir_spark.operators.substring_dedup import (
        repeated_spans,
        strip_repeated_spans,
    )

    tok = _tokdf(spark, [(1, ["one", "two"]), (2, [])])
    spans = repeated_spans(tok, n=5)
    assert spans.count() == 0
    out = {r.doc_id: r for r in strip_repeated_spans(tok, spans).collect()}
    assert out[1].cleaned_text == "one two" and out[1].n_removed == 0
    assert out[2].cleaned_text == "" and out[2].n_tokens == 0


def test_rolling_method_matches_expr_method(spark):
    """The Karp-Rabin scale path must produce span-identical output to the
    oracle-checked md5-expr path — on crafted fixtures AND the real
    sf0.001 corpus (small vocab -> plenty of genuine duplication)."""
    from simplir_spark.functions.tokenize import with_tokens
    from simplir_spark.operators.substring_dedup import repeated_spans
    from simplir_spark.sources.corpus import load_corpus

    shared = [f"shr{i}" for i in range(12)]
    a = [f"apre{i}" for i in range(6)] + shared + [f"asuf{i}" for i in range(4)]
    b = [f"bpre{i}" for i in range(3)] + shared + [f"bsuf{i}" for i in range(7)]
    t = [f"rep{i}" for i in range(5)]
    d = [f"x{i}" for i in range(7)] + t + [f"y{i}" for i in range(8)] + t
    fix = _tokdf(spark, [(1, a), (2, b), (3, d), (4, ["one", "two"]), (5, [])])
    for n in (5, 8):
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in repeated_spans(fix, n=n, method="rolling").collect()
        }
        want = {
            (r.doc_id, r.span_start, r.span_end)
            for r in repeated_spans(fix, n=n, method="expr").collect()
        }
        assert got == want and want

    tok = with_tokens(load_corpus(spark, "/root/testdata/sf0.001")).withColumnRenamed(
        "doc_key", "doc_id"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(tok, n=6, method="rolling").collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(tok, n=6, method="expr").collect()
    }
    assert got == want and want


def test_spans_are_disjoint_and_cover_only_duplicated_windows(spark):
    """Structural invariants on the real corpus at sf0.001: spans sorted
    per doc are pairwise disjoint, each >= n long, in bounds, and every
    span is wall-to-wall composed of globally-duplicated windows."""
    from simplir_spark.functions.tokenize import with_tokens
    from simplir_spark.operators.substring_dedup import (
        positional_window_hashes,
        repeated_spans,
    )
    from simplir_spark.sources.corpus import load_corpus

    n = 6
    tok = with_tokens(load_corpus(spark, "/root/testdata/sf0.001")).withColumnRenamed(
        "doc_key", "doc_id"
    )
    spans = repeated_spans(tok, n=n).collect()
    assert spans, "synthetic corpus has a small vocab; expected duplicated spans"
    lens = {r.doc_id: r for r in tok.select("doc_id", F.size("terms").alias("nt")).collect()}
    per_doc: dict = {}
    for r in spans:
        assert r.span_end - r.span_start >= n
        assert 0 <= r.span_start < r.span_end <= lens[r.doc_id].nt
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for sp in per_doc.values():
        sp.sort()
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert e1 < s2  # disjoint with a real gap (else they'd merge)

    dup_pos = {
        (r.doc_id, r.pos)
        for r in positional_window_hashes(tok, n)
        .groupBy("h")
        .agg(F.collect_list(F.struct("doc_id", "pos")).alias("ps"))
        .filter(F.size("ps") >= 2)
        .select(F.explode("ps").alias("p"))
        .select(F.col("p.doc_id").alias("doc_id"), F.col("p.pos").alias("pos"))
        .collect()
    }
    for did, sp in per_doc.items():
        for s, e in sp:
            for p in range(s, e - n + 1):
                assert (did, p) in dup_pos, (did, p)


def test_keep_first_preserves_canonical_copy(spark):
    """keep='first': the lowest-(doc,pos) copy of a repeated block
    survives stripping whole; later copies (cross-doc AND within-doc)
    are still removed; unique content is never touched."""
    from simplir_spark.operators.substring_dedup import (
        repeated_spans,
        strip_repeated_spans,
    )

    blk = [f"blk{i}" for i in range(10)]
    a = [f"a{i}" for i in range(4)] + blk + [f"az{i}" for i in range(3)]
    b = [f"b{i}" for i in range(6)] + blk + [f"bz{i}" for i in range(2)]
    c = blk + [f"c{i}" for i in range(5)] + blk  # within-doc repeat too
    fix = _tokdf(spark, [(1, a), (2, b), (3, c), (4, ["solo", "words"])])

    spans_first = repeated_spans(fix, n=5, keep="first")
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans_first.collect()}
    # canonical copy = doc 1 (lowest id): its block survives; doc 2's and
    # BOTH of doc 3's copies are marked (doc 3's first copy is still not
    # the global canonical)
    assert all(d != 1 for d, _, _ in got)
    assert any(d == 2 for d, _, _ in got) and any(d == 3 for d, _, _ in got)

    stripped = {
        r.doc_id: r for r in strip_repeated_spans(fix, spans_first).collect()
    }
    assert stripped[1].n_removed == 0
    assert stripped[1].cleaned_text == " ".join(a)
    assert stripped[2].n_removed >= len(blk)
    assert "blk0" not in stripped[2].cleaned_text
    assert "blk0" not in stripped[3].cleaned_text
    assert stripped[4].n_removed == 0

    # keep='all' removes every copy including the canonical
    spans_all = repeated_spans(fix, n=5, keep="all")
    all_stripped = {
        r.doc_id: r for r in strip_repeated_spans(fix, spans_all).collect()
    }
    assert all_stripped[1].n_removed >= len(blk)


def test_keep_first_rolling_matches_expr(spark):
    """keep='first' composes with the Karp-Rabin scale path."""
    from simplir_spark.operators.substring_dedup import repeated_spans

    blk = [f"sh{i}" for i in range(8)]
    fix = _tokdf(
        spark,
        [
            (1, [f"p{i}" for i in range(3)] + blk),
            (2, blk + [f"q{i}" for i in range(4)]),
            (3, [f"r{i}" for i in range(6)] + blk + [f"s{i}" for i in range(2)]),
        ],
    )
    for n in (4, 6):
        a = {
            tuple(r)
            for r in repeated_spans(fix, n=n, keep="first", method="rolling").collect()
        }
        b = {
            tuple(r)
            for r in repeated_spans(fix, n=n, keep="first", method="expr").collect()
        }
        assert a == b and a

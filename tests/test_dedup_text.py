"""Dedup / text-analysis / similarity operator tests beyond the
driver-contract oracles: planted-duplicate recovery, approximate-vs-exact
agreement, language ID on real multilingual text, winnowing overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplir_spark.functions.text import lang_id, winnowing_fingerprints
from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    ngram_shingles,
    simhash64,
    simhash_near_pairs,
)

SF = "/root/testdata/sf0.01"
PLANTED = (45, 413)  # known near-dup pair, 3-gram jaccard ~0.987


@pytest.fixture(scope="module")
def tokenized(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("text").alias("content")
    )
    return with_tokens(docs).cache()


def test_ngram_jaccard_finds_planted_pair(spark, tokenized):
    sh = ngram_shingles(tokenized)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(sh, 0.8).collect()}
    assert PLANTED in pairs and pairs[PLANTED] > 0.95


def test_minhash_lsh_covers_exact_jaccard_pairs(spark, tokenized):
    sh = ngram_shingles(tokenized).cache()
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(sh, 0.8).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(minhash_signatures(sh, 16), 4).collect()
    }
    # banded LSH at (16,4) must recall all >=0.8-jaccard pairs on this data
    assert exact <= approx


def test_simhash_near_pairs_include_planted(spark, tokenized):
    sh = simhash64(tokenized)
    pairs = {(r.id_a, r.id_b) for r in simhash_near_pairs(sh, max_hamming=3).collect()}
    assert PLANTED in pairs


def test_simhash_band_join_is_exact_for_hamming_bound(spark, tokenized):
    # pigeonhole: with 4 bands, any pair at hamming <= 3 shares a band ->
    # the band join loses nothing vs brute force
    sh = simhash64(tokenized).collect()
    vals = {r.doc_id: r.simhash for r in sh}
    brute = set()
    items = sorted(vals.items())
    for i, (ida, a) in enumerate(items):
        for idb, b in items[i + 1 :]:
            if bin(a ^ b).count("1") <= 3:
                brute.add((ida, idb))
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            spark.createDataFrame(sh), max_hamming=3
        ).collect()
    }
    assert got == brute


def test_lang_id_on_real_text(spark):
    samples = [
        (1, "the cat sat on the mat and it was happy for a while", "en"),
        (2, "der hund ist nicht mit der katze und das ist gut für alle", "de"),
        (3, "le chat est dans la maison et il est content pour une heure", "fr"),
        (4, "el perro es grande y la casa es una maravilla por las noches", "es"),
        (5, "", "und"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples], "doc_id long, text string")
    toks = df.select("doc_id", F.split(F.lower("text"), " ").alias("terms"))
    got = {r.doc_id: r.lang_pred for r in lang_id(toks).collect()}
    for i, _, want in samples:
        assert got[i] == want, (i, got[i], want)


def test_winnowing_overlap_detects_shared_passage(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = "intro words here " + shared + " trailing content one"
    b = "different preamble text " + shared + " other ending two"
    c = "completely unrelated document about spark joins and shuffles today"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, content string"
    )
    tok = with_tokens(df)
    fps = {r.doc_id: set(r.fingerprints) for r in winnowing_fingerprints(tok).collect()}
    assert fps[1] & fps[2], "shared passage not detected"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_rp_lsh_is_subset_superset_sane(spark):
    from simplir_spark.operators.similarity import cosine_topk, rp_lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = cosine_topk(emb, F.col("vec_id") < 5, k=3).collect()
    approx = rp_lsh_topk(emb, F.col("vec_id") < 5, k=3, n_bits=16, n_bands=8).collect()
    # approximate results are valid rows: correct schema, cos in [-1, 1]
    for r in approx:
        assert -1.0 <= r.cos <= 1.0
    # with 8 narrow bands the candidate set is wide; expect some overlap
    a = {(r.query_id, r.neighbor_id) for r in approx}
    x = {(r.query_id, r.neighbor_id) for r in exact}
    assert len(a & x) >= 1


def test_cosine_neardup_lsh_subset_of_brute(spark):
    """LSH near-dup candidates verify exactly: lsh result ⊆ brute result,
    and planted near-identical pairs are recalled (identical sign sketch)."""
    import numpy as np
    from pyspark.sql import functions as F

    from simplir_spark.operators.similarity import cosine_neardup_pairs

    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        v = rng.randn(16).astype("float32")
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in v * 1.001]))  # planted dup
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(emb, 0.99, method="brute").collect()}
    lsh = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(emb, 0.99, method="lsh").collect()}
    assert lsh <= brute
    planted = {(i, i + 1000) for i in range(40)}
    assert planted <= brute
    # scaled copies share the exact sign sketch -> LSH recalls all of them
    assert planted <= lsh


def test_token_counts_known_values(spark):
    from simplir_spark.functions.text import token_counts

    docs = spark.createDataFrame(
        [(1, "foo bar42 baz-qux"), (2, ""), (3, "  a  b  "), (4, "x.y,z")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_ws, r.n_bpe) for r in token_counts(docs).collect()}
    # doc1: ws=3; bpe: foo,bar,42,baz,-,qux = 6
    # doc3: ws=2, bpe=2; doc4: x,.,y,,,z = 5
    assert got == {1: (3, 6), 2: (0, 0), 3: (2, 2), 4: (1, 5)}


def test_ivf_topk_recall_vs_brute(spark):
    """Deterministic-IVF candidates rerank exactly; recall@5 vs brute
    force stays useful at n_probe=4/16 lists on the small table."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    brute = cosine_topk(emb, F.col("vec_id") < 10, k=5)
    ivf = ivf_topk(emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert len(a) > 0
    recall = len(a & b) / len(b)
    assert recall >= 0.5, recall
    # determinism: second run identical
    a2 = {(r.query_id, r.neighbor_id) for r in ivf_topk(
        emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4).collect()}
    assert a == a2


def test_ivf_kmeans_full_probe_equals_brute(spark):
    """With n_probe == n_lists every list is probed, so the trained-IVF
    search must reduce EXACTLY to brute-force cosine top-k — candidate
    generation loses nothing, rerank is exact."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.similarity import cosine_topk, ivf_kmeans_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    brute = cosine_topk(emb, F.col("vec_id") < 10, k=5)
    full = ivf_kmeans_topk(
        emb, F.col("vec_id") < 10, k=5, n_lists=8, n_probe=8, sample_size=256
    )
    b = sorted(tuple(r) for r in brute.collect())
    f = sorted(tuple(r) for r in full.collect())
    assert b == f and b


def test_ivf_kmeans_fit_deterministic_and_partition_invariant(spark):
    """The sample rule + fixed-order numpy fit must give bit-identical
    centroids however the input is partitioned, and the Spark-side fit
    must agree with the oracle generator's no-Spark parquet path."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.similarity import (
        ivf_kmeans_centroids_from_parquet,
        ivf_kmeans_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out1 = sorted(
        tuple(r)
        for r in ivf_kmeans_topk(
            emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4, sample_size=256
        ).collect()
    )
    out2 = sorted(
        tuple(r)
        for r in ivf_kmeans_topk(
            emb.repartition(7),
            F.col("vec_id") < 10,
            k=5,
            n_lists=16,
            n_probe=4,
            sample_size=256,
        ).collect()
    )
    assert out1 == out2 and out1
    c1 = ivf_kmeans_centroids_from_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", 16, 5, 256
    )
    c2 = ivf_kmeans_centroids_from_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", 16, 5, 256
    )
    assert c1 == c2
    assert len(c1) == 16 and all(len(v) > 0 for _, v, _ in c1)


def test_ivf_kmeans_recall_not_worse_than_detmin(spark):
    """Trained centroids should match or beat the seedless-sample
    centroids on recall@5 at the same probe budget (on this table the
    gap is visible because label clusters exist)."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.similarity import (
        cosine_topk,
        ivf_kmeans_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    b = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    det = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4
        ).collect()
    }
    km = {
        (r.query_id, r.neighbor_id)
        for r in ivf_kmeans_topk(
            emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4, sample_size=256
        ).collect()
    }
    assert len(km & b) / len(b) >= len(det & b) / len(b) - 0.1


# ---------------------------------------------------------------------------
# connected components / near-dup resolution
# ---------------------------------------------------------------------------

def test_cc_chain_transitivity(spark):
    """A-B-C chain where A and C share NO pair: transitivity must still
    put all three in one cluster (the planted-chain case from the brief)."""
    from simplir_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC")], "id_a string, id_b string"
    )
    got = {r["u"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {"docA": "docA", "docB": "docA", "docC": "docA"}


def test_cc_long_chain_and_multiple_components(spark):
    """A 30-node path graph (worst case for naive propagation) plus a
    separate triangle: large-star/small-star must converge within the
    iteration cap and keep components separate."""
    from simplir_spark.operators.dedup import connected_components

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(29)]
    tri = [("z1", "z2"), ("z2", "z3"), ("z1", "z3")]
    pairs = spark.createDataFrame(chain + tri, "id_a string, id_b string")
    got = {r["u"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert {got[f"n{i:02d}"] for i in range(30)} == {"n00"}
    assert {got[z] for z in ("z1", "z2", "z3")} == {"z1"}
    assert len(got) == 33


def test_cc_hot_node_star(spark):
    """One node paired with 200 others (hot-key shape): single cluster,
    canonical = min id."""
    from simplir_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(f"m{i:03d}", "hub") for i in range(1, 201)], "id_a string, id_b string"
    )
    got = {r["u"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {"hub"}  # 'hub' < 'm001'
    assert len(got) == 201


def test_neardup_resolve_keep_flags(spark):
    """keep = 1 exactly for each cluster's min id; unpaired docs are kept
    singletons; every doc appears exactly once."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.dedup import neardup_resolve

    docs = spark.createDataFrame(
        [(d,) for d in ["a", "b", "c", "p", "q", "solo"]], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("p", "q")], "id_a string, id_b string"
    )
    rows = neardup_resolve(docs, pairs).collect()
    assert len(rows) == 6
    by_id = {r["doc_id"]: r for r in rows}
    assert all(r["canonical_id"] == r["cluster_id"] for r in rows)
    assert {r["doc_id"] for r in rows if r["keep"] == 1} == {"a", "p", "solo"}
    assert by_id["c"]["cluster_id"] == "a"
    assert by_id["q"]["cluster_id"] == "p"
    assert by_id["solo"]["cluster_id"] == "solo"
    # dedup'd corpus = filter keep: one row per cluster
    kept = neardup_resolve(docs, pairs).filter(F.col("keep") == 1).count()
    assert kept == 3


def test_cc_empty_pairs(spark):
    from simplir_spark.operators.dedup import connected_components, neardup_resolve

    pairs = spark.createDataFrame([], "id_a string, id_b string")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([("x",), ("y",)], "doc_id string")
    rows = {r["doc_id"]: r for r in neardup_resolve(docs, pairs).collect()}
    assert rows["x"]["keep"] == 1 and rows["x"]["cluster_id"] == "x"
    assert len(rows) == 2


def test_ivf_udf_assignment_matches_expr(spark):
    """The broadcast-matrix pandas-UDF assignment path (the large-n_lists
    plan) must produce the same results as the literal-expression path on
    the real table, for both centroid strategies, and be deterministic."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.similarity import ivf_kmeans_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for fn, kw in [
        (ivf_topk, {}),
        (ivf_kmeans_topk, {"sample_size": 256}),
    ]:
        expr = sorted(
            tuple(r)
            for r in fn(
                emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4,
                assign_method="expr", **kw
            ).collect()
        )
        udf = sorted(
            tuple(r)
            for r in fn(
                emb, F.col("vec_id") < 10, k=5, n_lists=16, n_probe=4,
                assign_method="udf", **kw
            ).collect()
        )
        udf2 = sorted(
            tuple(r)
            for r in fn(
                emb.repartition(5), F.col("vec_id") < 10, k=5, n_lists=16,
                n_probe=4, assign_method="udf", **kw
            ).collect()
        )
        assert expr == udf == udf2 and expr, fn.__name__


def test_simhash_near_pairs_rejects_unsound_band_count():
    import pytest as _pytest

    from simplir_spark.operators.dedup import simhash_near_pairs

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(None, max_hamming=4, n_bands=4)


def test_rp_lsh_validations(spark):
    import pytest as _pytest

    from simplir_spark.operators.similarity import (
        cosine_neardup_pairs,
        rp_lsh_buckets,
    )

    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                                "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="divisible"):
        rp_lsh_buckets(emb, n_bits=16, n_bands=3)
    with _pytest.raises(ValueError, match="unknown method"):
        cosine_neardup_pairs(emb, 0.9, method="lshh")
    # empty input: no crash, empty buckets
    empty = emb.filter("vec_id < 0")
    assert rp_lsh_buckets(empty).count() == 0

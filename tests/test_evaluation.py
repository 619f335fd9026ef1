"""Evaluation-module tests: MAP against hand-computed values (mirrors the
reference's vs-trec_eval differential suite, VersusTrecEval.hs:65-110)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _run_df(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc string, rank int")


def _qrels_df(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc string, relevance int")


def test_map_hand_computed(spark):
    from simplir_spark.operators.evaluation import average_precision, mean_average_precision

    # q1: relevant docs a (rank1) and c (rank3), 2 relevant total
    #     AP = (1/1 + 2/3) / 2 = 0.8333...
    # q2: relevant doc z at rank 2, but qrels hold 2 relevant (z, w; w missed)
    #     AP = (1/2) / 2 = 0.25
    run = _run_df(
        spark,
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "y", 1), ("q2", "z", 2)],
    )
    qrels = _qrels_df(
        spark,
        [("q1", "a", 1), ("q1", "c", 1), ("q2", "z", 1), ("q2", "w", 1),
         ("q3", "n", 0)],  # q3 has no positive judgments -> excluded
    )
    ap = {r.qid: r.ap for r in average_precision(run, qrels).collect()}
    assert ap["q1"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    assert ap["q2"] == pytest.approx(0.25)
    m = mean_average_precision(run, qrels).collect()[0]
    assert m.n_queries == 2
    assert m.map == pytest.approx((ap["q1"] + ap["q2"]) / 2.0)


def test_precision_and_rr(spark):
    from simplir_spark.operators.evaluation import precision_at_k, reciprocal_rank

    run = _run_df(spark, [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3)])
    qrels = _qrels_df(spark, [("q1", "b", 1), ("q1", "c", 1)])
    p = precision_at_k(run, qrels, 2).collect()[0]
    assert p["p_at_2"] == pytest.approx(0.5)
    rr = reciprocal_rank(run, qrels).collect()[0]
    assert rr.rr == pytest.approx(0.5)


def test_merge_rankings_filters_nonfinite_and_reranks(spark):
    from simplir_spark.operators.evaluation import merge_rankings

    r1 = spark.createDataFrame(
        [("q1", "a", 1.0, "m1"), ("q1", "b", float("nan"), "m1"),
         ("q1", "c", float("inf"), "m1")],
        "qid string, doc string, score double, method string",
    )
    r2 = spark.createDataFrame(
        [("q1", "d", 2.0, "m1"), ("q1", "a", 9.0, "m2")],
        "qid string, doc string, score double, method string",
    )
    out = merge_rankings([r1, r2]).collect()
    m1 = sorted([r for r in out if r.method == "m1"], key=lambda r: r.rank)
    assert [(r.doc, r.rank) for r in m1] == [("d", 1), ("a", 2)]  # nan/inf dropped
    m2 = [r for r in out if r.method == "m2"]
    assert len(m2) == 1 and m2[0].rank == 1


def test_map_differential_vs_naive_avgprec(spark):
    """Differential test on randomized assessed rankings — the analog of
    the reference's trec_eval cross-check (VersusTrecEval.hs:65-110): the
    Spark windows-and-joins AP must equal an independent, literal
    transcription of naiveAvgPrec (Evaluation.hs:39-68) on every query.

    Covers: relevant docs never retrieved (R_q from qrels, not the run),
    queries with zero relevant docs (excluded from MAP — trec_eval
    convention; N.B. the reference's meanAvgPrec instead counts them as
    0, Evaluation.hs:30-34), runs of different lengths, all-relevant and
    no-relevant-retrieved runs.
    """
    import numpy as np

    from simplir_spark.operators.evaluation import (
        average_precision,
        mean_average_precision,
    )

    rng = np.random.RandomState(1234)
    run_rows, qrel_rows = [], []
    naive = {}
    n_rel_by_q = {}
    for qi in range(50):
        qid = f"q{qi:03d}"
        n_ranked = int(rng.randint(1, 40))
        pool = [f"d{j}" for j in range(60)]
        ranked = list(rng.choice(pool, size=n_ranked, replace=False))
        # relevance over the whole pool: some relevant docs are never
        # retrieved; a few queries get no relevant docs at all
        p_rel = float(rng.choice([0.0, 0.1, 0.3, 0.9]))
        rel_docs = {d for d in pool if rng.rand() < p_rel}
        for r, d in enumerate(ranked, start=1):
            run_rows.append((qid, d, r))
        for d in pool:
            # qrels carry explicit 0s too (assessed non-relevant)
            qrel_rows.append((qid, d, 1 if d in rel_docs else 0))

        # literal naiveAvgPrec: walk the ranking, accumulate rel count,
        # sum prec at relevant ranks, divide by TOTAL relevant
        total_rel = len(rel_docs)
        n_rel_by_q[qid] = total_rel
        if total_rel == 0:
            continue
        acc, s = 0, 0.0
        for r, d in enumerate(ranked, start=1):
            if d in rel_docs:
                acc += 1
                s += acc / r
        naive[qid] = s / total_rel

    run = spark.createDataFrame(run_rows, "qid string, doc string, rank int")
    qrels = spark.createDataFrame(qrel_rows, "qid string, doc string, relevance int")
    got = {r["qid"]: (r["ap"], r["n_rel"]) for r in average_precision(run, qrels).collect()}

    assert set(got) == set(naive), "queries with zero relevant docs must be absent"
    for qid, ap in naive.items():
        g_ap, g_nrel = got[qid]
        assert g_nrel == n_rel_by_q[qid], qid
        assert abs(g_ap - ap) < 1e-12, (qid, g_ap, ap)

    m = mean_average_precision(run, qrels).collect()[0]
    want_map = sum(naive.values()) / len(naive)
    assert m["n_queries"] == len(naive)
    assert abs(m["map"] - want_map) < 1e-12

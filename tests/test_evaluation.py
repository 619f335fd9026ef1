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


# ---------------------------------------------------------------------------
# trec_eval differential (VersusTrecEval.hs:65-110 analog)
# ---------------------------------------------------------------------------

def _trec_eval_py(qrel_lines, run_lines, k):
    """Independent pure-Python reimplementation of trec_eval's map / P_k /
    recip_rank / ndcg_cut.k over TREC-format TEXT LINES (the external
    binary the reference shells out to, SimplIR/TrecEval.hs:58-81, with
    ExcludeMissingQueries).  Deliberately shares NO code with
    simplir_spark.operators.evaluation: dict-and-sort, not windows/joins.

    Returns (map_value_or_None, {qid: p_at_k}, {qid: rr}, {qid: ndcg}).
    """
    import math

    n_rel = {}
    rel_docs = {}
    for ln in qrel_lines:
        qid, _, doc, rel = ln.split()
        if int(rel) > 0:
            rel_docs.setdefault(qid, set()).add(doc)
            n_rel[qid] = n_rel.get(qid, 0) + 1
    runs = {}
    for ln in run_lines:
        qid, _, doc, _rank, score, _m = ln.split()
        runs.setdefault(qid, []).append((float(score), doc))
    aps, p_at_k, rr, ndcg = [], {}, {}, {}
    for qid, entries in runs.items():
        # trec_eval re-sorts by score desc (doc desc tiebreak); the
        # property generates distinct scores so ties never arise
        ranked = [d for _, d in sorted(entries, key=lambda e: (-e[0], e[1], ))]
        relset = rel_docs.get(qid, set())
        hits = 0
        ap_sum = 0.0
        first_rel = None
        for pos, doc in enumerate(ranked, start=1):
            if doc in relset:
                hits += 1
                ap_sum += hits / pos
                if first_rel is None:
                    first_rel = pos
        if n_rel.get(qid, 0) > 0:
            aps.append(ap_sum / n_rel[qid])
        p_at_k[qid] = sum(1 for d in ranked[:k] if d in relset) / k
        rr[qid] = 0.0 if first_rel is None else 1.0 / first_rel
        if n_rel.get(qid, 0) > 0:
            dcg = sum(
                1.0 / math.log2(pos + 1)
                for pos, doc in enumerate(ranked[:k], start=1)
                if doc in relset
            )
            idcg = sum(
                1.0 / math.log2(i + 1)
                for i in range(1, min(k, n_rel[qid]) + 1)
            )
            ndcg[qid] = dcg / idcg
    return (sum(aps) / len(aps) if aps else None), p_at_k, rr, ndcg


def _assessed_to_lines(queries):
    """queries: {qid: (retrieved list, relevant set, judged set)} ->
    (qrel_lines, run_lines) with distinct descending scores."""
    qrels, run = [], []
    for qid, (retrieved, relevant, judged) in queries.items():
        for d in sorted(judged):
            qrels.append(f"{qid} 0 {d} {1 if d in relevant else 0}")
        for i, d in enumerate(retrieved):
            run.append(f"{qid} Q0 {d} {i + 1} {-float(i + 1)} test")
    return qrels, run


def test_trec_eval_differential_hypothesis(spark, tmp_path):
    """MAP / P@k / RR from the Spark engine, evaluated from an actual
    TREC run FILE round-trip (write_trec_run -> read_trec_run), must match
    the independent pure-Python trec_eval on the same lines within the
    reference's 1e-2 relative tolerance (they should in fact be exact)."""
    from hypothesis import given, settings, strategies as st

    from simplir_spark.operators.evaluation import (
        mean_average_precision,
        ndcg_at_k,
        precision_at_k,
        reciprocal_rank,
    )
    from simplir_spark.sources.trec import read_qrels, read_trec_run

    K = 3

    @st.composite
    def assessed(draw):
        n_q = draw(st.integers(1, 3))
        out = {}
        for qi in range(n_q):
            n_docs = draw(st.integers(1, 12))
            docs = [f"doc-{qi}-{i}" for i in range(n_docs)]
            relevant = {d for d in docs if draw(st.booleans())}
            perm = draw(st.permutations(docs))
            n_ret = draw(st.integers(1, n_docs))
            out[f"q{qi}"] = (list(perm[:n_ret]), relevant, set(docs))
        return out

    case_n = [0]

    @given(assessed())
    @settings(max_examples=10, deadline=None)
    def check(queries):
        qrel_lines, run_lines = _assessed_to_lines(queries)
        case_n[0] += 1
        base = tmp_path / f"case{case_n[0]}"
        (base).mkdir()
        (base / "run.txt").write_text("\n".join(run_lines) + "\n")
        (base / "qrels.txt").write_text("\n".join(qrel_lines) + "\n")
        run = read_trec_run(spark, str(base / "run.txt"))
        qrels = read_qrels(spark, str(base / "qrels.txt"))

        want_map, want_p, want_rr, want_ndcg = _trec_eval_py(
            qrel_lines, run_lines, K
        )

        got_map = mean_average_precision(run, qrels).collect()[0]["map"]
        if want_map is None:
            assert got_map is None
        else:
            assert got_map == pytest.approx(want_map, rel=1e-2, abs=1e-9)

        got_p = {r["qid"]: r[f"p_at_{K}"] for r in precision_at_k(run, qrels, K).collect()}
        assert set(got_p) == set(want_p)
        for qid in want_p:
            assert got_p[qid] == pytest.approx(want_p[qid], rel=1e-2, abs=1e-9), qid

        # engine RR covers every run query, reporting 0 for queries with
        # no relevant retrieved — exactly trec_eval's recip_rank surface
        got_rr = {r["qid"]: r["rr"] for r in reciprocal_rank(run, qrels).collect()}
        assert set(want_rr) == set(got_rr)
        for qid in got_rr:
            assert got_rr[qid] == pytest.approx(want_rr[qid], rel=1e-2, abs=1e-9), qid

        # engine nDCG is anchored on the qrels side (all qids with >=1
        # relevant doc), exactly the set the independent evaluator scores
        got_ndcg = {
            r["qid"]: r[f"ndcg_at_{K}"] for r in ndcg_at_k(run, qrels, K).collect()
        }
        assert set(got_ndcg) == set(want_ndcg)
        for qid in want_ndcg:
            assert got_ndcg[qid] == pytest.approx(
                want_ndcg[qid], rel=1e-2, abs=1e-9
            ), qid

    check()


def test_trec_eval_py_known_value():
    """Anchor the independent evaluator itself on a hand-computed case so
    the differential can't pass by both sides being wrong the same way."""
    import math

    qrels = ["q1 0 a 1", "q1 0 b 0", "q1 0 c 1", "q1 0 w 1"]
    run = ["q1 Q0 a 1 -1.0 t", "q1 Q0 b 2 -2.0 t", "q1 Q0 c 3 -3.0 t"]
    m, p, rr, ndcg = _trec_eval_py(qrels, run, 2)
    assert m == pytest.approx((1.0 + 2.0 / 3.0) / 3.0)  # R=3 incl. missed w
    assert p["q1"] == pytest.approx(0.5)
    assert rr["q1"] == pytest.approx(1.0)
    # DCG@2 = 1/log2(2) (only `a` relevant in top-2); IDCG@2 over 2 of the
    # 3 relevant docs = 1/log2(2) + 1/log2(3)
    assert ndcg["q1"] == pytest.approx(1.0 / (1.0 + 1.0 / math.log2(3.0)))


def test_trec_readers_tolerate_leading_whitespace(spark, tmp_path):
    # regression: split on \s+ without trim made a leading space shift
    # every parsed field by one, silently corrupting the row
    from simplir_spark.sources.trec import read_qrels, read_trec_run

    run = tmp_path / "run.txt"
    run.write_text("  301 Q0 doc1 1 2.5 m\n301 Q0 doc2 2 1.5 m\n")
    rows = sorted(
        tuple(r) for r in read_trec_run(spark, str(run)).collect()
    )
    assert rows == [("301", "doc1", 1, 2.5, "m"), ("301", "doc2", 2, 1.5, "m")]
    q = tmp_path / "qrels.txt"
    q.write_text(" 301 0 doc1 1\n")
    qr = read_qrels(spark, str(q)).collect()
    assert [(r["qid"], r["doc"], r["relevance"]) for r in qr] == [("301", "doc1", 1)]

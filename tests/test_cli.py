"""CLI end-to-end: package -> corpus-stats -> index -> query -> score -> eval."""

from __future__ import annotations

import json
import zipfile

import pytest

from simplir_spark import cli

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qfile(tmp_path_factory):
    p = tmp_path_factory.mktemp("q") / "queries.tsv"
    p.write_text("Q1\thash join\nQ2\tdup\nQ3\tzebra\n")
    return str(p)


def test_package_zip(tmp_path):
    out = str(tmp_path / "pkg.zip")
    cli.main(["package", "--out", out])
    names = zipfile.ZipFile(out).namelist()
    assert "simplir_spark/cli.py" in names
    assert "simplir_spark/operators/index_build.py" in names


def test_cli_pipeline(spark, tmp_path_factory, qfile, capsys):
    base = tmp_path_factory.mktemp("cli")
    stats = str(base / "stats.json")
    cli.main(["corpus-stats", "--corpus", SF, "--out", stats])
    s = json.load(open(stats))
    assert s["doc_count"] == 500

    idx = str(base / "idx")
    cli.main(["index", "--corpus", SF, "--out", idx, "--partitions", "4"])

    run_dir = str(base / "run")
    cli.main(["query", "--index", idx, "--queries", qfile, "--out", run_dir, "--k", "5"])
    from simplir_spark.sources.trec import read_trec_run

    run = read_trec_run(spark, run_dir)
    rows = run.collect()
    qids = {r.qid for r in rows}
    assert qids == {"Q1", "Q2"}  # Q3 term absent
    assert all(1 <= r.rank <= 5 for r in rows)

    # scan-mode score must produce the same ranking as the indexed path
    run2_dir = str(base / "run2")
    cli.main(["score", "--corpus", SF, "--queries", qfile, "--out", run2_dir, "--k", "5"])
    run2 = read_trec_run(spark, run2_dir)
    a = {(r.qid, r.doc, r.rank) for r in rows}
    b = {(r.qid, r.doc, r.rank) for r in run2.collect()}
    assert a == b

    # eval against qrels derived from the run itself -> perfect MAP
    qrels = str(base / "qrels.txt")
    with open(qrels, "w") as f:
        for r in rows:
            if r.rank <= 2:
                f.write(f"{r.qid} 0 {r.doc} 1\n")
    cli.main(["eval", "--run", run_dir, "--qrels", qrels])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    m = json.loads(out)
    assert m["n_queries"] == 2 and m["map"] == pytest.approx(1.0)


def test_load_corpus_from_catalog_table(spark):
    """Catalog-table corpora (the Iceberg-shaped input) go through
    spark.read.table — exercised here with a temp view (the sandbox has
    no Iceberg jar; a real cluster points the same identifier at an
    Iceberg catalog)."""
    from simplir_spark.sources.corpus import load_corpus

    src = spark.createDataFrame(
        [("r1", "a/b.py", "c0ffee", "py", "def hash join x"),
         ("r2", "m.rs", "deadbf", "rs", "fn merge sort y")],
        "repo string, path string, commit string, lang string, content string",
    )
    src.createOrReplaceTempView("code_files")
    df = load_corpus(spark, "code_files")
    rows = {r.doc_key: r.content for r in df.collect()}
    assert rows == {
        "r1/a/b.py@c0ffee": "def hash join x",
        "r2/m.rs@deadbf": "fn merge sort y",
    }


def test_load_corpus_jsonl(spark, tmp_path_factory):
    """JSON-lines corpora load through spark.read.json and normalize to
    the native schema (both the source-code and synthetic shapes)."""
    import json as _json

    from simplir_spark.sources.corpus import load_corpus

    d = tmp_path_factory.mktemp("jsonl")
    p = str(d / "docs.jsonl")
    with open(p, "w") as f:
        f.write(_json.dumps({"repo": "r1", "path": "a.py", "commit": "c1",
                             "lang": "py", "content": "alpha beta"}) + "\n")
        f.write(_json.dumps({"repo": "r2", "path": "b.rs", "commit": "c2",
                             "lang": "rs", "content": "gamma delta"}) + "\n")
    rows = {r.doc_key: r.content for r in load_corpus(spark, p).collect()}
    assert rows == {"r1/a.py@c1": "alpha beta", "r2/b.rs@c2": "gamma delta"}


def test_cli_learn_and_rerank(spark, tmp_path_factory, capsys):
    """Learn2Rank.hs train/predict split: learn a model from feature run
    files + qrels, save as named-feature JSON, rerank with it via the CLI."""
    base = tmp_path_factory.mktemp("l2r")

    # two feature run files over the same (qid, doc) set: "good" scores
    # relevant docs high, "bad" is anti-correlated
    docs = [f"d{i}" for i in range(6)]
    rel = {"d0", "d1"}
    for name, flip in (("good", False), ("bad", True)):
        lines = []
        for q in ("q1", "q2"):
            scored = sorted(
                docs,
                key=lambda d: -( (d in rel) != flip ),
            )
            for rk, d in enumerate(scored, 1):
                val = (1.0 if (d in rel) != flip else 0.0) + 0.01 * int(d[1])
                lines.append(f"{q} Q0 {d} {rk} {val} {name}")
        (base / f"{name}.run").write_text("\n".join(lines) + "\n")
    qrels = base / "qrels.txt"
    qrels.write_text("\n".join(f"{q} 0 {d} 1" for q in ("q1", "q2") for d in sorted(rel)) + "\n")

    model = str(base / "model.json")
    cli.main([
        "learn", "-o", model, "-q", str(qrels),
        f"good={base}/good.run", f"bad={base}/bad.run", "--iters", "2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["map"] == pytest.approx(1.0, abs=1e-9)
    m = json.load(open(model))
    assert set(m) == {"good", "bad"}
    assert m["good"] > m["bad"]  # informative feature upweighted

    run_out = str(base / "reranked")
    cli.main([
        "rerank", "-m", model, "--out", run_out,
        f"good={base}/good.run", f"bad={base}/bad.run", "--k", "3",
    ])
    from simplir_spark.sources.trec import read_trec_run

    rr = read_trec_run(spark, run_out).collect()
    for q in ("q1", "q2"):
        top = sorted((r for r in rr if r.qid == q), key=lambda r: r.rank)
        assert {top[0].doc, top[1].doc} == rel, top


def test_cli_learn_with_folds(tmp_path_factory, capsys):
    """--folds k reports the held-out CV MAP alongside the full-train MAP."""
    base = tmp_path_factory.mktemp("l2rcv")
    docs = [f"d{i}" for i in range(6)]
    rel = {"d0", "d1"}
    lines = []
    for q in ("q1", "q2", "q3", "q4"):
        for rk, d in enumerate(docs, 1):
            val = (1.0 if d in rel else 0.0) + 0.01 * int(d[1])
            lines.append(f"{q} Q0 {d} {rk} {val} f")
    (base / "f.run").write_text("\n".join(lines) + "\n")
    qrels = base / "qrels.txt"
    qrels.write_text(
        "\n".join(f"{q} 0 {d} 1" for q in ("q1", "q2", "q3", "q4") for d in sorted(rel)) + "\n"
    )
    model = str(base / "model.json")
    cli.main([
        "learn", "-o", model, "-q", str(qrels), f"f={base}/f.run",
        "--iters", "1", "--folds", "2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cv_map"] == pytest.approx(1.0, abs=1e-9)
    assert len(out["fold_test_maps"]) == 2


def test_spark_submit_py_files_end_to_end(tmp_path):
    """North-rule deployment shape: the whole build+query runs via
    `spark-submit --py-files <package.zip>` with the driver cwd OUTSIDE
    the repo — import resolution, worker PYTHONPATH, and the index
    pipeline all through the packaged artifact."""
    import os
    import shutil
    import subprocess

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not available")

    pkg = str(tmp_path / "simplir_spark.zip")
    cli.main(["package", "--out", pkg])
    job = tmp_path / "job.py"
    job.write_text(
        "import json, tempfile, shutil\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.appName('submit_smoke').getOrCreate()\n"
        "from simplir_spark.sources.corpus import load_corpus\n"
        "from simplir_spark.operators.index_build import build_index, open_index\n"
        "from simplir_spark.operators.query_indexed import bm25_indexed\n"
        "from simplir_spark.queryset import QUERIES\n"
        "corpus = load_corpus(spark, '/root/testdata/sf0.001')\n"
        "idx_dir = tempfile.mkdtemp(prefix='submit_idx_')\n"
        "shutil.rmtree(idx_dir, ignore_errors=True)\n"
        "build_index(spark, corpus, idx_dir)\n"
        "idx = open_index(spark, idx_dir)\n"
        "rows = bm25_indexed(spark, idx, QUERIES[:4], k=5).collect()\n"
        "print('SUBMIT_RESULT ' + json.dumps({'docs': idx.doc_count, 'rows': len(rows)}))\n"
        "shutil.rmtree(idx_dir, ignore_errors=True)\n"
        "spark.stop()\n"
    )
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]", "--py-files", pkg,
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            str(job),
        ],
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        capture_output=True, text=True, timeout=360,
    )
    marker = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert marker, f"no result marker; stderr tail: {out.stderr[-2000:]}"
    res = json.loads(marker[0].split(" ", 1)[1])
    assert res == {"docs": 500, "rows": 20}

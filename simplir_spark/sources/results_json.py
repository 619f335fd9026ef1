"""Results JSON sink — the reference's ``<outputRoot>.json`` shape
(simplir-tools/Search.hs:282-313): per query, the scored documents with
their matched query-term postings, each position carrying BOTH the token
index and the character offset:

    [ {"query_id": ...,
       "results": [ {"doc_name": ..., "length": ..., "archive": ...,
                     "score": ...,
                     "postings": [ {"term": ...,
                                    "positions": [ {"token_pos": n,
                                                    "char_pos": c}, ...]},
                                   ...]},
                    ...]},
      ...]

Scale shape: positions are computed ONLY for the top-k docs of each query
(the reference likewise materializes postings just for scored results) —
the corpus side is semi-joined down to queries x k docs before any
tokenization, so the position kernel touches a bounded row set no matter
the corpus size.  The JSON assembly collects those bounded rows to the
driver (exactly what a single .json output file implies).
"""

from __future__ import annotations

import gzip
import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplir_spark.functions.tokenize import _KILL_TABLE, normalize_token

_TOKEN_RE = re.compile(r"\S+")

POSITIONS_SCHEMA = (
    "query_id string, doc_key long, term string, token_pos int, char_pos int"
)


def matched_positions(
    run: DataFrame,
    corpus: DataFrame,
    queries: list[tuple[str, list[str]]],
    content_col: str = "content",
) -> DataFrame:
    """(query_id, doc_key, term, token_pos, char_pos) for every occurrence
    of a query term in that query's scored docs.

    token_pos is the RAW pre-normalization token index (Position.tokenN,
    Tokenise.hs:46-82); char_pos the raw token's character offset
    (Position.charOffset).  Only the run's docs are tokenized (semi-join
    first): bounded work at any corpus scale.
    """
    spark = run.sparkSession
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in sorted(set(terms))],
        "query_id string, term string",
    )
    docs = corpus.join(
        run.select(F.col("doc_key")).distinct(), "doc_key"
    ).select("doc_key", content_col)

    def kernel(batches):
        for pdf in batches:
            out = {"doc_key": [], "term": [], "token_pos": [], "char_pos": []}
            for dk, text in zip(pdf["doc_key"], pdf[content_col]):
                killed = (text or "").translate(_KILL_TABLE)
                for tok_ix, m in enumerate(_TOKEN_RE.finditer(killed)):
                    term = normalize_token(m.group())
                    if term:
                        out["doc_key"].append(dk)
                        out["term"].append(term)
                        out["token_pos"].append(tok_ix)
                        out["char_pos"].append(m.start())
            yield pd.DataFrame(
                {
                    # object dtype: doc_key is long for the synthetic
                    # corpus but a STRING name for native corpora
                    # (load_corpus's repo/path@commit) — Arrow casts to
                    # whichever type the declared schema carries
                    "doc_key": pd.Series(out["doc_key"], dtype=object),
                    "term": pd.Series(out["term"], dtype=object),
                    "token_pos": pd.Series(out["token_pos"], dtype="int32"),
                    "char_pos": pd.Series(out["char_pos"], dtype="int32"),
                }
            )

    key_type = docs.schema["doc_key"].dataType.simpleString()
    occ = docs.mapInPandas(
        kernel, f"doc_key {key_type}, term string, token_pos int, char_pos int"
    )
    # restrict to (query, doc) pairs from the run and that query's terms
    return (
        occ.join(F.broadcast(qdf), "term")
        .join(run.select("query_id", "doc_key").distinct(), ["query_id", "doc_key"])
        .select("query_id", "doc_key", "term", "token_pos", "char_pos")
    )


def write_results_json(
    run: DataFrame,
    corpus: DataFrame,
    queries: list[tuple[str, list[str]]],
    out_path: str,
    doc_meta: DataFrame | None = None,
    compress: bool | None = None,
) -> list[dict]:
    """Assemble and write the Search.hs:289-313 results JSON (gzipped when
    the path ends in .gz or ``compress``).  Returns the parsed structure.

    ``doc_meta`` may carry (doc_key, doc_len[, archive]) — doc length and
    archive fields; missing pieces default to 0/''.
    """
    def _py(v):
        # numpy scalar -> plain python (JSON-serializable, dict-hashable);
        # string doc_keys pass through — the reference keys results by
        # document NAME (Search.hs), so keys must not be forced to int
        return v.item() if hasattr(v, "item") else v

    pos_rows = matched_positions(run, corpus, queries).collect()
    run_rows = run.select("query_id", "doc_key", "rank", "score").collect()
    meta: dict = {}
    if doc_meta is not None:
        cols = doc_meta.columns
        # bound the collect to the run's documents (queries x k rows), the
        # same bound the positions/run sides already have — a caller
        # passing the full corpus docmeta table must not collect it all
        run_keys = run.select("doc_key").distinct()
        doc_meta = doc_meta.join(run_keys, "doc_key", "left_semi")
        for r in doc_meta.collect():
            meta[_py(r["doc_key"])] = (
                int(r["doc_len"]) if "doc_len" in cols else 0,
                str(r["archive"]) if "archive" in cols else "",
            )

    by_qd: dict[tuple, dict[str, list[dict]]] = {}
    for r in pos_rows:
        postings = by_qd.setdefault((r["query_id"], _py(r["doc_key"])), {})
        postings.setdefault(r["term"], []).append(
            {"token_pos": int(r["token_pos"]), "char_pos": int(r["char_pos"])}
        )

    by_q: dict[str, list] = {}
    for r in sorted(run_rows, key=lambda r: (r["query_id"], r["rank"])):
        dk = _py(r["doc_key"])
        dl, archive = meta.get(dk, (0, ""))
        postings = by_qd.get((r["query_id"], dk), {})
        by_q.setdefault(r["query_id"], []).append(
            {
                "doc_name": str(dk),
                "length": dl,
                "archive": archive,
                "score": float(r["score"]),
                "postings": [
                    {
                        "term": t,
                        "positions": sorted(ps, key=lambda p: p["token_pos"]),
                    }
                    for t, ps in sorted(postings.items())
                ],
            }
        )
    doc = [{"query_id": qid, "results": res} for qid, res in sorted(by_q.items())]

    gz = compress if compress is not None else out_path.endswith(".gz")
    data = json.dumps(doc).encode()
    if gz:
        with gzip.open(out_path, "wb") as f:
            f.write(data)
    else:
        with open(out_path, "wb") as f:
            f.write(data)
    return doc

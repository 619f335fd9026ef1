"""Text analysis for corpus curation: quality metrics, language ID,
document fingerprinting, token counting.

All heavy lifting is JVM-side column expressions or Arrow-vectorized
numpy; language ID runs its profile votes over unique tokens per batch.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simplir_spark.functions.tokenize import _factorize_flat

# A compact English stopword set for the quality heuristics (pluggable —
# pass any list to the *_ratio helpers).
STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with",
    "is", "are", "was", "were", "be", "been", "it", "this", "that", "as",
    "at", "by", "from", "not", "but", "they", "their", "there", "then",
]


def inquery_stopwords() -> list[str]:
    """The 418-word InQuery English stopword list the reference embeds
    (simplir-stop-words/src/SimplIR/StopWords.hs:9-20, data file
    simplir-stop-words/data/inquery-en.txt) — the Search2-pipeline default."""
    # importlib.resources resolves both a filesystem checkout and a
    # --py-files zip (zipimport Traversable); the direct open() fallback
    # covers environments where the package metadata path is unusual
    try:
        from importlib import resources

        txt = (
            resources.files("simplir_spark")
            .joinpath("data/inquery_en.txt")
            .read_text(encoding="utf-8")
        )
    except Exception:
        path = os.path.join(os.path.dirname(__file__), "..", "data", "inquery_en.txt")
        with open(path, encoding="utf-8") as f:
            txt = f.read()
    return [w.strip() for w in txt.splitlines() if w.strip()]

# tiny per-language profile word sets for the n-gram/stopword-vote lang id
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "por", "una", "en"},
}


def stopword_filter(terms_col, stopwords: list[str] | None = None):
    """Drop stopwords from a terms array (the Search2-pipeline option,
    simplir-stop-words/src/SimplIR/StopWords.hs:9-20).  JVM-side."""
    sw = F.array([F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    return F.array_except(terms_col, sw)


def text_quality(tokenized: DataFrame, id_col: str = "doc_id",
                 stopwords: list[str] | None = None) -> DataFrame:
    """Per-doc quality heuristics over content + normalized terms.

    Columns: id, n_chars, n_tokens (ws, alnum), n_terms, uniq_ratio,
    stop_ratio, mean_term_len, quality (composite in [0,1], rounded).
    """
    sw = F.array([F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    n_terms = F.size("terms").cast("long")
    n_stop = F.size(F.filter("terms", lambda t: F.array_contains(sw, t))).cast("long")
    term_chars = F.aggregate(
        F.transform("terms", lambda t: F.length(t).cast("long")), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    uniq_ratio = F.when(n_terms > 0, F.size(F.array_distinct("terms")) / n_terms).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_terms > 0, n_stop / n_terms).otherwise(F.lit(0.0))
    mean_len = F.when(n_terms > 0, term_chars / n_terms).otherwise(F.lit(0.0))
    # composite: long-enough docs with diverse vocabulary and a sane
    # stopword share score high (weights are heuristic, documented here)
    len_score = F.least(n_terms / F.lit(50.0), F.lit(1.0))
    quality = F.lit(0.5) * len_score + F.lit(0.3) * uniq_ratio + F.lit(0.2) * (F.lit(1.0) - stop_ratio)
    return tokenized.select(
        F.col(id_col),
        F.length("content").cast("long").alias("n_chars"),
        F.col("doc_len_alnum").cast("long").alias("n_tokens"),
        n_terms.alias("n_terms"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_len, 6).alias("mean_term_len"),
        F.round(quality, 6).alias("quality"),
    )


def doc_fingerprint(tokenized: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Content-normalized fingerprint: md5 over the normalized term stream.

    Catches duplicates that differ only in punctuation/case/whitespace —
    stronger than raw-content hashing, still one JVM expression.
    """
    return tokenized.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", "terms")).alias("fingerprint"),
        F.size("terms").cast("long").alias("n_terms"),
    )


# Winnowing k-gram hash: polynomial rolling hash over md5-derived 31-bit
# token hashes.  Both constants fit the no-overflow envelope on BOTH
# engines: token hash < 2^31, power < 2^31 -> product < 2^62 (int64 /
# BIGINT safe), sum of k mod-reduced terms < k*2^31 (safe), one final mod.
WINNOW_MOD = (1 << 31) - 1
WINNOW_BASE = 1_000_003


def winnow_token_hash_sql(tok_expr: str) -> str:
    """DuckDB twin of the per-token hash (first 15 md5 hex = 60-bit int,
    reduced mod WINNOW_MOD) — used by the contract oracle."""
    return f"(('0x' || substr(md5({tok_expr}), 1, 15))::BIGINT % {WINNOW_MOD})"


def winnowing_fingerprints(tokenized: DataFrame, k: int = 5, window: int = 4,
                           id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints [Schleimer, Wilkerson, Aiken 2003]:
    k-gram rolling hashes, per-window minima — robust partial-overlap
    detection.

    Fully vectorized: md5 runs once per UNIQUE token in the Arrow batch
    (flatten + factorize), then every k-gram hash is a numpy polynomial
    combination — no per-gram Python or hashlib calls.  ``terms`` are the
    normalizer's alpha-only output, so the fast factorize path is safe.
    """
    pw = [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)]
    pw_arr = np.asarray(pw, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(term_lists: pd.Series) -> pd.Series:
        import hashlib

        lists = [list(t) if t is not None else [] for t in term_lists]
        lens = [len(t) for t in lists]
        flat = np.asarray([tok for t in lists for tok in t], dtype=object)
        if len(flat):
            codes, uniques = _factorize_flat(flat, False)
            uh = np.fromiter(
                (
                    (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") >> 4)
                    % WINNOW_MOD
                    for u in uniques
                ),
                dtype=np.int64,
                count=len(uniques),
            )
            th_all = uh[codes]
        else:
            th_all = np.empty(0, dtype=np.int64)

        out, pos = [], 0
        for ln in lens:
            th = th_all[pos : pos + ln]
            pos += ln
            if ln < k:
                out.append([])
                continue
            ng = ln - k + 1
            h = np.zeros(ng, dtype=np.int64)
            for j in range(k):
                h = (h + (th[j : j + ng] * pw_arr[j]) % WINNOW_MOD) % WINNOW_MOD
            if ng <= window:
                out.append([int(h.min())])
                continue
            sw = np.lib.stride_tricks.sliding_window_view(h, window)
            mins = sw.min(axis=1)
            out.append(sorted(set(int(x) for x in mins)))
        return pd.Series(out)

    return tokenized.select(F.col(id_col), winnow("terms").alias("fingerprints"))


LANG_ID_TYPE = T.StructType(
    [
        T.StructField("lang_pred", T.StringType(), False),
        T.StructField("lang_score", T.DoubleType(), False),
    ]
)


@F.pandas_udf(LANG_ID_TYPE)
def lang_id_udf(term_lists: pd.Series) -> pd.DataFrame:
    """Stopword-profile language vote (heuristic language ID); 'und' when
    no profile matches.

    Vectorized: the batch's tokens are flattened and factorized ONCE, each
    profile tests membership against the UNIQUE tokens (np.isin), and
    per-doc hit counts come from one bincount per language — no per-doc
    per-token Python loop in the hot path.
    """
    langs = sorted(_LANG_PROFILES)
    lists = [list(t) if t is not None else [] for t in term_lists]
    lens = np.asarray([len(t) for t in lists], dtype=np.int64)
    n_docs = len(lists)
    flat = np.asarray([tok for t in lists for tok in t], dtype=object)
    doc_ix = np.repeat(np.arange(n_docs), lens)

    scores = np.zeros((len(langs), n_docs), dtype=np.float64)
    if len(flat):
        codes, uniques = _factorize_flat(flat, False)
        safe_lens = np.maximum(lens, 1).astype(np.float64)
        for li, lg in enumerate(langs):
            mask_u = np.isin(uniques, sorted(_LANG_PROFILES[lg]))
            hit = mask_u[codes]
            hits = np.bincount(doc_ix[hit], minlength=n_docs)
            scores[li] = hits / safe_lens

    best_ix = scores.argmax(axis=0) if n_docs else np.empty(0, dtype=np.int64)
    best = scores[best_ix, np.arange(n_docs)] if n_docs else np.empty(0)
    preds = [langs[best_ix[i]] if best[i] > 0 else "und" for i in range(n_docs)]
    return pd.DataFrame(
        {"lang_pred": preds, "lang_score": np.round(best, 6)}
    )


def lang_id(df: DataFrame, tokens_col: str = "terms", id_col: str = "doc_id") -> DataFrame:
    r = lang_id_udf(F.col(tokens_col))
    return df.select(
        F.col(id_col), r["lang_pred"].alias("lang_pred"), r["lang_score"].alias("lang_score")
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish token counts, entirely JVM-side.

    n_ws    = count of non-whitespace runs;
    n_bpe   = count of matches of a BPE-style pre-tokenizer pattern
              (letter runs | digit runs | single non-alnum) — the shape of
              GPT-2-style pre-tokenization.  Whitespace is an EXPLICIT
              ASCII class (Java's \\s includes \\x0B, RE2's does not) so
              Java regex and the DuckDB-oracle RE2 agree byte-for-byte.
    """
    ws_class = " \\t\\r\\n\\f\\x0B"
    ws = F.regexp_count(F.col(text_col), F.lit(f"[^{ws_class}]+"))
    bpe = F.regexp_count(F.col(text_col), F.lit(f"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{ws_class}]"))
    return docs.select(
        F.col(id_col),
        ws.cast("long").alias("n_ws"),
        bpe.cast("long").alias("n_bpe"),
    )


def repetition_stats(tokenized: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition signals for training-data filtering — the
    duplicate-n-gram family of quality heuristics (Gopher/MassiveText
    style): heavily self-repeating documents (boilerplate, generated
    spam, scraper loops) score high and get filtered upstream of
    training.

    Columns: id, n_tokens, dup_token_frac (1 - distinct/total),
    dup_2gram_frac and dup_3gram_frac ((total - distinct)/total over
    sliding token n-grams); fractions are 0 for docs too short to form
    an n-gram.  Pure column projection — array expressions only, no
    shuffle, no Python; at any corpus size this runs at scan speed.
    """

    def grams(n: int):
        return F.expr(
            f"CASE WHEN size(terms) >= {n} THEN "
            f"transform(sequence(0, size(terms) - {n}),"
            f" i -> concat_ws(' ', slice(terms, i + 1, {n}))) "
            f"ELSE array() END"
        )

    def dup_frac(arr):
        total = F.size(arr)
        return F.when(
            total > 0, (total - F.size(F.array_distinct(arr))) / total
        ).otherwise(F.lit(0.0))

    n_tokens = F.size("terms").cast("long")
    return tokenized.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(dup_frac(F.col("terms")), 6).alias("dup_token_frac"),
        F.round(dup_frac(grams(2)), 6).alias("dup_2gram_frac"),
        F.round(dup_frac(grams(3)), 6).alias("dup_3gram_frac"),
    )

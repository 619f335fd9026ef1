"""HTML boilerplate removal — Spark re-expression of the reference's
simplir-html-clean (simplir-html-clean/src/SimplIR/HTML/Clean.hs:36-84):

 * tag names are case-folded (canonicalizeTags);
 * title  = inner text of the first <title> before </head> (extractTitle);
 * body   = drop the subtrees of {style, nav, video, canvas, script}
   (dropTags), then the inner text of the first <article>, else <main>,
   else <body> (extractBody);
 * inner text maps block-level open AND close tags to one space
   (innerText' / needsWhitespace), other tags to nothing.

The per-document parse is inherently sequential (as in the reference);
it runs as an Arrow-batched pandas UDF so batches of documents cross the
JVM/Python boundary once.  Everything downstream (tokenize, index) stays
JVM-side.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Clean.hs:96-131 needsWhitespace — block-level elements whose open/close
# tags become one space in inner text
NEEDS_WHITESPACE = frozenset(
    [
        "address", "article", "aside", "blockquote", "canvas", "dd", "div",
        "dl", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li",
        "main", "nav", "noscript", "ol", "output", "p", "pre", "section",
        "table", "tfoot", "ul", "video",
        "tr", "td", "th", "br",
    ]
)

# Clean.hs:76-80 droppedTags — subtrees removed before body extraction
DROPPED_TAGS = frozenset(["style", "nav", "video", "canvas", "script"])


class _Tokens(HTMLParser):
    """Flat token stream: ('open'|'close', name) / ('text', data)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tokens: list[tuple[str, str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self.tokens.append(("open", tag.casefold()))

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        # distinct kind: a self-closing tag opens AND closes.  Emitting a
        # bare 'open' left a dropped tag (<script .../>) waiting forever
        # for a close, discarding the rest of the document; emitting
        # open+close would double the whitespace break for <br/>
        self.tokens.append(("selfclose", tag.casefold()))

    def handle_endtag(self, tag: str) -> None:
        self.tokens.append(("close", tag.casefold()))

    def handle_data(self, data: str) -> None:
        self.tokens.append(("text", data))


def _parse(html: str) -> list[tuple[str, str]]:
    p = _Tokens()
    p.feed(html or "")
    return p.tokens


def _inside_tag(name: str, tokens: list[tuple[str, str]]) -> list[tuple[str, str]] | None:
    """insideTag (Clean.hs:38-41): from the first <name> (inclusive, as in
    dropWhile/takeWhile) up to — excluding — its first </name>.
    None when the tag never opens."""
    start = None
    for i, (kind, val) in enumerate(tokens):
        if kind == "selfclose" and val == name:
            return []  # opens and immediately closes: empty inner
        if kind == "open" and val == name:
            start = i
            break
    if start is None:
        return None
    out = []
    for kind, val in tokens[start:]:
        if kind == "close" and val == name:
            break
        out.append((kind, val))
    return out


def _drop_tags(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """dropTags (Clean.hs:43-55): remove everything from an opening
    dropped tag until the first MATCHING close (non-nesting accumulator,
    exactly the reference's filterAccumL)."""
    out: list[tuple[str, str]] = []
    open_drop: str | None = None
    for kind, val in tokens:
        if open_drop is None:
            if kind == "open" and val in DROPPED_TAGS:
                open_drop = val
            elif kind == "selfclose" and val in DROPPED_TAGS:
                pass  # empty dropped subtree: skip the token, no state
            else:
                out.append((kind, val))
        else:
            if kind == "close" and val == open_drop:
                open_drop = None
            # else: still inside the dropped subtree
    return out


def _inner_text(tokens: list[tuple[str, str]]) -> str:
    """innerText' (Clean.hs:84-94): text chunks; block open/close -> ' '."""
    parts = []
    for kind, val in tokens:
        if kind == "text":
            parts.append(val)
        elif val in NEEDS_WHITESPACE:
            parts.append(" ")
    return "".join(parts)


def clean_html(html: str) -> tuple[str, str]:
    """clean (Clean.hs:133-140) -> (title, body)."""
    tokens = _parse(html)
    # extractTitle: title inside head only (takeWhile not </head>)
    head_end = len(tokens)
    for i, (kind, val) in enumerate(tokens):
        if kind == "close" and val == "head":
            head_end = i
            break
    title_toks = _inside_tag("title", tokens[:head_end])
    title = _inner_text(title_toks) if title_toks is not None else ""
    # extractBody: drop boilerplate subtrees, prefer article > main > body
    kept = _drop_tags(tokens)
    body = ""
    for name in ("article", "main", "body"):
        inner = _inside_tag(name, kept)
        if inner is not None:
            body = _inner_text(inner)
            break
    return title, body


HTML_CLEAN_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType(), False),
        T.StructField("body", T.StringType(), False),
    ]
)


@F.pandas_udf(HTML_CLEAN_TYPE)
def clean_html_udf(html: pd.Series) -> pd.DataFrame:
    pairs = [clean_html(h) for h in html]
    return pd.DataFrame({"title": [p[0] for p in pairs], "body": [p[1] for p in pairs]})


def html_clean(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """(id, title, body) from raw HTML — the optional pre-tokenize step of
    a web-crawl pipeline (TREC-WARC ingestion in the reference)."""
    r = clean_html_udf(F.col(html_col))
    return df.select(F.col(id_col), r["title"].alias("title"), r["body"].alias("body"))

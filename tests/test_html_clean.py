"""Golden tests for the HTML boilerplate cleaner against hand-computed
expected extractions (semantics: simplir-html-clean Clean.hs:36-84)."""

from __future__ import annotations

from simplir_spark.functions.html_clean import clean_html, html_clean

GOLDENS = [
    # (html, expected_title, expected_body)
    (
        "<html><head><title>T</title></head><body>hello</body></html>",
        "T",
        "hello",  # body is NOT in needsWhitespace (Clean.hs:96-131)
    ),
    (
        # script/style/nav subtrees vanish entirely (no whitespace for nav
        # close — the close token is consumed by dropTags)
        "<body><script>var x;</script>a<style>.c{}</style>b<nav><ul><li>m</li></ul></nav>c</body>",
        "",
        "abc",
    ),
    (
        # article preferred over main over body; block tags -> spaces
        "<body>outer<article><p>in</p>side</article><main>m</main></body>",
        "",
        "  in side",  # <article> ' ' + <p> ' ' + 'in' + </p> ' ' + 'side'
    ),
    (
        # main fallback when no article
        "<body>outer<main>m</main></body>",
        "",
        " m",  # <main> IS block-level
    ),
    (
        # title outside <head> is NOT a title (takeWhile not </head>)
        "<html><head></head><body><title>nope</title>x</body></html>",
        "",
        "nopex",  # neither body nor title is block-level
    ),
    (
        # tag-name case folding
        "<HTML><HEAD><TITLE>Up</TITLE></HEAD><BODY>y</BODY></HTML>",
        "Up",
        "y",
    ),
    (
        # unclosed dropped tag swallows the rest (filterAccumL semantics)
        "<body>a<script>everything after",
        "",
        "a",
    ),
    (
        # no body/article/main at all -> empty body
        "<div>floating</div>",
        "",
        "",
    ),
    (
        # <br/> self-closing block tag becomes a space
        "<body>a<br/>b</body>",
        "",
        "a b",
    ),
]


def test_clean_html_goldens():
    for html, want_title, want_body in GOLDENS:
        title, body = clean_html(html)
        assert title == want_title, (html, title)
        assert body == want_body, (html, body)


def test_article_preference_exact():
    html = "<body>outer<article><p>in</p>side</article></body>"
    # insideTag('article') includes the <article> open token -> ' ',
    # then <p> -> ' ', 'in', </p> -> ' ', 'side'
    assert clean_html(html) == ("", "  in side")


def test_html_clean_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "<html><head><title>A</title></head><body>one</body></html>"),
         (2, "<body><nav>menu</nav>two</body>")],
        "doc_id long, html string",
    )
    rows = {r.doc_id: (r.title, r.body) for r in html_clean(df).collect()}
    assert rows[1] == ("A", "one")
    assert rows[2] == ("", "two")


def test_self_closing_dropped_tag_keeps_rest_of_body():
    # regression: <script .../> emitted only an open token, so everything
    # after it waited for a close that never came and was discarded
    from simplir_spark.functions.html_clean import clean_html

    _, body = clean_html(
        '<html><body>keep1 <script src="x.js"/> keep2 <canvas/> keep3</body></html>'
    )
    assert "keep1" in body and "keep2" in body and "keep3" in body
    # <br/> still contributes exactly one whitespace break
    _, b2 = clean_html("<body>a<br/>b</body>")
    assert b2 == "a b"

"""HTML text extraction: contract vectors (skip-content, blocks, entities,
malformed markup tolerance) + the distributed pass."""

from ape_dts_spark.functions.html_text import extract_text, html_to_text


def test_basic_blocks_and_entities():
    h = "<h1>A &amp; B</h1><p>one  two</p><div>&#60;x&#62;</div>"
    assert extract_text(h) == "A & B\none two\n<x>"


def test_script_style_content_dropped():
    h = "<style>p{}</style><script>var a = '<p>no</p>';</script><p>yes</p>"
    assert extract_text(h) == "yes"


def test_script_is_cdata_first_close_wins():
    # per HTML5 (and browsers), script content is CDATA: a '<script>' inside
    # it is plain text and the FIRST '</script>' ends the element — the
    # stdlib parser implements exactly that
    h = "<script>a<script>b</script>after</script><p>kept</p>"
    assert extract_text(h) == "after\nkept"
    # non-CDATA skip elements (template) DO nest via the depth counter
    h2 = "<template>x<template>y</template>z</template><p>kept</p>"
    assert extract_text(h2) == "kept"


def test_inline_tags_do_not_split_blocks():
    h = "<p>one <b>two</b> <span>three</span></p>"
    assert extract_text(h) == "one two three"


def test_br_and_selfclosing_flush():
    assert extract_text("line1<br/>line2<br>line3") == "line1\nline2\nline3"


def test_malformed_unclosed_and_uppercase():
    h = "<P>first<DIV>second"  # unclosed, uppercase
    assert extract_text(h) == "first\nsecond"


def test_attributes_with_angle_like_values():
    h = '<p data-x="a>b">body</p>'
    # the stdlib parser honors the quoted attribute: '>' inside it is data-safe
    assert extract_text(h) == "body"


def test_whitespace_collapse_and_empty_blocks():
    h = "<p>  a\n\n b\t c  </p><p>   </p><p></p><div>d</div>"
    assert extract_text(h) == "a b c\nd"


def test_comments_dropped():
    # comment content (even tag-shaped) vanishes without flushing the block
    assert extract_text("x<!-- <p>ghost</p> -->y") == "xy"


def test_html_to_text_distributed(spark):
    rows = [(k, f"<h1>T{k}</h1><p>body {k}</p>") for k in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, html string").repartition(3)
    out = {r["doc_id"]: r["extracted"] for r in html_to_text(df).collect()}
    assert out == {k: f"T{k}\nbody {k}" for k in range(10)}

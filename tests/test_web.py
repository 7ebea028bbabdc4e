"""Charset transcode + URL canonicalization vectors."""

import pytest

from ape_dts_spark.functions.web import decode_bytes, decode_charset, normalize_url


def test_decode_known_charsets():
    assert decode_bytes("héllo".encode("latin-1"), "ISO-8859-1") == "héllo"
    assert decode_bytes("中文".encode("gbk"), "gb2312") == "中文"
    assert decode_bytes("abc".encode("utf-16-le"), "utf-16LE") == "abc"
    assert decode_bytes(b"plain", "US-ASCII") == "plain"


def test_decode_unknown_charset_raises():
    with pytest.raises(ValueError, match="charset"):
        decode_bytes(b"x", "koi8-r")


@pytest.mark.parametrize(
    "url,want",
    [
        # default port dropped, scheme+host lowercased, fragment stripped,
        # dot segments resolved, query sorted, utm dropped
        ("HTTP://WWW.E.COM:80/a/./b/../c?b=2&utm_source=x&a=1#f",
         "http://www.e.com/a/c?a=1&b=2"),
        # non-default port kept
        ("https://Host.io:8443/x/..", "https://host.io:8443/"),
        # trailing directory dot keeps the slash
        ("https://h/p/q/.", "https://h/p/q/"),
        # empty path -> '/'
        ("http://h?x=1", "http://h/?x=1"),
        # https default port dropped; blank values kept; gclid dropped
        ("https://h:443/?gclid=z&z=9&a", "https://h/?a=&z=9"),
        # '..' cannot climb above root
        ("http://h/a/b/../../../c", "http://h/c"),
    ],
)
def test_normalize_url_vectors(url, want):
    assert normalize_url(url) == want


def test_decode_charset_distributed(spark):
    rows = [
        (1, bytearray("héllo".encode("latin-1")), "iso-8859-1"),
        (2, bytearray("wörld".encode("utf-8")), "utf-8"),
        (3, bytearray("abc".encode("utf-16-le")), "utf-16le"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body binary, charset string")
    out = {r["doc_id"]: r["text"] for r in decode_charset(df).collect()}
    assert out == {1: "héllo", 2: "wörld", 3: "abc"}


def test_robots_allowed_distributed(spark):
    from ape_dts_spark.functions.web import robots_allowed

    robots = "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n"
    rows = [
        (1, "https://d.com/public/a", robots),
        (2, "https://d.com/private/a", robots),
        (3, "https://d.com/tmp/x", robots),
        (4, "https://d.com/", robots),
        (5, "https://d.com/anything", "User-agent: *\nDisallow: /\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, robots_txt string")
    out = {r["doc_id"]: r["allowed"] for r in robots_allowed(df).collect()}
    assert out == {1: True, 2: False, 3: False, 4: True, 5: False}


def test_robots_agent_specific():
    from urllib.robotparser import RobotFileParser

    # sanity pin of the stdlib semantics the kernel relies on: specific
    # agent group wins over *
    rp = RobotFileParser()
    rp.parse("User-agent: badbot\nDisallow: /\nUser-agent: *\nDisallow:\n".splitlines())
    assert rp.can_fetch("*", "https://d.com/x") is True
    assert rp.can_fetch("badbot", "https://d.com/x") is False


def test_sniff_charset_priority_order():
    from ape_dts_spark.functions.web import sniff_charset

    meta = b'<meta charset="gbk">x'
    # transport header beats everything
    assert sniff_charset(meta, "utf-8") == "utf-8"
    # BOM beats meta
    assert sniff_charset(b"\xef\xbb\xbf" + meta) == "utf-8-sig"
    assert sniff_charset(b"\xff\xfe" + b"a\x00") == "utf-16"
    # meta (both syntaxes) beats default
    assert sniff_charset(meta) == "gbk"
    assert sniff_charset(b'<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">') == "iso-8859-1"
    # default
    assert sniff_charset(b"nothing here") == "utf-8"


def test_decode_html_bytes_consumes_boms():
    from ape_dts_spark.functions.web import decode_html_bytes

    label, text = decode_html_bytes("﻿héllo".encode("utf-16-le"))
    assert label == "utf-16" and text == "héllo"
    label, text = decode_html_bytes(b"\xef\xbb\xbf" + "héllo".encode("utf-8"))
    assert label == "utf-8-sig" and text == "héllo"

"""Web-corpus plumbing between WARC ingestion and text extraction:
charset transcoding (HTTP Content-Type driven) and URL canonicalization.

Both are real implementations over the stdlib (codecs, urllib.parse) run as
Arrow-batched mapInPandas kernels — per-row logic with genuinely iterative
semantics (codec state machines, dot-segment resolution), the sanctioned
Python-kernel shape. No shuffle in either.
"""

from __future__ import annotations

from collections.abc import Iterator
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame

# HTTP charset labels -> Python codecs (the aliases a crawl actually sees)
_CHARSET_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "gbk": "gbk",
    "gb2312": "gbk",  # the common mislabel: GB2312-tagged pages use GBK
    "utf-16": "utf-16",
    "utf-8-sig": "utf-8-sig",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def decode_bytes(payload: bytes, charset: str) -> str:
    """Decode one payload with its declared HTTP charset (alias-normalized).
    Unknown charsets raise — route through a dead-letter filter upstream for
    quarantine semantics, never silently mojibake."""
    codec = _CHARSET_ALIASES.get(charset.strip().lower())
    if codec is None:
        raise ValueError(f"unsupported charset label: {charset!r}")
    return payload.decode(codec)


def decode_charset(
    df: DataFrame, payload_col: str = "body", charset_col: str = "charset",
    id_col: str = "doc_id", out_col: str = "text",
) -> DataFrame:
    """Distributed per-row transcode: (binary payload, declared charset) ->
    text, one Arrow pass."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    out_col: [
                        decode_bytes(bytes(b), c)
                        for b, c in zip(pdf[payload_col], pdf[charset_col])
                    ],
                }
            )

    return df.mapInPandas(_decode, schema=f"doc_id long, {out_col} string")


# tracking parameters dropped during canonicalization (the standard list)
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = {"gclid", "fbclid", "msclkid", "mc_eid", "igshid"}

_DEFAULT_PORTS = {"http": 80, "https": 443}


def _resolve_dots(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments (posixpath.normpath is NOT
    equivalent: it collapses '//' and mishandles trailing slashes)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    # a trailing '.' or '..' keeps the directory form
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


def normalize_url(url: str) -> str:
    """Canonicalize one URL: lowercase scheme+host, strip default ports and
    fragments, resolve dot-segments, sort query parameters, drop tracking
    parameters, '/' for an empty path."""
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = (s.hostname or "").lower()
    netloc = host
    if s.port is not None and s.port != _DEFAULT_PORTS.get(scheme):
        netloc += f":{s.port}"
    path = _resolve_dots(s.path) if s.path else "/"
    q = [
        (k, v)
        for k, v in parse_qsl(s.query, keep_blank_values=True)
        if not k.lower().startswith(_TRACKING_PREFIXES) and k.lower() not in _TRACKING_EXACT
    ]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


def normalize_urls(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Distributed URL canonicalization, one Arrow pass."""

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "url": pdf[url_col],
                    "canonical": [normalize_url(u) for u in pdf[url_col]],
                }
            )

    return df.mapInPandas(_norm, schema="doc_id long, url string, canonical string")


def robots_allowed(
    df: DataFrame, url_col: str = "url", robots_col: str = "robots_txt",
    id_col: str = "doc_id", agent: str = "*",
) -> DataFrame:
    """Crawl-policy filter: evaluate each URL against its domain's robots.txt
    (stdlib urllib.robotparser — real Robots Exclusion Protocol matching,
    not a regex approximation). Input carries the robots text alongside the
    URL (the join to a per-domain robots table happens upstream — broadcast,
    domains are tiny next to pages); output adds the boolean verdict."""
    from urllib.robotparser import RobotFileParser

    def _eval(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, RobotFileParser] = {}
        for pdf in batches:
            verdicts = []
            for u, txt in zip(pdf[url_col], pdf[robots_col]):
                rp = cache.get(txt)
                if rp is None:
                    rp = RobotFileParser()
                    rp.parse(txt.splitlines())
                    cache[txt] = rp
                verdicts.append(bool(rp.can_fetch(agent, u)))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "url": pdf[url_col], "allowed": verdicts}
            )

    return df.mapInPandas(_eval, schema="doc_id long, url string, allowed boolean")


import re as _re

_META_CHARSET = _re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([A-Za-z0-9_\-]+)|content\s*=\s*["'][^"']*charset=([A-Za-z0-9_\-]+))""",
    _re.IGNORECASE,
)


def sniff_charset(payload: bytes, http_charset: str | None = None) -> str:
    """Charset resolution in the order a browser applies it (WHATWG encoding
    sniffing, reduced to the deterministic core): the transport-level HTTP
    charset wins; else a BOM; else an ASCII-scan of the first 1024 bytes for
    ``<meta charset=..>`` / ``http-equiv Content-Type``; else utf-8. Returns
    a label decode_bytes accepts ('utf-16' / 'utf-8-sig' consume the BOM)."""
    if http_charset:
        return http_charset
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    m = _META_CHARSET.search(payload[:1024])
    if m:
        return (m.group(1) or m.group(2)).decode("ascii").lower()
    return "utf-8"


def decode_html_bytes(payload: bytes, http_charset: str | None = None) -> tuple[str, str]:
    """(detected charset label, decoded text) — the sniff + transcode step
    for response bodies whose Content-Type omits the charset."""
    label = sniff_charset(payload, http_charset)
    return label, decode_bytes(payload, label)


def sniff_decode(
    df: DataFrame, payload_col: str = "body", id_col: str = "doc_id",
    http_charset_col: str | None = None,
) -> DataFrame:
    """Distributed sniff + transcode for bodies whose HTTP header may omit
    the charset: one Arrow pass emitting (id, detected charset, text)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            heads = pdf[http_charset_col] if http_charset_col else [None] * len(pdf)
            out = [decode_html_bytes(bytes(b), h) for b, h in zip(pdf[payload_col], heads)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "charset": [c for c, _ in out],
                    "text": [t for _, t in out],
                }
            )

    return df.mapInPandas(_decode, schema="doc_id long, charset string, text string")

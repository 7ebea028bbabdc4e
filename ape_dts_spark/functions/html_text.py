"""HTML -> text extraction: the step between WARC ingestion and every text
operator in a web-scale pipeline (the trafilatura/jusText slot, reduced to
its deterministic core so it can be oracle-gated).

Extraction contract (deliberately simple and exactly specified, because the
correctness gate restates it in SQL):

- script / style / noscript / template element CONTENT is dropped entirely;
- comments, processing instructions and declarations are dropped;
- character/entity references decode (&amp; -> &, &#60; -> <) via the
  stdlib parser's convert_charrefs;
- text accumulates into BLOCKS: a block flushes at the open OR close of a
  block-level element (p, div, br, li, tr, h1-h6, title, ul, ol, table,
  section, article, header, footer, blockquote, pre); inline elements
  (a, b, i, span, em, strong, code, ...) do NOT flush;
- within a block, whitespace runs collapse to single spaces and the block is
  trimmed; empty blocks are dropped;
- output = blocks joined by '\\n'.

Real parsing via the stdlib ``html.parser.HTMLParser`` (tolerant of unclosed
tags, attribute quoting styles, case); one Arrow-batched mapInPandas pass,
no shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

_SKIP_CONTENT = {"script", "style", "noscript", "template"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "title", "ul", "ol", "table", "section", "article", "header", "footer",
    "blockquote", "pre",
}
_WS = re.compile(r"[ \t\r\n\f\v]+")


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._buf)).strip()
        self._buf = []
        if text:
            self.blocks.append(text)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self._buf.append(data)


def extract_text(html: str) -> str:
    """Extract visible text from one HTML document per the module contract."""
    p = _Extractor()
    p.feed(html)
    p.close()
    p._flush()
    return "\n".join(p.blocks)


def html_to_text(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Distributed extraction: one Arrow-batched mapInPandas pass mapping the
    HTML column to its extracted text — no shuffle, partition = input split."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "extracted": [extract_text(h) for h in pdf[html_col]],
                }
            )

    return df.mapInPandas(_extract, schema="doc_id long, extracted string")

"""Ray-Data-native web-crawl + publication-date-extraction engine.

A from-scratch distributed engine whose payload stage reimplements the
semantics of the go-htmldate publication-date extractor (reference at
/root/reference, studied for behaviour only) as Ray Data ``map_batches``
stages over zero-copy Arrow batches, plus a brand-new URL-frontier crawl
scheduler and large-scale training-data operators.
"""

from .extract import from_document, from_html
from .functions.kernels import DateParserConfig, Options, Result

__all__ = ["from_html", "from_document", "DateParserConfig", "Options", "Result"]

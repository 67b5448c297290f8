"""HTML → visible-text extraction — the corpus-ingest step that turns
fetched pages into the ``text`` column of a training-data table.

Extraction rule (deterministic, so the synthetic-page oracle can
recompute it in SQL): walk the ``<body>`` subtree in document order,
skipping script/style/noscript/template; text nodes accumulate into the
current *block*, block-level tags flush on open and close; each block is
whitespace-collapsed and stripped, empty blocks are dropped, blocks join
with a single newline.  Entities are left as written (the tokenizer
stores raw text) — the synthetic corpus is entity-free.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from .. import dom

_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "dd", "div",
        "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main",
        "nav", "ol", "p", "pre", "section", "table", "td", "th", "tr",
        "ul", "br",
    }
)
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_WS = re.compile(r"\s+")


def extract_visible_text(root) -> str:
    """Visible text of a parsed page per the module's block rule."""
    blocks: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            s = _WS.sub(" ", "".join(buf)).strip()
            buf.clear()
            if s:
                blocks.append(s)

    def walk(node) -> None:
        for child in node.children:
            if child.type == dom.TEXT:
                buf.append(child.data)
            elif child.type == dom.ELEMENT:
                if child.tag in _SKIP_TAGS:
                    continue
                if child.tag in _BLOCK_TAGS:
                    flush()
                    walk(child)
                    flush()
                else:
                    walk(child)

    body = dom.query_first_element(root, "body")
    walk(body if body is not None else root)
    flush()
    return "\n".join(blocks)


def page_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch (doc_id, html) → (doc_id, n_chars, text_md5).

    The md5 digest stands in for shipping the full text through the
    comparison harness; a production pipeline would emit the text
    column itself (same stage, different projection)."""
    doc_ids = batch.column("doc_id")
    htmls = batch.column("html").to_pylist()
    n_chars, md5s = [], []
    for raw in htmls:
        text = extract_visible_text(dom.parse_html(raw or b""))
        n_chars.append(len(text))
        md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_chars": pa.array(n_chars, pa.int64()),
            "text_md5": pa.array(md5s, pa.string()),
        }
    )


def page_texts(sf_dir: str):
    """Corpus-wide text extraction over the synthesized frontier pages:
    streamed page synthesis → per-batch DOM parse + block walk.  Pure
    task-pool stage (the parser holds no per-worker state)."""
    from ..sources.pages import read_pages

    pages = read_pages(sf_dir)
    return pages.map_batches(
        lambda b: page_text_batch(b.select(["doc_id", "html"])),
        batch_format="pyarrow",
    )

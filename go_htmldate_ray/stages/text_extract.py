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


# --- jusText-style boilerplate block classification ---------------------------
# The standard web-text extraction refinement (jusText / boilerpipe
# family): classify each text block as content or boilerplate from its
# word count and link density.  Two-class simplification with integer
# thresholds so the synthetic-page oracle recomputes it exactly:
# good ⇔ n_words >= JUSTEXT_MIN_WORDS and link_density < 1/2
# (compared as 2·n_link_words < n_words).
JUSTEXT_MIN_WORDS = 10


def extract_blocks(root) -> list[tuple[str, int, int]]:
    """Document-order blocks of the ``<body>`` subtree as
    ``(text, n_words, n_link_words)`` — same block rule as
    :func:`extract_visible_text`, plus anchor-descendant tracking.
    Link words are the whitespace words of the anchor text pieces
    joined by single spaces (anchors are whole-word in any sane page;
    the rule is deterministic either way)."""
    blocks: list[tuple[str, int, int]] = []
    buf: list[tuple[str, bool]] = []

    def flush() -> None:
        if not buf:
            return
        text = _WS.sub(" ", "".join(p for p, _ in buf)).strip()
        link_text = _WS.sub(
            " ", " ".join(p for p, in_a in buf if in_a)
        ).strip()
        buf.clear()
        if text:
            blocks.append((text, len(text.split()), len(link_text.split())))

    def walk(node, in_link: bool) -> None:
        for child in node.children:
            if child.type == dom.TEXT:
                buf.append((child.data, in_link))
            elif child.type == dom.ELEMENT:
                if child.tag in _SKIP_TAGS:
                    continue
                nl = in_link or child.tag == "a"
                if child.tag in _BLOCK_TAGS:
                    flush()
                    walk(child, nl)
                    flush()
                else:
                    walk(child, nl)

    body = dom.query_first_element(root, "body")
    walk(body if body is not None else root, False)
    flush()
    return blocks


def boilerplate_batch(batch: pa.Table) -> pa.Table:
    """pages batch (doc_id, html) → per-doc boilerplate summary:
    n_blocks, n_good, good_words, boiler_words, good_md5 (md5 of the
    good blocks joined by newlines — the cleaned training text)."""
    doc_ids = batch.column("doc_id")
    htmls = batch.column("html").to_pylist()
    cols = {k: [] for k in (
        "n_blocks", "n_good", "good_words", "boiler_words", "good_md5",
    )}
    for raw in htmls:
        blocks = extract_blocks(dom.parse_html(raw or b""))
        good, gw, bw = [], 0, 0
        for t, nw, nl in blocks:
            if nw >= JUSTEXT_MIN_WORDS and 2 * nl < nw:
                good.append(t)
                gw += nw
            else:
                bw += nw
        cols["n_blocks"].append(len(blocks))
        cols["n_good"].append(len(good))
        cols["good_words"].append(gw)
        cols["boiler_words"].append(bw)
        cols["good_md5"].append(
            hashlib.md5("\n".join(good).encode("utf-8")).hexdigest()
        )
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_blocks": pa.array(cols["n_blocks"], pa.int64()),
            "n_good": pa.array(cols["n_good"], pa.int64()),
            "good_words": pa.array(cols["good_words"], pa.int64()),
            "boiler_words": pa.array(cols["boiler_words"], pa.int64()),
            "good_md5": pa.array(cols["good_md5"], pa.string()),
        }
    )


def boilerplate_blocks(sf_dir: str):
    """jusText-style content/boilerplate classification over the
    synthesized frontier pages — same streamed synthesis + task-pool
    shape as :func:`page_texts`."""
    from ..sources.pages import read_pages

    pages = read_pages(sf_dir)
    return pages.map_batches(
        lambda b: boilerplate_batch(b.select(["doc_id", "html"])),
        batch_format="pyarrow",
    )


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

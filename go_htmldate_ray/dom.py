"""Minimal fault-tolerant HTML DOM built on the stdlib ``html.parser``.

The reference engine parses documents with a WHATWG parser
(golang.org/x/net/html via go-shiori/dom, /root/reference/core.go:48-56).
No HTML parser library ships in this environment, so this module builds a
lightweight document tree with the error-recovery behaviours the extraction
cascade depends on: implicit closes for misnested tags, void elements,
script/style raw text, and serialization for the string-search stages.

One parser instance per extraction call; the per-actor Ray stage reuses the
module (compiled tables) across batches.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

ELEMENT = 0
TEXT = 1
COMMENT = 2

VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# Tags whose opening implicitly closes an open element of the listed tags.
_IMPLIED_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "dt": {"dd", "dt"},
    "dd": {"dd", "dt"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "optgroup": {"option", "optgroup"},
}

_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&#34;", "'": "&#39;"}


def _escape(s: str) -> str:
    if not any(c in s for c in '&<>"\''):
        return s
    for ch, rep in _ESCAPES.items():
        s = s.replace(ch, rep)
    return s


class Node:
    __slots__ = ("type", "tag", "attrs", "children", "parent", "data")

    def __init__(self, type_: int, tag: str = "", data: str = ""):
        self.type = type_
        self.tag = tag
        self.attrs: dict[str, str] = {}
        self.children: list["Node"] = []
        self.parent: Optional["Node"] = None
        self.data = data

    # --- attribute access ---------------------------------------------------
    def attr(self, name: str) -> str:
        return self.attrs.get(name, "")

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    @property
    def class_name(self) -> str:
        return self.attrs.get("class", "")

    # --- tree ops -----------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def remove(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def iter_elements(self) -> Iterator["Node"]:
        """All descendant elements in document order (excluding self)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.type == ELEMENT:
                yield node
                stack.extend(reversed(node.children))

    def get_elements_by_tag(self, *tags: str) -> list["Node"]:
        tagset = frozenset(tags)
        return [e for e in self.iter_elements() if e.tag in tagset]

    def text_content(self) -> str:
        """Concatenated text of the subtree (dom.TextContent semantics)."""
        parts: list[str] = []
        stack = list(reversed(self.children)) if self.type == ELEMENT else [self]
        while stack:
            node = stack.pop()
            if node.type == TEXT:
                parts.append(node.data)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def etree_text(self) -> str:
        """Text before the first element child (utils.go:110-125)."""
        parts: list[str] = []
        for child in self.children:
            if child.type == ELEMENT:
                break
            if child.type == TEXT:
                parts.append(child.data)
        return "".join(parts)

    def inner_html(self) -> str:
        return "".join(_render(c) for c in self.children)

    def outer_html(self) -> str:
        return _render(self)


def _render(node: Node) -> str:
    if node.type == COMMENT:
        return f"<!--{node.data}-->"
    if node.type == TEXT:
        if node.parent is not None and node.parent.tag in ("script", "style"):
            return node.data
        return _escape(node.data)
    attrs = "".join(f' {k}="{_escape(v)}"' for k, v in node.attrs.items())
    if node.tag in VOID_ELEMENTS and not node.children:
        return f"<{node.tag}{attrs}/>"
    inner = "".join(_render(c) for c in node.children)
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(ELEMENT, "#document")
        self.stack: list[Node] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        implied = _IMPLIED_CLOSE.get(tag)
        if implied:
            while len(self.stack) > 1 and self.stack[-1].tag in implied:
                self.stack.pop()
        node = Node(ELEMENT, tag)
        for k, v in attrs:
            if k not in node.attrs:
                node.attrs[k] = v if v is not None else ""
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(ELEMENT, tag)
        for k, v in attrs:
            if k not in node.attrs:
                node.attrs[k] = v if v is not None else ""
        self.stack[-1].append(node)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Unmatched end tag: ignore (error recovery)

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(Node(TEXT, data=data))

    def handle_comment(self, data: str) -> None:
        # Comments stay in the tree: the reference keeps them (its comment
        # removal is disabled, utils.go:36-38) and the serialized-HTML regex
        # stages (core.go:212-227) must see comment content.
        self.stack[-1].append(Node(COMMENT, data=data))

    def handle_pi(self, data: str) -> None:
        self.stack[-1].append(Node(COMMENT, data="?" + data))

    def handle_decl(self, decl: str) -> None:
        pass


def parse_html(content: bytes | str) -> Node:
    """Parse HTML into a document node; never raises on malformed input."""
    if isinstance(content, (bytes, bytearray, memoryview)):
        content = _decode(bytes(content))
    builder = _TreeBuilder()
    try:
        builder.feed(content)
        builder.close()
    except Exception:
        pass  # recover with whatever tree was built
    doc = builder.root
    _ensure_html_root(doc)
    return doc


def _decode(raw: bytes) -> str:
    """Best-effort charset detection: BOM, meta charset sniff, utf-8, latin-1."""
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", errors="replace")
    head = raw[:4096].lower()
    enc = None
    idx = head.find(b"charset=")
    if idx != -1:
        val = head[idx + 8: idx + 40].strip(b'"\' ')
        for ch in (b'"', b"'", b">", b"/", b" ", b";"):
            cut = val.find(ch)
            if cut != -1:
                val = val[:cut]
        try:
            enc = val.decode("ascii").strip() or None
        except UnicodeDecodeError:
            enc = None
    for candidate in (enc, "utf-8", "latin-1"):
        if not candidate:
            continue
        try:
            return raw.decode(candidate)
        except (UnicodeDecodeError, LookupError):
            continue
    return raw.decode("utf-8", errors="replace")


def _ensure_html_root(doc: Node) -> None:
    """Guarantee an <html> element exists wrapping the content, so the
    serialized-string stages (core.go:212-219) have a well-defined target."""
    for child in doc.children:
        if child.type == ELEMENT and child.tag == "html":
            return
    html_node = Node(ELEMENT, "html")
    for child in list(doc.children):
        child.remove()
        html_node.append(child)
    doc.append(html_node)


def query_first_element(root: Node, tag: str) -> Optional[Node]:
    for e in root.iter_elements():
        if e.tag == tag:
            return e
    return None

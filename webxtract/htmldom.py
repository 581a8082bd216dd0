"""From-scratch HTML tokenizer + DOM tree (stdlib only; no lxml/bs4 in this
environment — SURVEY.md §7.0).

Replaces the managed OCR structure analysis of the reference
(textract-integration/fn-call-textract/main.py:52-61) with a local,
deterministic parse. Built on ``html.parser.HTMLParser`` (tokenizer only);
tree construction, tag-soup repair, and text extraction are ours.

Determinism notes (SURVEY.md §7.4): node order is document order; attr
handling keeps first occurrence; entity decoding is done by the stdlib
tokenizer (convert_charrefs=True) which is deterministic.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Elements whose content is never text (dropped wholesale).
SKIP_CONTENT = frozenset({"script", "style", "noscript", "template", "svg", "iframe"})

# Void elements (no close tag expected).
VOID = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# Elements that start a new visual block (segmentation boundaries).
BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html", "li", "main",
    "nav", "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot",
    "th", "thead", "tr", "ul", "br",
})

# Semantic boilerplate containers (class/id keywords or tag names).
BOILER_TAGS = frozenset({"nav", "header", "footer", "aside"})
BOILER_KEYWORDS = ("nav", "menu", "footer", "header", "sidebar", "banner",
                   "breadcrumb", "advert", "promo", "cookie", "social", "share")


class Node:
    """DOM element node. Children are Node or str (text)."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    def is_boiler_container(self) -> bool:
        if self.tag in BOILER_TAGS:
            return True
        marker = (self.attrs.get("class", "") + " " + self.attrs.get("id", "")).lower()
        return any(k in marker for k in BOILER_KEYWORDS)

    def __repr__(self) -> str:  # debug only
        return f"<{self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    """Tokenizer -> tree with tag-soup repair: unmatched close tags are
    ignored; a close tag pops up to the nearest matching open tag; anything
    left open at EOF closes implicitly."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root
        self._skip_depth = 0

    def updatepos(self, i: int, j: int) -> int:
        # line/offset tracking is only for error messages, which we never
        # surface; skipping it saves ~6% of tokenizer time (profiled)
        return j

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in SKIP_CONTENT and tag not in VOID:
                self._skip_depth += 1
            return
        if tag in SKIP_CONTENT:
            self._skip_depth = 1
            return
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v or ""
        node = Node(tag, adict, self.cur)
        self.cur.children.append(node)
        if tag not in VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        if tag in SKIP_CONTENT:
            return
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v or ""
        self.cur.children.append(Node(tag, adict, self.cur))

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in SKIP_CONTENT:
                self._skip_depth -= 1
            return
        if tag in VOID:
            return
        # pop to nearest matching open tag; ignore if none (stray close)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent
        elif n is not None:  # matched #root — shouldn't happen
            self.cur = self.root

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self.cur.children.append(data)


def parse_html(text: str) -> Node:
    """Parse HTML text into a repaired DOM tree. Never raises on tag soup."""
    b = _TreeBuilder()
    try:
        b.feed(text)
        b.close()
    except Exception:
        pass  # keep whatever tree was built; poison rows must not kill tasks
    return b.root


import re as _re

_CHARSET_RE = _re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_-]{2,20})", _re.I)

# declared-charset whitelist -> python codec (web-scale corpora are
# mostly utf-8 + cp1252/latin-1; anything else is rejected as
# undecodable rather than silently mangled)
_CODECS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "iso-8859-1": "windows-1252", "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
}


def decode_bytes(html: bytes) -> str | None:
    """Encoding sniff: strict utf-8 first; on failure honor an explicit
    ``<meta charset=...>`` declaration from the whitelist (decoded with
    'replace' — deterministic); else None (undecodable -> quality
    reject; the synth 'bad' family emits invalid utf-8 with no declared
    charset on purpose)."""
    try:
        return html.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        pass
    m = _CHARSET_RE.search(html[:2048])
    if m:
        codec = _CODECS.get(m.group(1).decode("ascii", "replace").lower())
        if codec:
            return html.decode(codec, "replace")
    return None

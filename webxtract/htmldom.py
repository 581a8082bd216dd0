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

import re as _re_boiler  # noqa: E402 (compiled once at import)

_BOILER_RE = _re_boiler.compile("|".join(BOILER_KEYWORDS))


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
        a = self.attrs
        if not a:  # the common case: no attrs, no markers
            return False
        marker = (a.get("class", "") + " " + a.get("id", "")).lower()
        # one C-level alternation scan instead of 12 substring probes
        return _BOILER_RE.search(marker) is not None

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


# --- fast tokenizer --------------------------------------------------------
#
# Single-pass mirror of html.parser.HTMLParser.goahead(end=True) with
# convert_charrefs=True, driving the SAME _TreeBuilder handlers. The
# stdlib tokenizer pays several regex matches + buffer bookkeeping per
# tag (~30us/tag profiled); this path reuses the stdlib's own tolerant
# regexes (tagfind/attrfind/locatestarttagend/endtagfind) but scans the
# document once with no incremental-feed machinery. Output equivalence
# is enforced by tests/test_htmldom.py::test_fast_feed_differential
# (identical block output over every synthetic family + hostile
# fixtures) and by the frozen goldens.

import re
from html import unescape as _unescape
from html.parser import (attrfind_tolerant as _attrfind,
                         endtagfind as _endtagfind,
                         locatestarttagend_tolerant as _locatestart,
                         starttagopen as _starttagopen,
                         tagfind_tolerant as _tagfind)

_commentclose = re.compile(r"--\s*>")
_markedclose = re.compile(r"\]\s*\]\s*>")
_endendtag = re.compile(">")
_piclose = re.compile(">")
_CDATA_ELEMS = ("script", "style")  # HTMLParser.CDATA_CONTENT_ELEMENTS
_cdata_interesting = {t: re.compile(r"</\s*%s" % t, re.I)
                      for t in _CDATA_ELEMS}


def _check_whole_start_tag(rawdata: str, i: int) -> int:
    """Mirror of check_for_whole_start_tag with end-of-input == EOF."""
    m = _locatestart.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j:j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if rawdata.startswith("/>", j):
            return j + 2
        return j if j > i else i + 1  # bogus input
    if nxt == "":
        return -1  # end of input
    if nxt in ("abcdefghijklmnopqrstuvwxyz=/"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ"):
        return -1
    return j if j > i else i + 1


def fast_feed(b: "_TreeBuilder", rawdata: str) -> None:
    """One-shot tokenize of ``rawdata`` into ``b``'s handler methods."""
    i, n = 0, len(rawdata)
    cdata_elem: str | None = None
    handle_data = b.handle_data
    startswith = rawdata.startswith
    while i < n:
        if cdata_elem is None:
            j = rawdata.find("<", i)
            if j < 0:
                j = n
            if i < j:
                text = rawdata[i:j]
                handle_data(_unescape(text) if "&" in text else text)
        else:
            m = _cdata_interesting[cdata_elem].search(rawdata, i)
            if not m:
                return  # EOF inside raw text: stdlib drops the tail
            j = m.start()
            if i < j:
                handle_data(rawdata[i:j])  # raw: no charref conversion
        i = j
        if i >= n:
            break
        if _starttagopen.match(rawdata, i):  # '<' + letter
            endpos = _check_whole_start_tag(rawdata, i)
            if endpos < 0:
                k = -1
            else:
                tm = _tagfind.match(rawdata, i + 1)
                tag = tm.group(1).lower()
                attrs = []
                k2 = tm.end()
                while k2 < endpos:
                    am = _attrfind.match(rawdata, k2)
                    if not am:
                        break
                    attrname, rest, attrvalue = am.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif (attrvalue[:1] == "'" == attrvalue[-1:]
                          or attrvalue[:1] == '"' == attrvalue[-1:]):
                        attrvalue = attrvalue[1:-1]
                    if attrvalue:
                        attrvalue = _unescape(attrvalue)
                    attrs.append((attrname.lower(), attrvalue))
                    k2 = am.end()
                end = rawdata[k2:endpos].strip()
                if end not in (">", "/>"):
                    handle_data(rawdata[i:endpos])
                elif end.endswith("/>"):
                    b.handle_startendtag(tag, attrs)
                else:
                    b.handle_starttag(tag, attrs)
                    if tag in _CDATA_ELEMS:
                        cdata_elem = tag
                k = endpos
        elif startswith("</", i):
            m = _endendtag.search(rawdata, i + 1)
            if not m:
                k = -1
            else:
                gtpos = m.end()
                m = _endtagfind.match(rawdata, i)
                if not m:
                    if cdata_elem is not None:
                        handle_data(rawdata[i:gtpos])
                        k = gtpos
                    else:
                        nm = _tagfind.match(rawdata, i + 2)
                        if not nm:
                            if rawdata[i:i + 3] == "</>":
                                k = i + 3
                            else:  # bogus comment: skip to '>'
                                pos = rawdata.find(">", i + 2)
                                k = -1 if pos == -1 else pos + 1
                        else:
                            b.handle_endtag(nm.group(1).lower())
                            k = rawdata.find(">", nm.end()) + 1
                else:
                    elem = m.group(1).lower()
                    if cdata_elem is not None and elem != cdata_elem:
                        handle_data(rawdata[i:gtpos])
                        k = gtpos
                    else:
                        b.handle_endtag(elem)
                        cdata_elem = None
                        k = gtpos
        elif startswith("<!--", i):
            m = _commentclose.search(rawdata, i + 4)
            k = -1 if not m else m.end()
        elif startswith("<?", i):
            m = _piclose.search(rawdata, i + 2)
            k = -1 if not m else m.end()
        elif startswith("<![", i):
            m = _markedclose.search(rawdata, i + 3)
            k = -1 if not m else m.end()
        elif rawdata[i:i + 9].lower() == "<!doctype":
            pos = rawdata.find(">", i + 9)
            k = -1 if pos == -1 else pos + 1
        elif startswith("<!", i):  # bogus comment
            pos = rawdata.find(">", i + 2)
            k = -1 if pos == -1 else pos + 1
        elif i + 1 < n:
            handle_data("<")
            k = i + 1
        else:  # lone '<' at EOF: stdlib's final end-of-data flush
            handle_data("<")
            break
        if k < 0:  # unterminated construct at EOF: goahead(end=1) recovery
            k = rawdata.find(">", i + 1)
            if k < 0:
                k = rawdata.find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if cdata_elem is None:
                text = rawdata[i:k]
                handle_data(_unescape(text) if "&" in text else text)
            else:
                handle_data(rawdata[i:k])
        i = k
    # trailing text was emitted inside the loop; stdlib's final
    # end-of-data flush only applies outside cdata mode (mirrored above)


def parse_html(text: str, fast: bool = True) -> Node:
    """Parse HTML text into a repaired DOM tree. Never raises on tag soup.

    ``fast=True`` uses the single-pass tokenizer above; ``fast=False``
    drives the same tree builder through the stdlib HTMLParser feed
    (the reference implementation the differential test checks against).
    """
    b = _TreeBuilder()
    try:
        if fast:
            fast_feed(b, text)
        else:
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

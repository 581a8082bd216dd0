"""Text-density / link-density boilerplate block classifier.

Boilerpipe/trafilatura-style main-content extraction, from scratch over
our stdlib DOM (htmldom.py). This replaces the managed structure analysis
the reference delegates to Textract
(textract-integration/fn-call-textract/main.py:52-61): the content blocks
we keep become the LINE blocks of the Block IR, in a documented, total,
deterministic reading order — which IS the semantics downstream (the
reference's "vendor = first LINE" rule, postprocessing/fn-postprocess/
main.py:47-56, depends entirely on block order).

Segmentation: a new text block starts at each block-level element
boundary (htmldom.BLOCK_TAGS); inline elements (a, span, b, ...) flow
into the current block. Features per block: whitespace-normalized text,
word count, anchor word count, link density, heading flag, boilerplate-
container flag (nav/header/footer/aside or class/id keyword match),
table-cell coordinates when inside a <table>.

Classification rule (deterministic; tuned on the synthetic families in
FIXTURES.md §1 and frozen by the goldens):
    CONTENT iff not in a boilerplate container
             and link_density <= 1/3
             and (words >= 8
                  or (heading and words >= 1)
                  or (words >= 2 and (has digit or ':' or '$' in text)))
Everything else is boilerplate and dropped.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .htmldom import BLOCK_TAGS, Node, parse_html

HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


@dataclass
class TextBlock:
    """One segmented visual block with classification features."""

    fragments: list[str] = field(default_factory=list)
    anchor_words: int = 0
    words: int = 0
    heading: bool = False
    boiler_container: bool = False
    table_row: int = -1
    table_col: int = -1

    _text: str | None = None

    @property
    def text(self) -> str:
        if self._text is None:
            self._text = " ".join(" ".join(self.fragments).split())
        return self._text

    @property
    def link_density(self) -> float:
        return self.anchor_words / self.words if self.words else 0.0

    def is_content(self) -> bool:
        if self.boiler_container or not self.words:
            return False
        if self.link_density > 1.0 / 3.0:
            return False
        if self.words >= 8:
            return True
        if self.heading and self.words >= 1:
            return True
        if self.table_row >= 0:
            # table cells are structured data: keep even single-word
            # cells (Textract emits every CELL; the length heuristics
            # below are for prose blocks)
            return True
        if self.words >= 2:
            t = self.text
            return any(c.isdigit() for c in t) or ":" in t or "$" in t
        return False

    def confidence(self) -> float:
        """Deterministic OCR-confidence analogue in (1, 99], float64.

        Longer, low-link-density blocks score higher; headings get a small
        boost (they are deliberate typography). Plays the role of
        Textract's per-LINE Confidence consumed at
        postprocessing/fn-postprocess/main.py:56.
        """
        c = 55.0 + 1.5 * min(self.words, 30) - 40.0 * self.link_density
        if self.heading:
            c += 5.0
        return max(1.0, min(99.0, c))


def segment(root: Node) -> list[TextBlock]:
    """Walk the DOM in document order and produce classified text blocks."""
    blocks: list[TextBlock] = []
    cur = TextBlock()
    row_counters: dict[int, int] = {}  # id(table node) -> next row index
    col_counters: dict[int, int] = {}  # id(tr node) -> next col index

    def flush() -> None:
        nonlocal cur
        if cur.fragments and cur.text:
            cur.words = len(cur.text.split())
            # anchor_words counted during walk; clamp to total
            cur.anchor_words = min(cur.anchor_words, cur.words)
            blocks.append(cur)
        cur = TextBlock()

    def walk(node: Node, in_anchor: bool, in_boiler: bool, heading: bool,
             trow: int, tcol: int) -> None:
        nonlocal cur
        for child in node.children:
            if isinstance(child, str):
                # strip allocates; NUL bytes are rare — scan first
                frag = child.strip("\x00") if "\x00" in child else child
                if frag and not frag.isspace():
                    cur.fragments.append(frag)
                    if in_anchor:
                        cur.anchor_words += len(frag.split())
                    cur.heading = cur.heading or heading
                    cur.boiler_container = cur.boiler_container or in_boiler
                    cur.table_row, cur.table_col = trow, tcol
                continue
            tag = child.tag
            c_boiler = in_boiler or child.is_boiler_container()
            c_heading = heading or tag in HEADINGS
            c_anchor = in_anchor or tag == "a"
            if tag in BLOCK_TAGS:
                flush()
                # table coordinates: tr increments row, td/th increments col
                n_trow, n_tcol = trow, tcol
                if tag == "table":
                    n_trow, n_tcol = -1, -1
                    row_counters[id(child)] = 0
                elif tag == "tr":
                    parent_table = _nearest_table(child)
                    if parent_table is not None:
                        n_trow = row_counters.get(id(parent_table), 0)
                        row_counters[id(parent_table)] = n_trow + 1
                        col_counters[id(child)] = 0
                elif tag in ("td", "th"):
                    parent_tr = _nearest_tr(child)
                    if parent_tr is not None:
                        n_tcol = col_counters.get(id(parent_tr), 0)
                        col_counters[id(parent_tr)] = n_tcol + 1
                walk(child, c_anchor, c_boiler, c_heading, n_trow, n_tcol)
                flush()
            else:
                walk(child, c_anchor, c_boiler, c_heading, trow, tcol)

    walk(root, False, False, False, -1, -1)
    flush()
    return blocks


def _nearest_table(node: Node) -> Node | None:
    n = node.parent
    while n is not None and n.tag != "table":
        n = n.parent
    return n


def _nearest_tr(node: Node) -> Node | None:
    n = node.parent
    while n is not None and n.tag != "tr":
        n = n.parent
    return n


def extract_blocks(html_text: str) -> list[TextBlock]:
    """Parse + segment + keep content blocks, in reading order."""
    root = parse_html(html_text)
    return [b for b in segment(root) if b.is_content()]

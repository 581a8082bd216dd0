"""Geometric layout parser for positioned-text ("pdfish") documents.

The PDF-analysis half of the extraction stage: replaces the reference's
Textract FORMS/TABLES geometric analysis
(textract-integration/fn-call-textract/main.py:52-61) with a from-scratch
implementation over our deterministic positioned-text format
(FIXTURES.md §2): payload starts with ``%XYD1\n``, then one token per
line — ``x0 y0 x1 y1 page conf text...`` in a 0-1000 page space.

Per page:
  1. tokens -> phrase groups: same baseline (|dy| < LINE_Y_THRESH) and
     inter-token x-gap <= GROUP_GAP merge into one group.
  2. recursive XY-cut over group boxes: horizontal (y) cuts before
     vertical (x) cuts, top/left region first — the total reading order.
  3. leaf regions -> LINE blocks: baseline-grouped groups, x-ordered,
     confidence = mean token confidence.
  4. geometric KV pairing (Textract-FORMS analogue): a group whose text
     ends with ':' pairs with the nearest group to its right on the same
     baseline (any region); key/value confidences = mean of each span.
  5. table-cell grouping: a leaf region with >=2 rows of >=2 x-aligned
     single-group columns and no KV labels becomes a TABLE_CELL grid.

Emitted Block IR is identical in shape to the HTML path (blocks.py), so
all downstream normalizers are shared unchanged.
"""

from __future__ import annotations

MAGIC = "%XYD1"
LINE_Y_THRESH = 10.0   # tokens/groups within this dy share a baseline
GROUP_GAP = 25.0       # max x-gap between tokens of one phrase group
HGAP = 25.0            # minimum uncovered y-gap for a horizontal cut
VGAP = 60.0            # minimum uncovered x-gap for a vertical cut
KV_MAX_DIST = 400.0    # max x-distance from label edge to value start
GRID_EPS = 1.5         # x0 alignment tolerance for table-cell columns


class Tok:
    __slots__ = ("x0", "y0", "x1", "y1", "page", "conf", "text")

    def __init__(self, x0, y0, x1, y1, page, conf, text):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.page, self.conf, self.text = page, conf, text


class Group:
    __slots__ = ("x0", "y0", "x1", "y1", "page", "confs", "texts", "line_idx")

    def __init__(self, tok: Tok):
        self.x0, self.y0, self.x1, self.y1 = tok.x0, tok.y0, tok.x1, tok.y1
        self.page = tok.page
        self.confs = [tok.conf]
        self.texts = [tok.text]
        self.line_idx = -1

    def absorb(self, tok: Tok) -> None:
        self.x1 = max(self.x1, tok.x1)
        self.y0 = min(self.y0, tok.y0)
        self.y1 = max(self.y1, tok.y1)
        self.confs.append(tok.conf)
        self.texts.append(tok.text)

    @property
    def text(self) -> str:
        return " ".join(self.texts)

    @property
    def conf(self) -> float:
        return sum(self.confs) / len(self.confs)


def parse_tokens(payload: str) -> list[Tok]:
    toks: list[Tok] = []
    for raw in payload.splitlines():
        if not raw or raw.startswith("%"):
            continue
        parts = raw.split(None, 6)
        if len(parts) < 7:
            continue
        try:
            x0, y0, x1, y1 = (float(p) for p in parts[:4])
            page = int(parts[4])
            conf = float(parts[5])
        except ValueError:
            continue  # malformed token line: drop, never abort (poison-row rule)
        toks.append(Tok(x0, y0, x1, y1, page, conf, parts[6]))
    return toks


def make_groups(tokens: list[Tok]) -> list[Group]:
    """Merge same-baseline, closely-spaced tokens into phrase groups."""
    toks = sorted(tokens, key=lambda t: (t.y0, t.x0))
    groups: list[Group] = []
    by_baseline: list[list[Tok]] = []
    for t in toks:
        if by_baseline and abs(t.y0 - by_baseline[-1][0].y0) < LINE_Y_THRESH:
            by_baseline[-1].append(t)
        else:
            by_baseline.append([t])
    for line in by_baseline:
        line.sort(key=lambda t: t.x0)
        g = Group(line[0])
        for t in line[1:]:
            if t.x0 - g.x1 <= GROUP_GAP:
                g.absorb(t)
            else:
                groups.append(g)
                g = Group(t)
        groups.append(g)
    return groups


def _gaps(intervals: list[tuple[float, float]], min_gap: float) -> list[float]:
    """Midpoints of uncovered gaps >= min_gap in a set of 1-D intervals."""
    ivs = sorted(intervals)
    out: list[float] = []
    end = ivs[0][1]
    for a, b in ivs[1:]:
        if a - end >= min_gap:
            out.append((end + a) / 2.0)
        end = max(end, b)
    return out


def xycut(groups: list[Group]) -> list[tuple[str, list[Group]]]:
    """Recursive XY-cut -> ordered ("lines" | "grid", region) leaves.

    Order: horizontal (y) cuts first, then a table-grid check, then
    vertical (x) cuts — so column gutters don't slice an aligned cell
    grid apart before it can be recognized."""
    if not groups:
        return []
    ygaps = _gaps([(g.y0, g.y1) for g in groups], HGAP)
    if ygaps:
        cut = ygaps[0]  # topmost gap: top region first
        top = [g for g in groups if g.y1 <= cut]
        bot = [g for g in groups if g.y1 > cut]
        return xycut(top) + xycut(bot)
    if (not any(g.text.endswith(":") for g in groups)
            and _try_grid(_region_lines(groups)) is not None):
        return [("grid", groups)]
    xgaps = _gaps([(g.x0, g.x1) for g in groups], VGAP)
    if xgaps:
        cut = xgaps[0]
        left = [g for g in groups if g.x1 <= cut]
        right = [g for g in groups if g.x1 > cut]
        return xycut(left) + xycut(right)
    return [("lines", groups)]


def _region_lines(region: list[Group]) -> list[list[Group]]:
    gs = sorted(region, key=lambda g: (g.y0, g.x0))
    lines: list[list[Group]] = []
    for g in gs:
        if lines and abs(g.y0 - lines[-1][0].y0) < LINE_Y_THRESH:
            lines[-1].append(g)
        else:
            lines.append([g])
    for ln in lines:
        ln.sort(key=lambda g: g.x0)
    return lines


def _try_grid(lines: list[list[Group]]) -> list[tuple[int, int, Group]] | None:
    """Detect an aligned cell grid: >=2 rows x >=2 x-aligned columns of
    single-token groups (multi-token phrases are prose, not cells)."""
    if len(lines) < 2 or any(len(ln) < 2 for ln in lines):
        return None
    ncols = len(lines[0])
    if any(len(ln) != ncols for ln in lines):
        return None
    if any(len(g.confs) != 1 for ln in lines for g in ln):
        return None
    for c in range(ncols):
        xs = [ln[c].x0 for ln in lines]
        if max(xs) - min(xs) > GRID_EPS:
            return None
    return [(r, c, g) for r, ln in enumerate(lines) for c, g in enumerate(ln)]


def layout_to_blocks(payload: str) -> list[dict]:
    """Positioned-text payload -> Block IR (same shape as blocks.block_rows)."""
    return tokens_to_blocks(parse_tokens(payload))


def tokens_to_blocks(toks: list[Tok]) -> list[dict]:
    """Positioned tokens -> Block IR.  Split out of layout_to_blocks so
    other positioned-text frontends (the real-PDF parser in ops/pdf.py)
    can reuse the identical grouping/XY-cut/KV/grid machinery without a
    round-trip through the %XYD1 serialization."""
    lines_out: list[dict] = []
    kvs_out: list[dict] = []
    cells_out: list[dict] = []
    order = 0
    for page in sorted({t.page for t in toks}):
        groups = make_groups([t for t in toks if t.page == page])
        grids: list[list[tuple[int, int, Group]]] = []
        # reading order: walk ordered leaves, emit one LINE per baseline
        for kind, region in xycut(groups):
            lines = _region_lines(region)
            for ln in lines:
                for g in ln:
                    g.line_idx = order
                lines_out.append({
                    "block_type": "LINE",
                    "text": " ".join(g.text for g in ln),
                    "confidence": sum(c for g in ln for c in g.confs)
                    / sum(len(g.confs) for g in ln),
                    "page": page, "reading_order": order,
                    "key_text": None, "value_text": None,
                    "key_conf": None, "value_conf": None,
                    "row": None, "col": None,
                })
                order += 1
            if kind == "grid":
                grids.append(_try_grid(lines) or [])
        # geometric KV pairing across the whole page (Textract-FORMS analogue)
        labels = [g for g in groups if g.text.endswith(":") and len(g.text) > 1]
        for lab in sorted(labels, key=lambda g: g.line_idx):
            best = None
            for h in groups:
                if h is lab or abs(h.y0 - lab.y0) >= LINE_Y_THRESH:
                    continue
                if h.x0 < lab.x1 - 2 or h.x0 - lab.x1 > KV_MAX_DIST:
                    continue
                if best is None or h.x0 < best.x0:
                    best = h
            if best is None:
                continue
            kvs_out.append({
                "block_type": "KV",
                "text": f"{lab.text} {best.text}",
                "confidence": min(lab.conf, best.conf),
                "page": page, "reading_order": lab.line_idx,
                "key_text": lab.text[:-1].strip(), "value_text": best.text,
                "key_conf": lab.conf, "value_conf": best.conf,
                "row": None, "col": None,
            })
        for grid in grids:
            for r, c, g in grid:
                cells_out.append({
                    "block_type": "TABLE_CELL", "text": g.text,
                    "confidence": g.conf, "page": page,
                    "reading_order": g.line_idx,
                    "key_text": None, "value_text": None,
                    "key_conf": None, "value_conf": None,
                    "row": r, "col": c,
                })
    return lines_out + kvs_out + cells_out

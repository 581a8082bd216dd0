"""XY-cut layout parser unit tests (reading order, KV pairing, grids)."""

from webxtract.pdflayout import layout_to_blocks


def doc(lines):
    return "%XYD1\n" + "\n".join(lines) + "\n"


def tok(x0, y0, text, conf=90.0, w=None, page=0):
    w = w if w is not None else 18 * len(text)
    return f"{x0:.1f} {y0:.1f} {x0 + w:.1f} {y0 + 24:.1f} {page} {conf:.1f} {text}"


def lines_of(blocks):
    return [b["text"] for b in blocks if b["block_type"] == "LINE"]


def test_simple_reading_order_top_to_bottom():
    b = layout_to_blocks(doc([tok(100, 200, "middle"), tok(100, 40, "top"),
                              tok(100, 400, "bottom")]))
    assert lines_of(b) == ["top", "middle", "bottom"]


def test_phrase_grouping_and_line_merge():
    b = layout_to_blocks(doc([tok(100, 40, "Hello"), tok(200, 40, "World")]))
    assert lines_of(b) == ["Hello World"]


def test_two_column_cut_left_first():
    # wide gutter -> vertical cut; left column read fully before right.
    # Multi-token phrases so the grid detector (which only fires on
    # single-token aligned cells) stays out of the way.
    b = layout_to_blocks(doc([
        tok(50, 100, "La"), tok(100, 100, "1a"), tok(700, 100, "Ra"), tok(750, 100, "1b"),
        tok(50, 140, "Lb"), tok(100, 140, "2a"), tok(700, 140, "Rb"), tok(750, 140, "2b"),
    ]))
    assert lines_of(b) == ["La 1a", "Lb 2a", "Ra 1b", "Rb 2b"]


def test_kv_pairing_same_baseline():
    b = layout_to_blocks(doc([tok(80, 100, "Date:"), tok(400, 100, "01/02/2020")]))
    kvs = [x for x in b if x["block_type"] == "KV"]
    assert len(kvs) == 1
    assert kvs[0]["key_text"] == "Date"
    assert kvs[0]["value_text"] == "01/02/2020"


def test_kv_pairing_picks_nearest_right():
    b = layout_to_blocks(doc([
        tok(80, 100, "Total:"), tok(300, 100, "$5.00"), tok(600, 100, "$9.99"),
    ]))
    kvs = [x for x in b if x["block_type"] == "KV"]
    assert kvs[0]["value_text"] == "$5.00"


def test_no_kv_pair_across_baselines():
    b = layout_to_blocks(doc([tok(80, 100, "Total:"), tok(300, 200, "$5.00")]))
    assert [x for x in b if x["block_type"] == "KV"] == []


def test_grid_detection():
    rows = []
    for r in range(3):
        for c in range(2):
            rows.append(tok(600 + 150 * c, 100 + 40 * r, f"v{r}{c}", w=60))
    b = layout_to_blocks(doc(rows))
    cells = [(x["row"], x["col"], x["text"]) for x in b if x["block_type"] == "TABLE_CELL"]
    assert cells == [(0, 0, "v00"), (0, 1, "v01"), (1, 0, "v10"),
                     (1, 1, "v11"), (2, 0, "v20"), (2, 1, "v21")]


def test_multi_token_phrases_are_not_cells():
    rows = [
        tok(100, 100, "long"), tok(180, 100, "phrase"),
        tok(600, 100, "more"), tok(690, 100, "words"),
        tok(100, 140, "other"), tok(200, 140, "phrase"),
        tok(600, 140, "again"), tok(700, 140, "words"),
    ]
    b = layout_to_blocks(doc(rows))
    assert [x for x in b if x["block_type"] == "TABLE_CELL"] == []


def test_malformed_token_lines_dropped():
    b = layout_to_blocks("%XYD1\nnot a token\n1 2\n" + tok(10, 10, "ok") + "\n")
    assert lines_of(b) == ["ok"]


def test_multipage_order():
    b = layout_to_blocks(doc([tok(10, 10, "p2", page=1), tok(10, 10, "p1", page=0)]))
    assert lines_of(b) == ["p1", "p2"]
    assert [x["page"] for x in b] == [0, 1]


def test_mean_confidence():
    b = layout_to_blocks(doc([tok(100, 40, "a", conf=80.0), tok(140, 40, "b", conf=90.0)]))
    assert b[0]["confidence"] == 85.0

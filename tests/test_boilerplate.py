"""Boilerplate classifier unit tests (M5 content selection semantics)."""

from webxtract.boilerplate import extract_blocks, segment
from webxtract.htmldom import parse_html


def texts(html):
    return [b.text for b in extract_blocks(html)]


def test_nav_dropped_main_kept():
    html = (
        '<body><div class="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
        "<div><p>this is a long enough paragraph of real content words here</p></div>"
        '<div class="footer"><a href="/p">Privacy</a></div></body>'
    )
    assert texts(html) == ["this is a long enough paragraph of real content words here"]


def test_linkfarm_mostly_empty():
    items = "".join(f'<li><a href="/{i}">some link text {i}</a></li>' for i in range(30))
    assert texts(f"<ul>{items}</ul>") == []


def test_heading_kept_even_short():
    assert texts("<h1>Title</h1>") == ["Title"]


def test_short_line_with_digits_kept():
    assert texts("<p>Total: $45.60</p>") == ["Total: $45.60"]
    assert texts("<p>Espresso $3.50</p>") == ["Espresso $3.50"]


def test_short_line_without_signal_dropped():
    assert texts("<p>hello world</p>") == []


def test_link_density_boundary():
    # 1 anchor word of 3 = 0.33 <= 1/3 -> kept; 2 of 3 -> dropped
    kept = "<p>read <a href='/x'>this</a> 123</p>"
    dropped = "<p><a href='/x'>read this</a> 123</p>"
    assert texts(kept) == ["read this 123"]
    assert texts(dropped) == []


def test_whitespace_normalized():
    assert texts("<p>a\n   b\t c   1</p>") == ["a b c 1"]


def test_reading_order_is_document_order():
    html = "<h1>One Two</h1><p>first paragraph with many interesting words inside it</p><p>second paragraph with many interesting words inside it</p>"
    t = texts(html)
    assert t[0] == "One Two"
    assert t[1].startswith("first")
    assert t[2].startswith("second")


def test_table_cells_coordinates():
    html = (
        "<table><tr><td>Cell A1 x1</td><td>Cell B1 x2</td></tr>"
        "<tr><td>Cell A2 x3</td><td>Cell B2 x4</td></tr></table>"
    )
    blocks = [b for b in segment(parse_html(html)) if b.words]
    coords = [(b.table_row, b.table_col) for b in blocks]
    assert coords == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_confidence_deterministic_and_bounded():
    b = extract_blocks("<p>one two three four five six seven eight nine</p>")[0]
    c1, c2 = b.confidence(), b.confidence()
    assert c1 == c2
    assert 1.0 <= c1 <= 99.0


def test_article_corpus_purity():
    """Corpus-level boilerplate check: extracted article text keeps the
    main paragraphs and never leaks nav/footer link text."""
    import random

    from webxtract import synth

    for doc_id in range(300):
        if synth._family(doc_id) != "article":
            continue
        d = synth.render_doc(doc_id)
        text = "\n".join(texts(d["html"].decode()))
        for nav_word in ("Privacy", "Sitemap", "Careers", "Login"):
            assert nav_word not in text, (doc_id, nav_word)
        assert len(text.split()) >= 60  # main paragraphs survive

"""DOM parser unit tests: nominal trees, tag soup, entities, skip tags."""

from webxtract.htmldom import Node, decode_bytes, parse_html


def _all_text(node):
    out = []
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        else:
            out.extend(_all_text(c))
    return out


def test_nominal_tree():
    root = parse_html("<html><body><div><p>hello <b>world</b></p></div></body></html>")
    html = root.children[0]
    assert html.tag == "html"
    assert " ".join("".join(_all_text(root)).split()) == "hello world"


def test_entities_decoded():
    root = parse_html("<p>a &amp; b &quot;c&quot;</p>")
    assert "".join(_all_text(root)) == 'a & b "c"'


def test_script_style_skipped():
    root = parse_html(
        "<body><script>var x = '<p>no</p>';</script><style>.a{}</style><p>yes</p></body>"
    )
    assert "".join(_all_text(root)).strip() == "yes"


def test_stray_close_ignored():
    root = parse_html("<div><p>a</p></span></div><p>b</p>")
    assert "ab" == "".join(_all_text(root))


def test_unclosed_tags_close_implicitly():
    root = parse_html("<div><div><p>deep")
    assert "".join(_all_text(root)) == "deep"


def test_close_pops_to_matching_open():
    # </div> must close the inner <p> too (pop-to-match repair)
    root = parse_html("<div><p>a</div><p>b</p>")
    div = root.children[0]
    assert div.tag == "div"
    # b lands outside the div
    texts_in_div = "".join(_all_text(div))
    assert texts_in_div == "a"


def test_void_elements_dont_nest():
    root = parse_html("<p>a<br>b<img src=x>c</p>")
    p = root.children[0]
    assert p.tag == "p"
    assert "".join(_all_text(p)) == "abc"


def test_duplicate_attrs_keep_first():
    root = parse_html('<div class="first" class="second">x</div>')
    assert root.children[0].attrs["class"] == "first"


def test_boiler_container_detection():
    assert parse_html("<nav>x</nav>").children[0].is_boiler_container()
    assert parse_html('<div class="sidebar">x</div>').children[0].is_boiler_container()
    assert parse_html('<div id="page-footer">x</div>').children[0].is_boiler_container()
    assert not parse_html('<div class="main">x</div>').children[0].is_boiler_container()


def test_decode_bytes():
    assert decode_bytes("héllo".encode()) == "héllo"
    assert decode_bytes(b"\xff\xfe\x80") is None


def test_declared_charset_cp1252():
    body = "<html><head><meta charset=\"windows-1252\"></head><body><p>Caf\xe9 cr\xe8me costs $3</p></body></html>"
    raw = body.encode("cp1252")
    decoded = decode_bytes(raw)
    assert decoded is not None
    assert "Café crème" in decoded


def test_undeclared_bad_bytes_still_rejected():
    assert decode_bytes(b"\xff\xfe\x80" * 40) is None


def test_declared_unknown_charset_rejected():
    raw = b'<meta charset="shift-jis">' + b"\xff\xfe\x80" * 30
    assert decode_bytes(raw) is None


# --- fast tokenizer differential gate --------------------------------------

def _tree_sig(node):
    """Canonical serialization of a DOM subtree for equality checks."""
    out = [node.tag, sorted(node.attrs.items())]
    for c in node.children:
        out.append(c if isinstance(c, str) else _tree_sig(c))
    return out


HOSTILE = [
    "",
    "plain text only, no tags at all & an amp",
    "<div>unterminated <b>bold",
    "<div attr='unterminated",
    "text <  not a tag > more",
    "<!-- unterminated comment with <div>inside</div>",
    "<!doctype html><p>after doctype</p>",
    "<?php echo 'pi'; ?><p>x</p>",
    "<![CDATA[ raw <b>stuff</b> ]]><p>y</p>",
    "<script>var a = '<div>not a tag</div>';</script><p>real</p>",
    "<script>never closed <p>swallowed</p>",
    "<style>p { color: red }</style><p>styled</p>",
    "<p>a &amp; b &lt;c&gt; &#65; &unknown; &#x41;</p>",
    "<p>dangling amp & here</p>",
    "<div class='a&amp;b' id=unquoted empty>attrs</div>",
    "<DIV CLASS='UP'>case</DIV>",
    "<br/><hr /><img src=x>voids</img>",
    "</>bogus</ stray></123>",
    "<p>text</p foo='bar'>tail</p>",
    "<a href='x'>link <span>nested <b>deep</b></span></a>",
    "<table><tr><td>c1<td>c2<tr><td>c3</table>",
    "<div>\x00null byte</div>",
    "<p>trailing <",
    "<p>trailing <!",
    "<p>trailing </",
    "< p>space before name</p>",
    "<p a=1 a=2>dup attr</p>",
    "<sCrIpT>mixed case raw</ScRiPt><p>after</p>",
    "<script>x</script extra='1'><p>odd close</p>",
]


def test_fast_feed_differential_hostile():
    from webxtract.htmldom import parse_html

    for doc in HOSTILE:
        fast = _tree_sig(parse_html(doc, fast=True))
        slow = _tree_sig(parse_html(doc, fast=False))
        assert fast == slow, f"divergence on: {doc!r}"


def test_fast_feed_differential_synth_corpus():
    """The gate that lets the fast tokenizer be the default: identical
    trees over EVERY decodable synthetic page (all families, including
    tag soup) at a corpus size large enough to hit each template."""
    from webxtract import synth
    from webxtract.htmldom import decode_bytes, parse_html

    pages = synth.make_pages(3000, seed=1234)
    checked = 0
    for raw in pages.column("html").to_pylist():
        text = decode_bytes(raw)
        if text is None:
            continue
        fast = _tree_sig(parse_html(text, fast=True))
        slow = _tree_sig(parse_html(text, fast=False))
        assert fast == slow
        checked += 1
    assert checked > 2500

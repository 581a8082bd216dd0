"""Full-document HTML->markdown linearization (webxtract/ops/web.py
render_markdown): rule coverage, nesting, tag-soup determinism, and
the explicit-stack no-recursion guarantee. The oracled fixture parity
lives in test_oracle_parity.py (html_markdown)."""

from webxtract.htmldom import parse_html
from webxtract.ops.web import render_markdown


def md(html: str) -> str:
    return render_markdown(parse_html(html))


def test_headings_paragraphs_and_inline_marks():
    out = md("<body><h1> Big  title </h1><h3>Sub</h3>"
             "<p>a <strong>b</strong> <em>c</em> <code>d e</code> "
             "<b>f</b><i>g</i></p></body>")
    assert out == ("# Big title\n\n### Sub\n\n"
                   "a **b** *c* `d e` **f***g*")


def test_links_and_images():
    out = md('<p>see <a href="https://x.example/p">the  page</a> and '
             '<img src="/i.png" alt="pic one"></p>')
    assert out == "see [the page](https://x.example/p) and ![pic one](/i.png)"
    # missing href/src/alt degrade to empty strings, never None
    # (no whitespace in the source -> none in the output)
    assert md("<p><a>t</a><img></p>") == "[t]()![]()"


def test_lists_nested_and_ordered():
    out = md("<ul><li>a</li><li>b<ul><li>b1</li><li>b2</li></ul></li>"
             "<li>c</li></ul><ol><li>x</li><li>y</li></ol>")
    assert out == ("- a\n- b\n  - b1\n  - b2\n- c"
                   "\n\n1. x\n2. y")


def test_blockquote_nesting_prefixes_every_line():
    out = md("<blockquote><p>outer</p><blockquote><p>inner</p>"
             "</blockquote></blockquote>")
    assert out == "> outer\n\n> > inner"


def test_pre_fence_keeps_raw_whitespace():
    out = md("<pre>line  1\n  line 2</pre>")
    assert out == "```\nline  1\n  line 2\n```"


def test_hr_loose_text_and_script_skipped():
    out = md("<body>loose   text<hr><script>var x=1;</script>"
             "<style>p{}</style><form><input name=q>"
             "<button>go</button></form></body>")
    assert out == "loose text\n\n---"


def test_table_grid_with_colspan():
    out = md("<table><tr><th>a</th><th>b</th></tr>"
             "<tr><td colspan=2>wide</td></tr></table>")
    assert out == "| a | b |\n| --- | --- |\n| wide |"


def test_tag_soup_unclosed_still_deterministic():
    out = md("<div><p>one<p>two<ul><li>x<li>y")
    assert out == "one\n\ntwo\n\n- x\n- y"


def test_head_only_and_empty_inputs():
    assert md("") == ""
    assert md("<head><title>t</title></head>") == ""


def test_deep_nesting_no_recursion_error():
    assert md("<div>" * 5000 + "<p>deep</p>") == "deep"
    chain = "<ul><li>n" * 1200
    out = md(chain)
    assert out.count("\n") == 1199 and out.endswith("- n")


def test_inline_tags_at_block_level_form_a_block():
    out = md("<body><strong>alone</strong><p>p</p></body>")
    assert out == "**alone**\n\np"

"""Extraction spec tests (reference M1/M2/M3; byte-identity invariant)."""

from search_engine_ray.corpus import synth_pages_table, tiny_fixture_pages
from search_engine_ray.functions.html import (
    extract_all,
    extract_links,
    extract_text,
    extract_title,
    extract_whole_text,
)


def test_basic_normalization():
    html = "<html><body><p>a   b</p><p>c\nd</p></body></html>"
    assert extract_text(html) == "a b c d"


def test_entities_and_nbsp():
    html = "<p>x&nbsp;y &amp; z</p>"
    # &nbsp; decodes to U+00A0 and is NOT collapsible whitespace
    assert extract_text(html) == "x\xa0y & z"


def test_script_style_dropped():
    html = "<head><style>p{}</style><script>var a=1;</script></head><body>ok</body>"
    assert extract_text(html) == "ok"


def test_title_included_in_text():
    html = "<html><head><title>T1</title></head><body>b</body></html>"
    assert extract_text(html) == "T1 b"
    assert extract_title(html) == "T1"


def test_inline_tags_no_separator():
    assert extract_text("<p>bo<b>ld</b>ed</p>") == "bolded"


def test_block_tags_separate():
    assert extract_text("<div>a</div><div>b</div>") == "a b"
    assert extract_text("x<br>y") == "x y"


def test_whole_text_preserves_source_whitespace():
    html = "<p>line one</p>\n<p>line  two</p>"
    assert extract_whole_text(html) == "line one\nline  two"


def test_empty_and_malformed():
    assert extract_text("") == ""
    assert extract_text("<p>unclosed") == "unclosed"
    text, whole, title = extract_all("<title>t</title><p>a</p>")
    assert (text, title) == ("t a", "t")
    assert "t" in whole


def test_links_filter():
    html = ('<a href="/a#f">1</a><a href="/b">2</a><a href="https://me.x/c">3</a>'
            '<a href="https://other.x/d">4</a><a href="/b">dup</a>')
    assert extract_links(html, "https://me.x") == ["/b", "https://me.x/c"]


def test_fixture_byte_identity():
    """The input_hint invariant: extracted text == the golden text column."""
    t = tiny_fixture_pages()
    for url, html, expected in zip(t["url"].to_pylist(), t["html"].to_pylist(),
                                   t["text"].to_pylist()):
        assert extract_text(html.decode()) == expected, url


def test_synth_byte_identity():
    t = synth_pages_table(200, seed=7)
    for html, expected in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(html.decode()) == expected


def test_fast_scanner_agrees_with_reference_parser():
    """The fast scanner and the HTMLParser reference are two independent
    witnesses of the frozen extraction spec — they must agree byte-for-byte
    on every fixture and on adversarial markup."""
    from search_engine_ray.corpus import synth_pages_table, tiny_fixture_pages
    from search_engine_ray.functions.html import extract_all, extract_all_ref

    cases = [h.decode() for h in tiny_fixture_pages()["html"].to_pylist()]
    cases += [h.decode() for h in synth_pages_table(100, seed=9)["html"].to_pylist()]
    cases += [
        "<p>a<!-- <div>x</div> -->b</p>",
        '<script>var x = "<p>no</p>";</script><p>yes</p>',
        '<a href="x>y">link</a>text',
        "<p title='a>b'>t</p>",
        "<P>UPPER</P><BR/>z",
        "plain &amp; text &nbsp;here &#65;",
        '<style>p {content: "</notstyle>"}</style>after',
        "<title>T &amp; T</title><body>b</body>",
        "broken < notatag >ok</p>",
        "<script>unterminated",
        "<noscript><p>ns</p></noscript>tail",
        "a<noscript><p>x</p></noscript>b",
        "<SCRIPT>x</SCRIPT>y",
        '<script src="a.js"/>inline?',
        "<style>a</style><style>b</style>mid",
        "<title>one</title><title>two</title>",
        "<br>line<br/>another",
        "<td>a</td><td>b</td>",
        "",
        "   \n\t  ",
        "&nbsp;&nbsp;x",
        # strict CDATA end-tag rule (html.parser): near-miss closes stay raw
        "a<script>b</scripts>c</script>d",
        "a<script>b</script x=1>c</script>d",
        "a<script>b</script >c",
        "a<script>b</ script>c",
        "a<style>b</styleX>c</style>d",
        # skip elements do not un-skip on a DIFFERENT element's close
        "<noscript>a<script>b</script>c</noscript>d",
        "<noscript>a</style>b</noscript>c",
        "<template>x<style>y</style>z</template>w",
        # tolerant tag-name / leading-whitespace end-tag forms
        "x</ p>y",
        "x<p-x>y</p-x>z",
        "x</ div >y",
        "</ p q>bogus swallowed>tail",
        # end-tag tolerant fallback is quote-UNAWARE (html.parser consumes
        # to the FIRST '>' after the name), unlike quote-aware start tags
        "</b<a href='q>r'>",
        '</b attr=">">x',
        "a</b foo>c",
        "<a href='q>r'>x",
        '<p title="a>b">t</p></p junk="c>d">tail',
    ]
    for h in cases:
        assert extract_all(h) == extract_all_ref(h), h[:80]


def test_raw_text_strict_close_semantics():
    """The frozen-spec rule itself (not just witness agreement): near-miss
    closes keep the element raw, nested skip subtrees drop whole."""
    from search_engine_ray.functions.html import extract_text

    assert extract_text("a<script>b</scripts>c</script>d") == "ad"
    assert extract_text("a<script>b</script x=1>c</script>d") == "ad"
    assert extract_text("a<script>b</ script >c") == "ac"
    assert extract_text("<noscript>a<script>b</script>c</noscript>d") == "d"

"""HTML stripping contract tests (reference remove_html_tags.py:146-168)."""

from language_identification_ray.functions.html import (
    extract_text,
    get_comments,
    remove_html_tags,
)


def test_strip_simple_tags():
    assert remove_html_tags("<p>hello <b>world</b></p>").split() == ["hello", "world"]


def test_strip_attrs_and_selfclose():
    out = remove_html_tags('<a href="http://x.com" class="y">link</a><br/><img src="z.png"/>')
    assert out.split() == ["link"]


def test_unknown_tag_survives():
    # the reference only strips KNOWN tags, so a<b>c math-ish text keeps <notatag>
    assert "<notatag>" in remove_html_tags("keep <notatag> this")


def test_comments_removed_first():
    # a comment containing half a script must not leave tag debris
    out = remove_html_tags("a <!-- <script>x --> b")
    assert out.split() == ["a", "b"]


def test_script_block_removed_entirely():
    out = remove_html_tags("before <script>var x = '<p>';</script> after")
    assert out.split() == ["before", "after"]


def test_case_insensitive():
    assert remove_html_tags("<DIV>x</DiV>").split() == ["x"]


def test_get_comments():
    assert get_comments("a <!-- one --> b") == [" one "]
    assert get_comments("no comments") == []


def test_extract_text_entities():
    assert extract_text("<p>fish &amp; chips</p>").split() == ["fish", "&", "chips"]


def test_full_page():
    page = (
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>body{color:red}</style></head>"
        "<body><h1>Header</h1><p>Body text here.</p>"
        "<script>alert(1)</script></body></html>"
    )
    words = extract_text(page).split()
    assert words == ["T", "Header", "Body", "text", "here."]


def test_multiline_style_block_is_stripped():
    """RE_STYLE is an engine extension (no parity constraint): multi-line
    CSS bodies must not leak into the text that feeds language ID."""
    from language_identification_ray.functions.html import extract_text

    page = "before<style>\nbody { color: red }\nh1 { font: x }\n</style>after"
    out = extract_text(page)
    assert "color" not in out and "body" not in out
    assert "before" in out and "after" in out


def test_minified_html_multiple_comments_keep_body():
    """Greedy comment matching deleted everything between the FIRST <!-- and
    the LAST --> on a line — the whole body of minified HTML."""
    out = extract_text(
        "<html><!-- nav --><body><p>Bonjour le monde.</p><!-- footer --></body></html>"
    )
    assert "Bonjour le monde." in out


def test_multiline_script_body_removed():
    """Without DOTALL a multi-line <script> body leaked its JS into the
    text that feeds language ID."""
    out = extract_text(
        "<html><body><script>\nvar x = 1;\nfunction f() { return 'y'; }\n"
        "</script><p>Hola mundo</p></body></html>"
    )
    assert "Hola mundo" in out
    assert "var x" not in out and "function" not in out

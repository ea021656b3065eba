"""HTML stripping / text extraction.

Same contract as the reference stripper (reference ``remove_html_tags.py:146-168``):
  1. remove comments first (they can contain half a ``<script>``),
  2. remove whole ``<script>...</script>`` blocks,
  3. remove every known HTML tag (one compiled alternation; unknown "tags"
     like ``<notatag>`` survive so math such as ``a<b>c`` isn't eaten),
with ``replacement=' '``.  The comment/script patterns intentionally do NOT
use DOTALL and are greedy, matching the reference's regex semantics exactly.

The tag name list is the standard HTML element inventory (public; WHATWG/MDN)
— written out plainly here and compiled into one alternation at import.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import List

# Standard + deprecated HTML element names (public inventory).
HTML_TAG_NAMES = sorted(
    """!doctype a abbr address area article aside audio b base bdi bdo blockquote
    body br button canvas caption cite code col colgroup data datalist dd del
    details dfn dialog div dl dt em embed fieldset figcaption figure footer form
    h1 h2 h3 h4 h5 h6 head header hgroup hr html i iframe img input ins kbd
    keygen label legend li link main map mark menu menuitem meta meter nav
    noscript object ol optgroup option output p param picture pre progress q rb
    rp rt rtc ruby s samp script section select slot small source span strong
    style sub summary sup table tbody td template textarea tfoot th thead time
    title tr track u ul var video wbr
    acronym applet basefont big blink center dir font frame frameset isindex
    noframes marquee plaintext strike tt""".split(),
    key=len,
    reverse=True,  # longest-first so the regex engine rarely backtracks
)

_TAG_ALT = "|".join(re.escape(t) for t in HTML_TAG_NAMES)

# DELIBERATE deviation from the reference's greedy, no-DOTALL forms
# (remove_html_tags.py:155-156), same rationale as RE_STYLE below: on
# minified (single-line) HTML the greedy comment regex deleted ALL visible
# text between the first `<!--` and the last `-->`, and without DOTALL a
# multi-line <script> body leaked its JS into the text that feeds language
# ID.  Non-greedy + DOTALL strips each block exactly.
RE_COMMENT = re.compile(r"(?:<!--(?P<comment>.*?)-->)", flags=re.I | re.U | re.S)
RE_SCRIPT = re.compile(r"(?:<script(?:\s+[^<>]*)?>.*?</script\s*>)", flags=re.I | re.U | re.S)
# engine extension: non-greedy + DOTALL so a MULTI-LINE style block is
# stripped — greedy no-DOTALL left the CSS body in the langid text
RE_STYLE = re.compile(r"(?:<style(?:\s+[^<>]*)?>.*?</style\s*>)", flags=re.I | re.U | re.S)
RE_TAG = re.compile(rf"(?:</?(?:{_TAG_ALT})(?:\s+[^<>]*)?/?>)", flags=re.I | re.U)


def remove_html_tags(text: str, replacement: str = " ") -> str:
    text = RE_COMMENT.sub(replacement, text)
    text = RE_SCRIPT.sub(replacement, text)
    text = RE_STYLE.sub(replacement, text)  # engine extension: styles are boilerplate too
    text = RE_TAG.sub(replacement, text)
    return text


def get_comments(text: str) -> List[str]:
    """Reference ``remove_html_tags.py:167-168``."""
    return [m.group("comment") for m in RE_COMMENT.finditer(text)]


def extract_text(markup: str, unescape: bool = True) -> str:
    """markup → visible-ish text: strip tags, then resolve character entities
    (``&amp;`` → ``&``).  Entity resolution is an engine extension beyond the
    reference (which leaves entities in place)."""
    text = remove_html_tags(markup)
    if unescape and "&" in text:
        text = _htmllib.unescape(text)
    return text

"""HTML -> text extraction with frozen, documented whitespace semantics.

Reference behaviours being re-expressed (see SURVEY.md §2.2):

- M1 ``htmlToText``: ``Jsoup.parse(html).text()`` (``services/LemmasFinder.java:48-50``)
  — drop tags and script/style data, decode entities, collapse whitespace
  runs to single spaces, separate block elements by a space, strip ends.
- M2 whole text: ``document.wholeText()`` (``services/SearchServiceImpl.java:219-222``)
  — all text nodes concatenated with their ORIGINAL whitespace (line breaks
  come from the source document, nothing is inserted), used for snippet
  line boundaries.
- M3 ``document.title()`` (``SearchServiceImpl.java:219-221``).

The exact frozen spec of ``extract_text`` (the per-row byte-identity
invariant of BASELINE.json ``input_hint``):

1. Parse HTML leniently; character/entity references are decoded
   (``&nbsp;`` -> U+00A0, which is NOT collapsible whitespace — the
   reference's snippet splitter treats it specially, ``LemmasFinder.java:108``).
2. Text inside ``script``, ``style``, ``template`` and ``noscript`` elements
   is dropped.  All four are RAW-TEXT: after the open tag everything is
   data until the first end tag of the *same* element in html.parser's
   strict CDATA form — ``</`` + optional whitespace + the element name +
   optional whitespace + ``>`` (so ``</scripts>`` and ``</script x=1>``
   stay raw, ``</ script >`` closes); unclosed drops to end of input; no
   nesting (first matching close wins).
3. Every open or close tag of a *block-level* element (and ``<br>``)
   contributes a whitespace separator.
4. The concatenation is normalized: runs of ASCII whitespace
   (space, tab, CR, LF, FF, VT) collapse to one space; U+00A0 survives;
   leading/trailing ASCII whitespace is stripped.
5. ``<title>`` text participates (it is a text node of the document, as in
   Jsoup's ``Document.text()``).

All three extractors are pure functions; the Ray stage wrapping them lives in
``search_engine_ray.stages.extract``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_ELEMENTS = frozenset({"script", "style", "template", "noscript"})

_BLOCK_ELEMENTS = frozenset(
    {
        "html", "head", "body", "title", "meta", "link",
        "p", "div", "section", "article", "header", "footer", "nav", "aside",
        "main", "figure", "figcaption", "blockquote", "pre", "address",
        "h1", "h2", "h3", "h4", "h5", "h6", "hr", "br",
        "ul", "ol", "li", "dl", "dt", "dd",
        "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
        "form", "fieldset", "legend", "option", "select", "textarea",
    }
)

# ASCII whitespace only: U+00A0 must survive (Java's Character.isWhitespace
# and Jsoup's normalizer both exclude it; cf. LemmasFinder.java:108).
_WS_RUN = re.compile(r"[ \t\r\n\f\x0b]+")
_ASCII_WS = " \t\r\n\f\x0b"


class _Extractor(HTMLParser):
    """One-pass extractor producing normalized text, whole text and title.

    All four skip elements are declared CDATA so html.parser applies its
    strict raw-text end-tag rule (``</\\s*elem\\s*>``, nothing else before
    ``>``) uniformly — the frozen-spec rule the fast scanner mirrors.  In
    CDATA mode html.parser only fires ``handle_endtag`` for the matching
    element, so near-misses (``</scripts>``, ``</script x=1>``) arrive as
    data and stay dropped."""

    CDATA_CONTENT_ELEMENTS = ("script", "style", "template", "noscript")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_elem: str | None = None
        self._in_title = False
        self.parts: list[str] = []  # for normalized text (block-separated)
        self.raw_parts: list[str] = []  # for whole text (original whitespace)
        self.title_parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if self._skip_elem is not None:
            return
        if tag in _SKIP_ELEMENTS:
            self._skip_elem = tag
            return
        if tag in _BLOCK_ELEMENTS:
            self.parts.append(" ")
        if tag == "title":
            self._in_title = True

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if self._skip_elem is not None or tag in _SKIP_ELEMENTS:
            return
        if tag in _BLOCK_ELEMENTS:
            self.parts.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if self._skip_elem is not None:
            if tag == self._skip_elem:
                self._skip_elem = None
            return
        if tag in _SKIP_ELEMENTS:
            return
        if tag in _BLOCK_ELEMENTS:
            self.parts.append(" ")
        if tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        if self._skip_elem is not None:
            return
        self.parts.append(data)
        self.raw_parts.append(data)
        if self._in_title:
            self.title_parts.append(data)


def _parse(html: str) -> _Extractor:
    p = _Extractor()
    p.feed(html)
    p.close()
    return p


# --- fast scanner (hot path) ----------------------------------------------
# Single regex pass over the document; ~2x the HTMLParser path at identical
# output.  The HTMLParser extractor above stays as the REFERENCE
# implementation — tests cross-validate the two on every fixture and on
# adversarial markup (tests/test_html.py), so the frozen byte-identity spec
# has two independent witnesses.

_TAG_RE = re.compile(
    # tag names follow html.parser's tagfind_tolerant ([a-zA-Z][^\t\n\r\f />]*)
    # so <p-x> is the (non-block) element "p-x" in both witnesses
    r"<(/?)([a-zA-Z][^\t\n\r\f />]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>"
    # html.parser's endtagfind also accepts whitespace before the name, but
    # only the strict all-whitespace form (`</ p >`); `</ p x>` is bogus
    r"|</\s+([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    r"|<!--.*?-->|<!\[CDATA\[.*?\]\]>|<![^>]*>|<\?[^>]*>"
    # HTML5 "bogus comment": </ followed by a non-letter swallows up to >
    # (html.parser's parse_bogus_comment does the same)
    r"|</(?:[^a-zA-Z>][^>]*)?>",
    re.S,
)
_AMP = re.compile("&")
# strict CDATA end-tag form (html.parser's endtagfind restricted to the same
# element): nothing but whitespace between the name and ``>`` — ``</scripts>``
# and ``</script x=1>`` stay raw text
_RAW_CLOSE = {t: re.compile(rf"</\s*{t}\s*>", re.I) for t in _SKIP_ELEMENTS}

import html as _html_mod


class _Scanned:
    __slots__ = ("parts", "raw_parts", "title_parts")

    def __init__(self, parts, raw_parts, title_parts):
        self.parts = parts
        self.raw_parts = raw_parts
        self.title_parts = title_parts


def _scan(html: str) -> _Scanned:
    parts: list[str] = []
    raw_parts: list[str] = []
    title_parts: list[str] = []
    in_title = False
    pos = 0
    n = len(html)
    unescape = _html_mod.unescape
    for m in _TAG_RE.finditer(html):
        start = m.start()
        if start < pos:
            continue  # inside a raw-text element already skipped past
        if start > pos:
            data = html[pos:start]
            if _AMP.search(data):
                data = unescape(data)
            parts.append(data)
            raw_parts.append(data)
            if in_title:
                title_parts.append(data)
        pos = m.end()
        tag = m.group(2)
        if tag is None:
            tag = m.group(5)  # `</ name >` leading-whitespace end tag
            if tag is None:
                continue  # comment / doctype / CDATA / processing instruction
            closing, self_closing = True, False
        else:
            closing = m.group(1) == "/"
            self_closing = m.group(4) == "/"
        tag = tag.lower()
        if not closing and not self_closing and tag in _SKIP_ELEMENTS:
            cm = _RAW_CLOSE[tag].search(html, pos)
            if tag in _BLOCK_ELEMENTS:
                parts.append(" ")
            if cm:
                pos = cm.end()
                if tag in _BLOCK_ELEMENTS:
                    parts.append(" ")
            else:
                pos = n
            continue
        if tag in _BLOCK_ELEMENTS:
            parts.append(" ")
        if tag == "title" and not self_closing:
            in_title = not closing
    if pos < n:
        data = html[pos:]
        if _AMP.search(data):
            data = unescape(data)
        parts.append(data)
        raw_parts.append(data)
        if in_title:
            title_parts.append(data)
    return _Scanned(parts, raw_parts, title_parts)


def extract_text(html: str) -> str:
    """Normalized visible text (frozen spec above; reference M1)."""
    p = _scan(html)
    return _WS_RUN.sub(" ", "".join(p.parts)).strip(_ASCII_WS)


def extract_whole_text(html: str) -> str:
    """Text nodes with original whitespace (reference M2: ``wholeText()``).

    Line structure comes solely from the source document's own newlines —
    nothing is inserted at element boundaries.
    """
    p = _scan(html)
    return "".join(p.raw_parts)


def extract_title(html: str) -> str:
    """``<title>`` content, whitespace-normalized (reference M3)."""
    p = _scan(html)
    return _WS_RUN.sub(" ", "".join(p.title_parts)).strip(_ASCII_WS)


def extract_all(html: str) -> tuple[str, str, str]:
    """(text, whole_text, title) in a single scan — the hot-path variant
    used by the extract stage so each document is parsed once, not thrice."""
    p = _scan(html)
    text = _WS_RUN.sub(" ", "".join(p.parts)).strip(_ASCII_WS)
    title = _WS_RUN.sub(" ", "".join(p.title_parts)).strip(_ASCII_WS)
    return text, "".join(p.raw_parts), title


def extract_all_ref(html: str) -> tuple[str, str, str]:
    """Reference (HTMLParser) implementation of :func:`extract_all`; kept as
    the second independent witness of the frozen spec — tests assert it
    agrees with the fast scanner on every fixture and adversarial input."""
    p = _parse(html)
    text = _WS_RUN.sub(" ", "".join(p.parts)).strip(_ASCII_WS)
    title = _WS_RUN.sub(" ", "".join(p.title_parts)).strip(_ASCII_WS)
    return text, "".join(p.raw_parts), title


_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.I)


def extract_links(html: str, site_url: str) -> list[str]:
    """Same-site absolute or root-relative hrefs without fragments, distinct,
    in first-seen order.

    Re-expresses the reference link filter CSS ``a[href~=(?i)^((<site>)|/)[^#]*$]``
    (``dto/indexing/PageAnalyzer.java:437-447``).  Kept as a crawl-graph
    byproduct for parity; the batch engine does not follow links.
    """
    out: list[str] = []
    seen: set[str] = set()
    low_site = site_url.lower()
    for m in _HREF_RE.finditer(html):
        href = m.group(1) if m.group(1) is not None else m.group(2)
        if "#" in href:
            continue
        if not (href.startswith("/") or href.lower().startswith(low_site)):
            continue
        if href not in seen:
            seen.add(href)
            out.append(href)
    return out

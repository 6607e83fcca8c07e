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

# The scanner mirrors html.parser's tolerant tokenizer STEP BY STEP, using
# the stdlib's own compiled sub-regexes as the single source of truth for
# the fiddly parts (quote-aware start-tag scan, strict-then-tolerant end
# tags, `--  >` comment closes).  html.parser IS the reference witness, so
# fidelity here is what keeps the two-witness byte-identity invariant.
from html.parser import (  # noqa: E402  (CPython html/parser.py:27-58)
    attrfind_tolerant as _ATTRFIND,
    commentclose as _COMMENT_CLOSE,
    endtagfind as _ENDTAG_STRICT,
    locatestarttagend_tolerant as _LOCATE_START,
    tagfind_tolerant as _TAGFIND,
)

# check_for_whole_start_tag: a next-char in this set means "end of input in
# or before attribute value" -> incomplete tag (html/parser.py:403-407)
_INCOMPLETE_NEXT = frozenset("abcdefghijklmnopqrstuvwxyz"
                             "ABCDEFGHIJKLMNOPQRSTUVWXYZ=/")
_ASCII_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyz"
                         "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
# _markupbase marked-section closes: CDATA-family sections end at `] ] >`,
# MS conditionals at `] >`; unknown keywords make html.parser raise, so the
# fast path falls back to the bogus-comment rule there (untestable branch)
_MS_CLOSE = re.compile(r"]\s*]\s*>")
_MSIE_CLOSE = re.compile(r"]\s*>")
_MS_KEYWORD = re.compile(r"<!\[\s*([a-zA-Z][-_.a-zA-Z0-9]*)")

# Fast paths for WELL-FORMED tags — strict subsets of the tolerant grammar
# above, verified to consume the identical span and produce the identical
# events, so the faithful (multi-regex) logic only runs on odd markup.
# Start: simple name, whitespace-separated attrs with quoted (quote-aware,
# '>' allowed inside quotes, same as locatestarttagend_tolerant) or plain
# bare values, optional '/>'.
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9-]*)"
    r"(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[-a-zA-Z0-9_./:;%#?+&~,]*))?)*"
    r"\s*(/?)>")
# End: subset of endtagfind (no leading whitespace variant needed here)
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9-]*)\s*>")
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
    find = html.find
    startswith = html.startswith

    def emit(data: str) -> None:
        if _AMP.search(data):
            data = unescape(data)
        parts.append(data)
        raw_parts.append(data)
        if in_title:
            title_parts.append(data)

    def eof_chunk(i: int) -> int:
        # goahead's k<0 + end-of-feed fallback (html/parser.py:198-209):
        # emit through the next '>', else to the next '<', else one char
        k = find(">", i + 1)
        if k < 0:
            k = find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        emit(html[i:k])
        return k

    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            emit(html[pos:])
            break
        if lt > pos:
            emit(html[pos:lt])
        pos = lt
        nxt = html[lt + 1: lt + 2]
        tag = None
        closing = self_closing = False
        if nxt in _ASCII_ALPHA:
            # --- start tag: parse_starttag + check_for_whole_start_tag ---
            fm = _SIMPLE_START.match(html, lt)
            if fm:  # well-formed fast path (identical events by subset)
                tag = fm.group(1).lower()
                self_closing = fm.group(2) == "/"
                pos = fm.end()
            else:
                j = _LOCATE_START.match(html, lt).end()
                ch = html[j: j + 1]
                if ch == ">":
                    endpos = j + 1
                elif ch == "/":
                    if startswith("/>", j):
                        endpos = j + 2
                    elif j + 1 < n:  # '/' + junk: bogus, tag ends unclosed
                        endpos = j if j > lt else lt + 1
                    else:
                        endpos = -1  # lone '/' at end of input
                elif ch == "" or ch in _INCOMPLETE_NEXT:
                    endpos = -1  # end of input in or before attribute value
                else:
                    endpos = j if j > lt else lt + 1
                if endpos < 0:
                    pos = eof_chunk(lt)
                    continue
                m = _TAGFIND.match(html, lt + 1)
                k = m.end()
                while k < endpos:  # attr sweep: find where attrs stop
                    am = _ATTRFIND.match(html, k)
                    if not am:
                        break
                    k = am.end()
                end_marker = html[k:endpos].strip()
                if end_marker not in (">", "/>"):
                    emit(html[lt:endpos])  # malformed region becomes data
                    pos = endpos
                    continue
                tag = m.group(1).lower()
                self_closing = end_marker == "/>"
                pos = endpos
        elif nxt == "/":
            # --- end tag: parse_endtag -------------------------------
            fm = _SIMPLE_END.match(html, lt)
            if fm:  # well-formed fast path (subset of endtagfind)
                tag = fm.group(1).lower()
                closing = True
                pos = fm.end()
            elif find(">", lt + 1) < 0:
                pos = eof_chunk(lt)
                continue
            else:
                sm = _ENDTAG_STRICT.match(html, lt)
                if sm:
                    tag = sm.group(1).lower()
                    closing = True
                    pos = sm.end()
                else:
                    nm = _TAGFIND.match(html, lt + 2)
                    if nm:
                        # tolerant: name at i+2, then consume to the FIRST
                        # '>' after it — deliberately NOT quote-aware,
                        # unlike start tags (</b attr=">"> closes at the
                        # quoted '>')
                        tag = nm.group(1).lower()
                        closing = True
                        pos = find(">", nm.end()) + 1
                    elif startswith("</>", lt):
                        pos = lt + 3  # html5 end-tag-open special case
                        continue
                    else:  # bogus comment: swallow through the next '>'
                        b = find(">", lt + 2)
                        pos = b + 1 if b >= 0 else eof_chunk(lt)
                        continue
        elif startswith("<!--", lt):
            cm = _COMMENT_CLOSE.search(html, lt + 4)  # '--  >' also closes
            pos = cm.end() if cm else eof_chunk(lt)
            continue
        elif nxt == "?":
            g = find(">", lt + 2)
            pos = g + 1 if g >= 0 else eof_chunk(lt)
            continue
        elif nxt == "!":
            if startswith("<![", lt):
                km = _MS_KEYWORD.match(html, lt)
                kw = km.group(1).lower() if km else ""
                if kw in ("cdata", "temp", "ignore", "include", "rcdata"):
                    mm = _MS_CLOSE.search(html, lt + 3)
                elif kw in ("if", "else", "endif"):
                    mm = _MSIE_CLOSE.search(html, lt + 3)
                else:
                    mm = None  # html.parser raises here; treat as bogus
                if mm:
                    pos = mm.end()
                else:
                    g = find(">", lt + 2)
                    pos = g + 1 if g >= 0 else eof_chunk(lt)
                continue
            g = find(">", lt + 2)  # doctype / bogus comment
            pos = g + 1 if g >= 0 else eof_chunk(lt)
            continue
        else:
            emit("<")
            pos = lt + 1
            continue
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


def scan_parts(html: str) -> tuple[str, str, str]:
    """(unnormalized text, whole_text, unnormalized title) in a single scan.

    Batch-path variant of :func:`extract_all`: the whitespace-run collapse
    and strip are left to the CALLER so a batch stage can apply them as one
    vectorized Arrow kernel over the whole column instead of two Python
    ``re.sub`` calls per document (``extract.extract_batch``).
    ``extract_all(h) == normalize(scan_parts(h))`` by construction.
    """
    p = _scan(html)
    return "".join(p.parts), "".join(p.raw_parts), "".join(p.title_parts)


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

"""Search-result snippet builder — reference M10 semantics, case by case.

Re-expresses ``LemmasFinder.getSnippet`` + helpers
(``services/LemmasFinder.java:72-252``) exactly, the hairiest exact-match
surface of the reference (SURVEY.md §7.4):

- input is the document's *whole text* (original line breaks,
  ``SearchServiceImpl.java:219-223``); lines split on ``[\\r\\n]+``;
- per line, words split on ``[\\u00a0\\s]+`` (U+00A0 splits HERE but not in
  the indexer's tokenizer — reference asymmetry, ``:108`` vs ``:261``);
- significant words (cleaned + morphology-accepted) drive the context
  window: ``words_range`` significant words kept left/right of each match
  (``config/SearchSettings.java:13``, default 2);
- matched words are wrapped ``<b>…</b>``, adjacent matches merge by deleting
  the previous closing tag (``:161-167``);
- ``...`` ellipses at fragment boundaries (``:194-198``, ``:238-241``,
  ``:246-252``);
- once the snippet exceeds 270 chars, the remainder is wrapped in
  ``<details>`` (``:177-183``), closed at the end (``:91-93``).

Java ``String.split`` drops trailing empty strings — reproduced; Java
``strip()``/``isBlank()`` treat U+00A0 as NON-whitespace — reproduced by
stripping ASCII whitespace only.
"""

from __future__ import annotations

import re

from .morphology import Morphology
from .tokenize import SNIPPET_SPLIT_RE, clean_token_cased

_LINE_RE = re.compile(r"[\r\n]+")
_ASCII_WS = " \t\r\n\f\x0b"

SPOILER_THRESHOLD = 270  # LemmasFinder.java:178


def _java_split(pattern: re.Pattern, s: str) -> list[str]:
    parts = pattern.split(s)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def get_snippet(text: str, lemmas: set[str], morph: Morphology,
                words_range: int = 2) -> str:
    if not text.strip(_ASCII_WS):
        return ""

    sn: list[str] = []  # char list: supports the </b>-deletion splice
    spoiler_added = False

    for line in _java_split(_LINE_RE, text):
        if not line.strip(_ASCII_WS):
            continue
        spoiler_added = _add_line(line.strip(_ASCII_WS), lemmas, sn,
                                  spoiler_added, morph, words_range)

    if spoiler_added:
        sn.append("</details>")
    return "".join(sn).strip(_ASCII_WS)


def _add_line(line: str, lemmas: set[str], sn: list[str], spoiler_added: bool,
              morph: Morphology, words_range: int) -> bool:
    words = _java_split(SNIPPET_SPLIT_RE, line)
    words_indexes: list[int] = []  # indexes (into words) of significant words
    last_lemma_index = -1  # index into words_indexes of the last lemma word
    last_word_index = -1   # index into words of the last appended word

    for i, word in enumerate(words):
        search_word = clean_token_cased(word)
        if not search_word.strip(_ASCII_WS):
            continue
        normal = morph.normal_word(search_word.lower())
        if not normal:  # not a "fitting" word (unknown language or stop-POS)
            continue

        word_index = len(words_indexes)
        words_indexes.append(i)

        if normal not in lemmas:
            last_word_index = _right_boundary(sn, last_lemma_index, words_indexes,
                                              last_word_index, i, words, words_range)
            continue

        spoiler_added = _check_spoiler(sn, spoiler_added)
        check_tag_b = _left_boundary(sn, last_lemma_index, i, last_word_index,
                                     words_indexes, words, words_range)
        _add_lemma_word(sn, last_lemma_index, i, words_indexes, words,
                        search_word, check_tag_b)
        last_word_index = i
        last_lemma_index = word_index

    _snippet_end(sn, last_word_index, words)
    return spoiler_added


def _sn_len(sn: list[str]) -> int:
    return sum(len(p) for p in sn)


def _add_lemma_word(sn: list[str], last_lemma_index: int, current_index: int,
                    words_indexes: list[int], words: list[str],
                    search_word: str, check_tag_b: bool) -> None:
    snippet_length = _sn_len(sn)
    check_tag_b = check_tag_b and (snippet_length >= 7 and last_lemma_index >= 0)

    sn.append(" ")

    word = words[current_index]
    end_prefix = word.find(search_word)
    if end_prefix > 0:
        sn.append(word[:end_prefix])
        check_tag_b = False

    if check_tag_b and words_indexes[last_lemma_index] == current_index - 1:
        # continuation of a <b> block: delete the prior closing tag (the 4
        # chars just before the captured length), keep the space after it
        _splice_delete(sn, snippet_length - 4, snippet_length)
    else:
        sn.append("<b>")

    sn.append(search_word)
    sn.append("</b>")

    start_postfix = end_prefix + len(search_word)
    if start_postfix < len(word):
        sn.append(word[start_postfix:])


def _splice_delete(sn: list[str], start: int, end: int) -> None:
    s = "".join(sn)
    sn.clear()
    sn.append(s[:start] + s[end:])


def _check_spoiler(sn: list[str], spoiler_added: bool) -> bool:
    if _sn_len(sn) > SPOILER_THRESHOLD and not spoiler_added:
        sn.append("<details>")
        spoiler_added = True
    return spoiler_added


def _left_boundary(sn: list[str], last_lemma_index: int, current_index: int,
                   last_word_index: int, words_indexes: list[int],
                   words: list[str], words_range: int) -> bool:
    check_tag_b = True
    if current_index < 1:
        return check_tag_b

    s = "".join(sn)
    if last_lemma_index == -1 and not (len(s) >= 3 and s.endswith("...")):
        sn.append("...")

    if last_word_index < current_index - 1:
        check_tag_b = False
        word_index = len(words_indexes) - 1
        previous_index = words_indexes[max(word_index - words_range, 0)]
        if last_word_index >= 0:
            previous_index = max(last_word_index + 1, previous_index)
        for j in range(previous_index, current_index):
            sn.append(" ")
            sn.append(words[j])
    return check_tag_b


def _right_boundary(sn: list[str], last_lemma_index: int,
                    words_indexes: list[int], last_word_index: int,
                    current_index: int, words: list[str],
                    words_range: int) -> int:
    if last_lemma_index == -1:
        return last_word_index

    word_index = len(words_indexes) - 1
    end_word_index = last_lemma_index + words_range
    if word_index <= end_word_index:
        start_index = words_indexes[last_lemma_index]
        start_index = max(start_index, last_word_index) + 1
        for j in range(start_index, current_index + 1):
            sn.append(" ")
            sn.append(words[j])
        last_word_index = current_index
    elif word_index == end_word_index + 1:
        sn.append(" ...")
    return last_word_index


def _snippet_end(sn: list[str], last_word_index: int, words: list[str]) -> None:
    s = "".join(sn)
    if last_word_index != len(words) - 1 and len(s) >= 3 and not s.endswith("..."):
        sn.append(" ...")

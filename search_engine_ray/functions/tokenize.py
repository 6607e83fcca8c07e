"""Word splitting / cleaning with the reference's exact semantics.

Re-expresses ``LemmasFinder.getWords`` / ``clearUnnecessarySymbols``
(``services/LemmasFinder.java:260-290``), with the quirks preserved and
documented:

- The text is lowercased, then split on runs of JAVA ``\\s`` — i.e. ASCII
  whitespace ``[ \\t\\n\\x0b\\f\\r]`` ONLY.  U+00A0 (``&nbsp;``) is *not* a
  split character here (it is in the snippet splitter, ``:108``), so words
  glued by a no-break space survive as one token and are then dropped by the
  cleaning regex — faithfully reproduced.
- Each token is trimmed by the anchored regex
  ``^[^а-яёa-z0-9]*(WORD)[^а-яёa-z0-9]*$`` where ``WORD`` is either a run of
  Russian/English letters or a Russian word with internal hyphens
  (``кто-то``; ``:276-283``).  Java's ``\\d`` is ASCII, hence the explicit
  ``0-9``.  If the regex does NOT match (digits or foreign letters embedded
  in the token, internal apostrophes, …), the reference keeps the raw token,
  which the morphology layer then invariably rejects — so the engine's
  equivalent, frozen rule is: **a token is kept iff the regex fully matches**,
  yielding the captured word.  This exact rule is what the DuckDB oracle SQL
  mirrors (``regexp_extract`` with the same pattern).

The per-batch vectorized driver is :func:`tokenize_batch`, used by the
lemmatizer stage; :func:`tokenize` is the scalar reference implementation the
tests and the query path use.
"""

from __future__ import annotations

import re

# Java \s — ASCII whitespace only (String.split("\\s+")).
SPLIT_RE = re.compile(r"[ \t\n\x0b\f\r]+")

# Anchored clean/trim regex; lowercase classes only because the text is
# lowercased first (LemmasFinder.java:261).  Explicit 0-9 == Java ASCII \d.
TOKEN_RE = re.compile(
    r"^[^а-яёa-z0-9]*(?P<word>(?:[а-яёa-z]+)|(?:[а-яё]+[а-яё\-]*[а-яё]+))[^а-яёa-z0-9]*$"
)

# The same pattern in RE2 syntax for the DuckDB oracle (group 1 == the word).
TOKEN_RE_SQL = "^[^а-яёa-z0-9]*(([а-яёa-z]+)|([а-яё]+[а-яё-]*[а-яё]+))[^а-яёa-z0-9]*$"

# Case-preserving variant used by the snippet builder, which cleans words of
# the ORIGINAL (non-lowercased) line to echo them back with their case
# (``LemmasFinder.java:115`` calls clearUnnecessarySymbols on the raw word;
# the Java pattern includes uppercase classes, ``:278-283``).
TOKEN_RE_CASED = re.compile(
    r"^[^а-яёА-ЯЁa-zA-Z0-9]*(?P<word>(?:[а-яёА-ЯЁa-zA-Z]+)|(?:[а-яёА-ЯЁ]+[а-яёА-ЯЁ\-]*[а-яёА-ЯЁ]+))[^а-яёА-ЯЁa-zA-Z0-9]*$"
)

# Snippet-side line word splitter: INCLUDES U+00A0 (LemmasFinder.java:108),
# unlike SPLIT_RE (getWords, :261) — a deliberate reference asymmetry.
SNIPPET_SPLIT_RE = re.compile(r"[\u00a0 \t\n\x0b\f\r]+")


def clean_token_cased(token: str) -> str:
    m = TOKEN_RE_CASED.match(token)
    return m.group("word") if m else ""


def clean_token(token: str) -> str:
    """The kept word for a raw whitespace-delimited token, or '' to drop."""
    m = TOKEN_RE.match(token)
    return m.group("word") if m else ""


def tokenize(text: str) -> list[str]:
    """Lowercased, cleaned tokens in document order (reference ``getWords``,
    minus the morphology fitting filter which is the next stage)."""
    out: list[str] = []
    for raw in SPLIT_RE.split(text.lower()):
        if not raw:
            continue
        w = clean_token(raw)
        if w:
            out.append(w)
    return out


def tokenize_batch(texts: list[str]) -> tuple[list[str], list[int]]:
    """Tokenize many documents; returns (flat_tokens, doc_token_counts).

    One pass, one compiled regex (the reference recompiles its pattern per
    word, ``LemmasFinder.java:284`` — deliberately not reproduced).
    """
    flat: list[str] = []
    counts: list[int] = []
    split = SPLIT_RE.split
    match = TOKEN_RE.match
    for text in texts:
        n0 = len(flat)
        for raw in split(text.lower()):
            if raw:
                m = match(raw)
                if m:
                    flat.append(m.group("word"))
        counts.append(len(flat) - n0)
    return flat, counts

"""Pluggable morphology: language routing, stop-POS filter, lemmatizer.

Re-expresses the reference's morphology layer (``services/LemmasFinder.java``)
from public knowledge only:

- ``qualifyMorphology`` (``:350-358``): Russian tried first, then English; a
  word neither can handle is dropped.  Frozen routing rule here: a token is
  *Russian* iff every char is in ``[а-яё-]`` (hyphens only appear in Russian
  tokens by the tokenizer's grammar), *English* iff every char is in
  ``[a-z]``; anything else (mixed-script) is dropped.
- ``isFittingWord`` (``:299-316``): drop words whose POS is in
  ``PARTICLES = {МЕЖД, СОЮЗ, ПРЕДЛ, ЧАСТ, PREP, VBE}`` (``:19``) —
  interjections / conjunctions / prepositions / particles for Russian,
  prepositions and be-verb forms for English.  Our from-scratch equivalent is
  an explicit, frozen stop-list per language covering the same POS classes
  (articles and English conjunctions are deliberately NOT stopped, matching
  the reference's tag set).
- ``getNormalWord`` (``:327-342``): first normal form.  Our from-scratch
  lemmatizers are deterministic rule tables: the public Snowball Russian
  stemming algorithm (snowballstem.org) and a Porter-style English
  suffix-stripper with an irregular-forms exception table.  NOT a clone of
  Lucene morphology — results are frozen by this module's own golden tests.

``SimpleMorphology`` is the identity provider (token == term, nothing
stopped): it is what the SQL-expressible driver oracle uses, since its whole
pipeline can be mirrored in DuckDB (see ``__ray_entry__.oracle_sql``).

Providers are stateful-but-immutable objects loaded once per actor
(``stages/lemmatize.py``); ``normal_word`` results are memoised per instance
because term frequency is zipfian.
"""

from __future__ import annotations

RU_CHARS = frozenset("абвгдеёжзийклмнопрстуфхцчшщъыьэюя-")
EN_CHARS = frozenset("abcdefghijklmnopqrstuvwxyz")

# --- frozen stop lists (POS classes of the reference PARTICLES set) --------

RU_STOPWORDS = frozenset(
    # conjunctions (СОЮЗ)
    "и а но да или либо тоже также зато однако же чтобы если хотя пока ибо "
    # prepositions (ПРЕДЛ)
    "в во на с со к ко по за из изо у от ото о об обо при для без до через "
    "над под подо перед передо про между среди возле около "
    # particles (ЧАСТ)
    "не ни бы б ли ль ведь вот мол уж лишь только даже пусть пускай разве "
    "неужели нет "
    # interjections (МЕЖД)
    "ой ах ох эх ух увы ура эй ау ого".split()
)

EN_STOPWORDS = frozenset(
    # prepositions (PREP)
    "about above across after against along among around at before behind "
    "below beneath beside besides between beyond by despite down during "
    "except for from in inside into near of off on onto out outside over "
    "past since through throughout till to toward towards under underneath "
    "until unto up upon with within without "
    # be-verb forms (VBE)
    "be am is are was were been being".split()
)

# --- English lemmatizer ----------------------------------------------------

EN_EXCEPTIONS = {
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "people": "person",
    "went": "go", "gone": "go", "goes": "go", "did": "do", "done": "do",
    "does": "do", "has": "have", "had": "have", "having": "have",
    "said": "say", "made": "make", "got": "get", "gotten": "get",
    "took": "take", "taken": "take", "came": "come", "saw": "see",
    "seen": "see", "knew": "know", "known": "know", "gave": "give",
    "given": "give", "found": "find", "thought": "think", "brought": "bring",
    "left": "leave", "felt": "feel", "kept": "keep", "held": "hold",
    "wrote": "write", "written": "write", "stood": "stand", "heard": "hear",
    "meant": "mean", "met": "meet", "ran": "run", "paid": "pay",
    "sat": "sit", "spoke": "speak", "spoken": "speak", "lay": "lie",
    "led": "lead", "read": "read", "grew": "grow", "grown": "grow",
    "lost": "lose", "fell": "fall", "fallen": "fall", "sent": "send",
    "built": "build", "understood": "understand", "drew": "draw",
    "drawn": "drawn", "broke": "break", "broken": "break", "spent": "spend",
    "cut": "cut", "bought": "buy", "worse": "bad", "worst": "bad",
    "better": "good", "best": "good",
}

_VOWELS = "aeiou"


def _undouble(s: str) -> str:
    if len(s) >= 2 and s[-1] == s[-2] and s[-1] not in _VOWELS and s[-1] not in "ls":
        return s[:-1]
    return s


def lemmatize_en(word: str) -> str:
    """Frozen Porter-light English lemmatizer (exceptions + suffix rules)."""
    exc = EN_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    w = word
    # plural / 3rd person -s
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies") and len(w) > 4:
        w = w[:-3] + "y"
    elif w.endswith(("xes", "ches", "shes", "zes", "oes")) and len(w) > 4:
        w = w[:-2]
    elif w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 3:
        w = w[:-1]
    # -ing / -ed
    if w.endswith("ying") and len(w) > 5:
        w = w[:-4] + "y"
    elif w.endswith("ing") and len(w) > 5:
        w = _undouble(w[:-3])
    elif w.endswith("ied") and len(w) > 4:
        w = w[:-3] + "y"
    elif w.endswith("ed") and len(w) > 4:
        w = _undouble(w[:-2])
    return w if len(w) >= 2 else word


# --- Russian lemmatizer: the public Snowball "russian" stemmer -------------

_RU_VOWELS = "аеиоуыэюя"

_PERFECTIVE_GERUND_1 = ("вшись", "вши", "в")           # require preceding а/я
_PERFECTIVE_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое", "ей",
    "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую", "юю", "ая",
    "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")           # require preceding а/я
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_REFLEXIVE = ("ся", "сь")
_VERB_1 = (  # require preceding а/я
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
    "ют", "ны", "ть", "ешь", "нно",
)
_VERB_2 = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят", "ует", "уют",
    "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии", "и",
    "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам", "ом", "о",
    "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я",
)
_SUPERLATIVE = ("ейше", "ейш")


def _longest_suffix(s: str, suffixes: tuple[str, ...]) -> str:
    best = ""
    for suf in suffixes:
        if len(suf) > len(best) and s.endswith(suf):
            best = suf
    return best


def _strip_group1(s: str, suffixes: tuple[str, ...]) -> tuple[str, bool]:
    """Group-1 endings must be preceded by а/я, which stays on the stem."""
    best = ""
    for suf in suffixes:
        if len(suf) > len(best) and s.endswith(suf) and len(s) > len(suf) and s[-len(suf) - 1] in "ая":
            best = suf
    return (s[: -len(best)], True) if best else (s, False)


def _strip(s: str, suffixes: tuple[str, ...]) -> tuple[str, bool]:
    best = _longest_suffix(s, suffixes)
    return (s[: -len(best)], True) if best else (s, False)


def lemmatize_ru(word: str) -> str:
    """Snowball Russian stemming algorithm (public spec, snowballstem.org)."""
    w = word
    # RV = region after the first vowel; R2 per Snowball definition.
    rv_start = len(w)
    for i, ch in enumerate(w):
        if ch in _RU_VOWELS:
            rv_start = i + 1
            break
    if rv_start >= len(w):
        return word
    head, rv = w[:rv_start], w[rv_start:]

    # R1: after first vowel-followed-by-nonvowel; R2: same inside R1.
    def _region_after_vc(s: str, base: int) -> int:
        for i in range(len(s) - 1):
            if s[i] in _RU_VOWELS and s[i + 1] not in _RU_VOWELS:
                return base + i + 2
        return base + len(s)

    r1 = _region_after_vc(w, 0)
    r2 = _region_after_vc(w[r1:], r1)

    # Step 1: perfective gerund, else (adjectival | reflexive+verb | verb | noun)
    rv, done = _strip(rv, _PERFECTIVE_GERUND_2)
    if not done:
        rv, done = _strip_group1(rv, _PERFECTIVE_GERUND_1)
    if not done:
        rv, _ = _strip(rv, _REFLEXIVE)
        rv, adj = _strip(rv, _ADJECTIVE)
        if adj:
            rv2, done2 = _strip(rv, _PARTICIPLE_2)
            if not done2:
                rv2, _ = _strip_group1(rv, _PARTICIPLE_1)
            rv = rv2
        else:
            rv, verb = _strip(rv, _VERB_2)
            if not verb:
                rv, verb = _strip_group1(rv, _VERB_1)
            if not verb:
                rv, _ = _strip(rv, _NOUN)

    # Step 2: remove "и"
    if rv.endswith("и"):
        rv = rv[:-1]

    w = head + rv
    # Step 3: derivational "ость"/"ост" in R2
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break
    # Step 4: superlative; double н; soft sign
    if w.endswith("ь"):
        w = w[:-1]
    else:
        w2, done = _strip(w, _SUPERLATIVE)
        if done:
            w = w2
        if w.endswith("нн"):
            w = w[:-1]
        if w.endswith("ь"):
            w = w[:-1]
    return w if w else word


# --- providers -------------------------------------------------------------


class Morphology:
    """Provider protocol: ``normal_word(token) -> term | ''`` (drop)."""

    name = "base"

    def normal_word(self, token: str) -> str:  # pragma: no cover - interface
        raise NotImplementedError


class SimpleMorphology(Morphology):
    """Identity provider: every cleaned token is its own term.

    SQL-expressible end to end — the DuckDB oracle's tokenizer mirrors it
    exactly (split + ``regexp_extract``; see tokenize.TOKEN_RE_SQL).
    """

    name = "simple"

    def normal_word(self, token: str) -> str:
        return token


class DefaultMorphology(Morphology):
    """Language routing + stop-POS filter + frozen lemmatizers (docstring
    at module top).  Memoised: term distributions are zipfian."""

    name = "default"

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def normal_word(self, token: str) -> str:
        hit = self._cache.get(token)
        if hit is not None:
            return hit
        chars = set(token)
        if chars <= RU_CHARS and chars & (RU_CHARS - {"-"}):
            out = "" if token in RU_STOPWORDS else lemmatize_ru(token)
        elif chars <= EN_CHARS:
            out = "" if token in EN_STOPWORDS else lemmatize_en(token)
        else:
            out = ""
        if len(self._cache) < 1_000_000:  # bound actor memory
            self._cache[token] = out
        return out


def get_morphology(name: str) -> Morphology:
    if name == "simple":
        return SimpleMorphology()
    if name == "default":
        return DefaultMorphology()
    raise ValueError(f"unknown morphology provider: {name!r}")

"""Frozen morphology provider behaviour (goldens pin determinism)."""

from search_engine_ray.functions.morphology import (
    DefaultMorphology,
    SimpleMorphology,
    get_morphology,
    lemmatize_en,
    lemmatize_ru,
)


def test_routing():
    m = DefaultMorphology()
    assert m.normal_word("abcкто") == ""  # mixed script dropped
    assert m.normal_word("hello") == "hello"
    assert m.normal_word("слово") != ""


def test_stopwords():
    m = DefaultMorphology()
    for w in ["of", "in", "at", "was", "be", "from"]:
        assert m.normal_word(w) == "", w
    for w in ["и", "в", "не", "на", "же"]:
        assert m.normal_word(w) == "", w
    # articles / English conjunctions are NOT stopped (reference PARTICLES
    # covers only PREP+VBE for English, LemmasFinder.java:19)
    assert m.normal_word("the") == "the"
    assert m.normal_word("and") == "and"


def test_english_lemmas_frozen():
    cases = {
        "running": "run", "tests": "test", "cities": "city",
        "children": "child", "watched": "watch", "boxes": "box",
        "engines": "engine", "ranking": "ranking"[:-3] if False else "rank",
        "dog": "dog", "pages": "page", "went": "go",
    }
    for w, expected in cases.items():
        assert lemmatize_en(w) == expected, (w, lemmatize_en(w))


def test_russian_lemmas_frozen():
    # Snowball russian behaviour on inflected forms: shared stems
    assert lemmatize_ru("столами") == lemmatize_ru("столы") == lemmatize_ru("стола")
    assert lemmatize_ru("бегала") == lemmatize_ru("бегал")
    assert lemmatize_ru("программа") == lemmatize_ru("программы")


def test_simple_identity():
    m = SimpleMorphology()
    assert m.normal_word("running") == "running"
    assert m.normal_word("of") == "of"


def test_provider_registry():
    assert get_morphology("simple").name == "simple"
    assert get_morphology("default").name == "default"
    import pytest

    with pytest.raises(ValueError):
        get_morphology("nope")


def test_cache_consistency():
    m = DefaultMorphology()
    a = m.normal_word("running")
    b = m.normal_word("running")
    assert a == b == "run"

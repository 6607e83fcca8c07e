"""Tokenizer semantics (reference getWords/clearUnnecessarySymbols quirks)."""

from search_engine_ray.functions.tokenize import (
    clean_token,
    clean_token_cased,
    tokenize,
    tokenize_batch,
)


def test_basic():
    assert tokenize("Hello, World!") == ["hello", "world"]


def test_russian_hyphen_words_kept():
    assert tokenize("кто-то что-то") == ["кто-то", "что-то"]


def test_english_hyphen_words_dropped():
    # the second regex alternative is Russian-only (LemmasFinder.java:276-283)
    assert tokenize("well-known") == []


def test_digits_disqualify():
    # digits excluded from the trim classes -> no match -> token dropped
    assert tokenize("test42 2024 x1y 42go") == []


def test_punctuation_trimmed():
    assert tokenize("--word!? (okay).") == ["word", "okay"]


def test_internal_apostrophe_drops():
    assert tokenize("don't it's") == []


def test_nbsp_not_a_split_char_in_indexer():
    # glued\xa0words is ONE raw token; internal nbsp -> no regex match -> drop
    assert tokenize("glued\xa0words free") == ["free"]


def test_mixed_script_token_kept_by_regex():
    # all-letters mixed-script matches the first alternative; the morphology
    # layer is what drops it later
    assert clean_token("abcкто") == "abcкто"


def test_cased_variant():
    assert clean_token_cased("--КТО-ТО!") == "КТО-ТО"
    assert clean_token_cased("Testing,") == "Testing"
    assert clean_token_cased("test42") == ""


def test_batch_matches_scalar():
    texts = ["Hello, World!", "кто-то test42", "", "a  b\tc\n"]
    flat, counts = tokenize_batch(texts)
    expect = [tokenize(t) for t in texts]
    assert flat == [w for ws in expect for w in ws]
    assert counts == [len(ws) for ws in expect]

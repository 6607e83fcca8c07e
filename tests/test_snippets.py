"""Snippet builder semantics (LemmasFinder.java:72-252), branch by branch."""

from search_engine_ray.functions.morphology import get_morphology
from search_engine_ray.functions.snippets import get_snippet

M = get_morphology("default")
S = get_morphology("simple")


def snip(text, lemmas, morph=M, words_range=2):
    return get_snippet(text, set(lemmas), morph, words_range)


def test_blank_text():
    assert snip("", ["x"]) == ""
    assert snip("   \n  ", ["x"]) == ""


def test_simple_highlight_with_context():
    text = "alpha beta gamma delta target epsilon zeta eta theta"
    out = snip(text, ["target"], S)
    # 2 significant words left/right, ellipses both sides
    assert out == "... gamma delta <b>target</b> epsilon zeta ..."


def test_match_at_line_start_no_leading_ellipsis():
    out = snip("target beta gamma delta", ["target"], S)
    assert out == "<b>target</b> beta gamma ..."


def test_match_at_line_end_no_trailing_ellipsis():
    out = snip("alpha beta target", ["target"], S)
    assert out == "... alpha beta <b>target</b>"


def test_adjacent_matches_merge_bold():
    out = snip("alpha target target beta", ["target"], S)
    # the closing tag of the first match is deleted (LemmasFinder.java:161-167)
    assert out == "... alpha <b>target target</b> beta"


def test_nonadjacent_matches_two_blocks():
    out = snip("target alpha target", ["target"], S)
    assert out == "<b>target</b> alpha <b>target</b>"


def test_gap_produces_inner_ellipsis():
    text = "target a b c d e f g h target"
    out = snip(text, ["target"], S)
    assert out == "<b>target</b> a b ... g h <b>target</b>"


def test_punctuation_prefix_suffix_echoed():
    out = snip('alpha "target!" beta', ["target"], S)
    assert '"<b>target</b>!"' in out


def test_case_preserved_in_echo():
    out = snip("alpha Target beta", ["target"], S)
    assert "<b>Target</b>" in out


def test_nbsp_splits_words_in_snippet():
    # U+00A0 splits here, unlike the indexer tokenizer (reference asymmetry)
    out = snip("alpha\xa0target\xa0beta", ["target"], S)
    assert "<b>target</b>" in out


def test_morphology_match():
    # document word 'tests' matches query lemma 'test' via normal form
    out = snip("alpha tests beta", ["test"], M)
    assert "<b>tests</b>" in out


def test_insignificant_words_in_context_copied_verbatim():
    # stop-POS words are not significant (don't count for the window) but are
    # copied with the fragment
    out = snip("alpha of target beta", ["target"], M)
    assert "of <b>target</b>" in out


def test_spoiler_after_270_chars():
    words = " ".join(f"target w{i:02d} x{i:02d}" for i in range(30))
    out = snip(words, ["target"], S)
    assert "<details>" in out
    assert out.endswith("</details>")
    assert out.index("<details>") > 200


def test_multi_line_fragments():
    text = "alpha target beta\nunrelated line here\ngamma target delta"
    out = snip(text, ["target"], S)
    assert out.count("<b>target</b>") == 2
    # each line's fragment ends with its own ellipsis
    assert "beta ..." in out


def test_stop_only_line_between():
    text = "target one\n\n\ntwo target"
    out = snip(text, ["target"], S)
    assert out.count("<b>target</b>") == 2

"""Property-based tests (SURVEY §5.6): codec round-trips and the
vectorized-vs-scalar equivalence of the hot-path stages, over generated
inputs rather than fixtures."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.codec import (
    decode_block_docids,
    decode_block_tfs,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from search_engine_ray.functions.morphology import get_morphology
from search_engine_ray.functions.tokenize import SPLIT_RE, TOKEN_RE, tokenize
from search_engine_ray.stages.lemmatize import Lemmatizer

# --- codec -----------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, np.int64)
    assert (varint_decode(varint_encode(arr), count=len(values)) == arr).all()


@given(
    st.sets(st.integers(min_value=0, max_value=2**45), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=150, deadline=None)
def test_postings_roundtrip_any_block_size(doc_id_set, block_size):
    ids = np.array(sorted(doc_id_set), np.int64)
    rng = np.random.RandomState(len(ids))
    tfs = rng.randint(1, 1000, ids.size).astype(np.int64)
    dls = rng.randint(1, 5000, ids.size).astype(np.int64)
    enc = encode_postings(ids, tfs, dls, block_size=block_size)
    out_ids, out_tfs = decode_postings(enc)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()
    # block-wise decode agrees with the full decode, and block metadata is
    # consistent
    n_blocks = enc.block_off_docs.size
    got_ids, got_tfs = [], []
    for bi in range(n_blocks):
        bids = decode_block_docids(enc, bi)
        btfs = decode_block_tfs(enc, bi)
        assert bids[0] == enc.block_first_docid[bi]
        assert bids[-1] == enc.block_last_docid[bi]
        assert btfs.max() == enc.block_max_tf[bi]
        got_ids.append(bids)
        got_tfs.append(btfs)
    assert (np.concatenate(got_ids) == ids).all()
    assert (np.concatenate(got_tfs) == tfs).all()


# --- tokenizer / lemmatizer -----------------------------------------------

_texty = st.text(
    alphabet=st.sampled_from(
        list("abcxyz ") + list("абвгд") + list("0123456789")
        + [" ", "\t", "\n", "-", "'", ".", ",", "!", "?", "Z", "Д", "😀"]
    ),
    max_size=200,
)


@given(st.lists(_texty, min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_vectorized_lemmatizer_equals_scalar(texts):
    """The Arrow/RE2 Lemmatizer must produce exactly the TF maps of the
    scalar reference loop (tokenize + morphology per token) on ANY input."""
    morph = get_morphology("default")
    lem = Lemmatizer(morphology="default", text_column="text")
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = lem(batch)
    for i, text in enumerate(texts):
        counts: dict[str, int] = {}
        for raw in SPLIT_RE.split(text.lower()):
            if not raw:
                continue
            m = TOKEN_RE.match(raw)
            if not m:
                continue
            term = morph.normal_word(m.group("word"))
            if term:
                counts[term] = counts.get(term, 0) + 1
        expect_terms = sorted(counts)
        got_terms = out["terms"][i].as_py()
        got_tfs = out["tfs"][i].as_py()
        assert got_terms == expect_terms, (text, got_terms, expect_terms)
        assert got_tfs == [counts[t] for t in expect_terms]
        assert out["doc_len"][i].as_py() == sum(counts.values())


@given(_texty)
@settings(max_examples=150, deadline=None)
def test_scalar_tokenize_matches_spec(text):
    """tokenize() == manual split+match composition (guards refactors)."""
    expect = []
    for raw in SPLIT_RE.split(text.lower()):
        if raw:
            m = TOKEN_RE.match(raw)
            if m:
                expect.append(m.group("word"))
    assert tokenize(text) == expect


_html_soup = st.lists(
    st.one_of(
        st.sampled_from([
            "<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "<br>", "<br/>",
            "<title>", "</title>", "<script>", "</script>", "<style>",
            "</style>", "<!-- c -->", "<!-- <p>x</p> -->", "<a href='q>r'>",
            "</a>", "&amp;", "&nbsp;", "&#65;", "< notag", "text", "слово",
            " ", "\n", "\t", "two words", "x<y", "5 > 4",
            # CDATA end-tag near-misses (must stay raw) + strict variants
            "</scripts>", "</script x=1>", "</script >", "</ script>",
            "</styles>", "<noscript>", "</noscript>", "<template>",
            "</template>", "</ p>", "</ div >", "<p-x>", "</p-x>",
            # end-tag tolerant fallback is quote-UNAWARE in html.parser —
            # quoted '>' fragments must hit both the start- and end-tag paths
            "</b<a href='q>r'>", '</b attr=">">', "</b foo>", '"', "'",
        ]),
        st.text(alphabet="abc атица<>&;/'\" \n", max_size=12),
    ),
    max_size=30,
)


@given(_html_soup)
@settings(max_examples=150, deadline=None)
def test_fast_scanner_equals_parser_on_soup(parts):
    from search_engine_ray.functions.html import extract_all, extract_all_ref

    html = "".join(parts)
    assert extract_all(html) == extract_all_ref(html), html


# --- stable hash (routing/dedup contract) ----------------------------------


@given(st.lists(st.text(max_size=40), max_size=25), st.integers(0, 2**32))
@settings(max_examples=150, deadline=None)
def test_stable_hash_list_arrow_scalar_agree(strings, seed):
    from search_engine_ray.functions.hashing import stable_hash_array, stable_hash_str

    h_list = stable_hash_array(strings, seed)
    h_arrow = stable_hash_array(pa.array(strings, pa.string()), seed)
    assert (h_list == h_arrow).all()
    for s, h in zip(strings, h_list):
        assert stable_hash_str(s, seed) == int(h)


@given(st.lists(st.text(max_size=30), min_size=4, max_size=20),
       st.integers(0, 3), st.integers(0, 3))
@settings(max_examples=100, deadline=None)
def test_stable_hash_sliced_arrow_offset(strings, lo, hi):
    """Value must not depend on array offset or batch composition."""
    from search_engine_ray.functions.hashing import stable_hash_array

    arr = pa.array(strings, pa.string())
    sl = arr.slice(lo, max(1, len(strings) - lo - hi))
    assert (stable_hash_array(sl) == stable_hash_array(sl.to_pylist())).all()

"""Query engine: rank identity vs DuckDB oracle, WAND identity, pagination."""

import numpy as np
import pytest

from search_engine_ray.config import Bm25Params
from search_engine_ray.corpus import FIXTURE_QUERIES, synth_pages_table
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.pipelines.query import IndexReader
from search_engine_ray.stages.lemmatize import lemmas_of_query


@pytest.fixture(scope="module")
def ix(tiny_index):
    return IndexReader(tiny_index, preload=True)


def test_empty_query(ix):
    assert ix.search("").result is False
    assert ix.search("   ").result is False


def test_bad_pagination(ix):
    assert ix.search("zebra", limit=0).result is False
    assert ix.search("zebra", offset=-1).result is False


def test_stop_only_query_empty_ok(ix):
    r = ix.search("of in at")
    assert r.result is True and r.count == 0 and r.data == []


def test_unknown_term(ix):
    r = ix.search("nonexistentterm")
    assert r.result is True and r.count == 0


def test_duplicate_query_words_set_semantics(ix):
    a = ix.search("zebra quartz", with_snippets=False)
    b = ix.search("zebra zebra quartz", with_snippets=False)
    assert [(h.doc_id, h.score) for h in a.data] == [(h.doc_id, h.score) for h in b.data]


def test_conjunctive_and(ix):
    # 'quartz' exists only on site0/site2 pages that also have zebra
    r = ix.search("zebra quartz", with_snippets=False)
    paths = [h.path for h in r.data]
    assert set(paths) == {"/rich", "/shared"}
    assert r.count == 2


def test_relative_relevance_normalized(ix):
    r = ix.search("zebra", with_snippets=False)
    assert r.data[0].score == 1.0
    assert all(0 < h.score <= 1.0 for h in r.data)


def test_site_scoped(ix):
    r = ix.search("zebra", site="https://site2.example", with_snippets=False)
    assert {h.site for h in r.data} == {"https://site2.example"}
    assert r.count == 2


def test_pagination(ix):
    full = ix.search("zebra", with_snippets=False)
    page = ix.search("zebra", limit=2, offset=1, with_snippets=False)
    assert [h.doc_id for h in page.data] == [h.doc_id for h in full.data[1:3]]
    assert page.count == full.count
    beyond = ix.search("zebra", limit=2, offset=99, with_snippets=False)
    assert beyond.count == full.count and beyond.data == []


def test_tie_break_doc_id_asc(ix):
    r = ix.search("vocabulary zebra", with_snippets=False)
    scores = [h.score for h in r.data]
    ids = [h.doc_id for h in r.data]
    for i in range(len(ids) - 1):
        assert scores[i] > scores[i + 1] or (
            scores[i] == scores[i + 1] and ids[i] < ids[i + 1])


def test_reference_scorer_vs_duckdb_oracle(ray_session, tiny_index, ix):
    """Rank identity: engine's reference scorer == SQL semantics over an
    exploded tf table derived from the same index (SURVEY.md §5.4)."""
    import glob

    import duckdb
    import pyarrow.parquet as pq

    from search_engine_ray.functions.codec import decode_postings
    from search_engine_ray.pipelines.query import SegmentReader

    # materialize tf(term, doc_id, tf) from the segments themselves
    rows = []
    for path in sorted(glob.glob(f"{tiny_index}/part=*/postings.parquet")):
        rd = SegmentReader(path.rsplit("/", 1)[0], preload=True)
        for term in pq.read_table(path, columns=["term"])["term"].to_pylist():
            ids, tfs = decode_postings(rd.postings(term))
            rows.extend((term, int(d), int(t)) for d, t in zip(ids, tfs))
    con = duckdb.connect()
    con.execute("CREATE TABLE tf(term VARCHAR, doc_id BIGINT, tf INT)")
    con.executemany("INSERT INTO tf VALUES (?,?,?)", rows)

    for q in FIXTURE_QUERIES:
        lemmas = lemmas_of_query(q["query"])
        if not lemmas or q["site"] is not None:
            continue
        placeholders = ",".join("?" for _ in lemmas)
        sql = f"""
        WITH hits AS (
            SELECT doc_id, SUM(tf) AS abs_rel
            FROM tf WHERE term IN ({placeholders})
            GROUP BY doc_id
            HAVING COUNT(DISTINCT term) = {len(lemmas)}
        )
        SELECT doc_id, abs_rel / MAX(abs_rel) OVER () AS rel
        FROM hits ORDER BY rel DESC, doc_id ASC
        """
        expected = con.execute(sql, lemmas).fetchall()
        got = ix.search(q["query"], limit=10**6, with_snippets=False)
        assert got.count == len(expected), q
        got_rows = [(h.doc_id, h.score) for h in got.data]
        exp_rows = [(d, float(r)) for d, r in expected]
        assert got_rows == pytest.approx(exp_rows), q


@pytest.mark.parametrize("query", ["zebra", "zebra quartz", "search engine",
                                   "поиск система", "needle filler word"])
def test_wand_equals_exhaustive_tiny(ix, query):
    lemmas = lemmas_of_query(query)
    for k in (1, 3, 10, 100):
        assert ix.bm25_topk(lemmas, k=k, pruned=True) == \
            ix.bm25_topk(lemmas, k=k, pruned=False), (query, k)


def test_wand_equals_exhaustive_synth(ray_session, tmp_path):
    import ray.data as rd

    from search_engine_ray.config import IndexBuildConfig

    idx = str(tmp_path / "synth")
    build_index(rd.from_arrow(synth_pages_table(800, seed=5)), idx,
                IndexBuildConfig(num_partitions=5, block_size=16))
    ix = IndexReader(idx, preload=True)
    queries = ["search engine index", "page site word", "поиск система индекс",
               "data build run", "ranking score relevance token",
               "fast slow big small", "the search"]
    for q in queries:
        lemmas = lemmas_of_query(q)
        for k in (1, 5, 20, 200):
            a = ix.bm25_topk(lemmas, k=k, pruned=True)
            b = ix.bm25_topk(lemmas, k=k, pruned=False)
            assert a == b, (q, k, a[:3], b[:3])


def test_bm25_scorer_via_search(ix):
    r = ix.search("zebra quartz", scorer="bm25", with_snippets=False)
    assert r.result and len(r.data) >= 2
    # bm25 is disjunctive: superset of the conjunctive result set
    ref = ix.search("zebra quartz", with_snippets=False)
    assert {h.doc_id for h in ref.data} <= {h.doc_id for h in r.data}


def test_snippets_on_hits(ix):
    r = ix.search("needle")
    assert r.data[0].snippet.count("<b>needle</b>") >= 2
    assert r.data[0].title == "Spoiler Page"


def test_search_queryset_fanout(ray_session, tiny_index):
    """Batched query-set fan-out (ST5): Dataset of queries -> actor pool ->
    per-hit rows identical to the scalar search path."""
    from search_engine_ray.pipelines.query import IndexReader, search_queryset

    qs = [
        {"query_id": 0, "query": "zebra"},
        {"query_id": 1, "query": "zebra quartz"},
        {"query_id": 2, "query": "nonexistentterm"},
        {"query_id": 3, "query": "needle", "limit": 2, "offset": 1},
    ]
    out = search_queryset(tiny_index, qs, scorer="reference",
                          concurrency=(1, 2)).to_pandas()
    ix = IndexReader(tiny_index, preload=True)
    for q in qs:
        got = out[out.query_id == q["query_id"]].sort_values("rank")
        resp = ix.search(q["query"], limit=q.get("limit"),
                         offset=q.get("offset"), with_snippets=False)
        assert list(got.doc_id) == [h.doc_id for h in resp.data]
        assert list(got.score) == [h.score for h in resp.data]
        if len(got):
            assert list(got["rank"])[0] == (q.get("offset") or 0) + 1
    assert (out[out.query_id == 2].empty)  # unknown term -> no rows


def test_search_queryset_bm25_with_snippets(ray_session, tiny_index):
    from search_engine_ray.pipelines.query import search_queryset

    out = search_queryset(tiny_index, [{"query_id": 7, "query": "needle"}],
                          scorer="bm25", with_snippets=True,
                          concurrency=(1, 2)).to_pandas()
    assert len(out) >= 1
    assert out.iloc[0].snippet.count("<b>needle</b>") >= 2


def test_site_name_mapping(ix):
    from search_engine_ray.config import SearchSettings

    s = SearchSettings(site_names=(("https://site2.example", "Site Two"),))
    r = ix.search("zebra", site="https://site2.example", settings=s,
                  with_snippets=False)
    assert r.data and all(h.site_name == "Site Two" for h in r.data)
    r2 = ix.search("zebra", site="https://site0.example", settings=s,
                   with_snippets=False)
    assert r2.data and all(h.site_name == "https://site0.example" for h in r2.data)


def test_index_without_doc_text_degrades_gracefully(ray_session, tmp_path):
    """store_doc_text=False: snippets come back empty, everything else works."""
    import ray.data as rd

    from search_engine_ray.config import IndexBuildConfig
    from search_engine_ray.corpus import tiny_fixture_pages
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import IndexReader

    idx = str(tmp_path / "notext")
    build_index(rd.from_arrow(tiny_fixture_pages()), idx,
                IndexBuildConfig(num_partitions=2, store_doc_text=False))
    ix2 = IndexReader(idx, preload=True)
    r = ix2.search("needle")  # with_snippets=True by default
    assert r.result and r.count >= 1
    assert all(h.snippet == "" for h in r.data)
    assert r.data[0].title == "Spoiler Page"

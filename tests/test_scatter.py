"""Scatter/gather query path: results must be IDENTICAL to the
single-process IndexReader on every scorer / option combination."""

import numpy as np
import pytest

import ray.data as rd

from search_engine_ray.config import IndexBuildConfig, SearchSettings
from search_engine_ray.corpus import synth_pages_table, tiny_fixture_pages
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.pipelines.query import IndexReader
from search_engine_ray.pipelines.scatter import ScatterIndex


@pytest.fixture(scope="module")
def scatter_index_dir(ray_session, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("scatter") / "idx")
    pages = synth_pages_table(600, seed=33)
    build_index(rd.from_arrow(pages), idx, IndexBuildConfig(num_partitions=6))
    return idx


def _hits(resp):
    return [(h.doc_id, round(h.score, 12), h.url, h.title, h.snippet)
            for h in resp.data]


QUERIES = ["the data", "query engine", "zzznotaword", "search index data",
           "web"]


def test_scatter_identical_to_single_process(ray_session, scatter_index_dir):
    ix = IndexReader(scatter_index_dir, preload=True)
    with ScatterIndex(scatter_index_dir, num_searchers=3) as sc:
        for q in QUERIES:
            for scorer in ("reference", "bm25"):
                a = ix.search(q, scorer=scorer, with_snippets=True, limit=15)
                b = sc.search(q, scorer=scorer, with_snippets=True, limit=15)
                assert a.result == b.result
                assert a.count == b.count, (q, scorer)
                assert _hits(a) == _hits(b), (q, scorer)


def test_scatter_pagination_and_site_scope(ray_session, scatter_index_dir):
    ix = IndexReader(scatter_index_dir, preload=True)
    with ScatterIndex(scatter_index_dir, num_searchers=2) as sc:
        a = ix.search("data", limit=5, offset=3, with_snippets=False)
        b = sc.search("data", limit=5, offset=3, with_snippets=False)
        assert a.count == b.count and _hits(a) == _hits(b)

        # site-scoped: one real site + one absent site
        sites = {h.site for h in ix.search("data", limit=50,
                                           with_snippets=False).data}
        site = sorted(sites)[0]
        a = ix.search("data", site=site, with_snippets=False)
        b = sc.search("data", site=site, with_snippets=False)
        assert a.count == b.count and _hits(a) == _hits(b)
        r = sc.search("data", site="https://nosuch.example",
                      with_snippets=False)
        assert r.result is True and r.count == 0

        # validation order preserved
        assert sc.search("").result is False
        assert sc.search("data", limit=0).result is False
        assert sc.search("data", offset=-1).result is False


def test_scatter_bm25_floor_propagation_matches(ray_session,
                                                scatter_index_dir):
    """The two-stage floor must not change the top-k (subset k-th is a
    valid global floor); compare against the exhaustive scorer."""
    ix = IndexReader(scatter_index_dir, preload=True)
    with ScatterIndex(scatter_index_dir, num_searchers=3) as sc:
        for q in ("data search", "the web query"):
            import search_engine_ray.stages.lemmatize as lz

            lemmas = lz.lemmas_of_query(q, "default")
            exact = ix.bm25_topk(lemmas, k=10, pruned=False)
            got = sc._bm25_scatter(lemmas, 10, None,
                                   __import__("search_engine_ray.config",
                                              fromlist=["Bm25Params"]
                                              ).Bm25Params())
            assert [(round(s, 10), d) for s, d in got] == \
                   [(round(s, 10), d) for s, d in exact]


def test_scatter_single_actor_degenerate(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(tiny_fixture_pages()), idx,
                IndexBuildConfig(num_partitions=3))
    ix = IndexReader(idx, preload=True)
    with ScatterIndex(idx, num_searchers=1) as sc:
        a = ix.search("zebra quartz", with_snippets=True)
        b = sc.search("zebra quartz", with_snippets=True)
        assert a.count == b.count and _hits(a) == _hits(b)

def test_scatter_reference_gather_is_k_bounded(ray_session,
                                               scatter_index_dir):
    """The reference-scorer gather must materialize O(actors x k) rows on
    the driver, never the full match set: each actor's partial carries at
    most offset+limit candidate rows even when its partition matches far
    more documents (r4 verdict: a stopword query at 100x must not ship
    millions of ids to the driver)."""
    import ray

    import search_engine_ray.stages.lemmatize as lz

    with ScatterIndex(scatter_index_dir, num_searchers=3) as sc:
        lemmas = lz.lemmas_of_query("data", "default")
        k = 4
        parts = ray.get([a.reference_partials.remote(lemmas, None, k)
                         for a in sc.actors])
        total_matches = sum(p[0] for p in parts)
        assert total_matches > 3 * k  # the witness is non-degenerate
        for n, mx, ids, scores in parts:
            assert len(ids) <= k and len(scores) <= k
            if n:
                # top-k is ordered by (-score, id) and max is consistent
                assert mx >= scores.max()
                order = np.lexsort((ids, -scores))
                assert (order == np.arange(len(ids))).all()

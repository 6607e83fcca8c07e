"""Positional postings + index-backed phrase search (pipelines/phrase)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_engine_ray.config import IndexBuildConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.pipelines.phrase import phrase_counts, phrase_search


def _pages(rows):
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array(
            [f"<html><title>t</title><body>{r[2]}</body></html>".encode()
             for r in rows], pa.binary()),
    }))


WORDS = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]


def _corpus(n=60, seed=9):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        toks = [WORDS[t] for t in rng.randint(0, len(WORDS), 12)]
        if i % 4 == 0:
            toks[3:3] = ["apple", "banana"]       # guaranteed phrase hits
        if i % 10 == 0:
            toks += ["fig", "fig", "fig"]         # repeated-term phrase
        rows.append((f"http://s{i % 3}.example/p{i}", 1_000_000 * (i + 1),
                     " ".join(toks)))
    return rows


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posidx") / "idx")
    rows = _corpus()
    build_index(_pages(rows), out,
                IndexBuildConfig(morphology="simple", num_partitions=3,
                                 store_positions=True, block_size=4),
                resume=False)
    return out, rows


def _reference_counts(rows, phrase):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "text": pa.array([r[2] for r in rows]),
        "url": pa.array([r[0] for r in rows]),
    }))
    out = phrase_counts(docs, phrase).to_pandas()
    urls = [r[0] for r in rows]
    return {urls[d]: int(n) for d, n in zip(out.doc_id, out.n_matches)}


def _index_counts(pos_index_dir, phrase):
    import pyarrow.parquet as pq

    res = phrase_search(pos_index_dir, phrase).to_pandas()
    # map doc_id -> url through the segments' doc metadata
    import glob
    id2url = {}
    for f in glob.glob(f"{pos_index_dir}/part=*/docs.parquet"):
        t = pq.read_table(f, columns=["doc_id", "url"])
        id2url.update(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))
    return {id2url[d]: int(n) for d, n in zip(res.doc_id, res.n_matches)}


@pytest.mark.parametrize("phrase", [["apple", "banana"],
                                    ["fig", "fig"],
                                    ["banana", "cherry", "date"],
                                    ["grape", "grape", "grape"]])
def test_phrase_index_matches_streaming(pos_index, phrase):
    idx_dir, rows = pos_index
    want = _reference_counts(rows, phrase)
    got = _index_counts(idx_dir, phrase)
    assert got == want
    if phrase == ["apple", "banana"]:
        assert len(want) >= 15  # the planted hits actually exist


def test_phrase_requires_positions(ray_session, tmp_path):
    out = str(tmp_path / "noposs")
    build_index(_pages(_corpus(10)), out,
                IndexBuildConfig(morphology="simple", num_partitions=2),
                resume=False)
    with pytest.raises(Exception, match="positional"):
        phrase_search(out, ["apple", "banana"]).to_pandas()


def test_positions_survive_url_dedup(ray_session, tmp_path):
    """Duplicate urls: latest warc_ts wins and its positions stay aligned."""
    rows = [("http://x.example/a", 1_000_000, "elder apple banana"),
            ("http://x.example/a", 9_000_000, "apple banana apple banana"),
            ("http://x.example/b", 1_000_000, "banana apple")]
    out = str(tmp_path / "dup")
    build_index(_pages(rows), out,
                IndexBuildConfig(morphology="simple", num_partitions=1,
                                 store_positions=True), resume=False)
    res = phrase_search(out, ["apple", "banana"]).to_pandas()
    assert res.n_matches.tolist() == [2]  # the warc_ts=9e6 version

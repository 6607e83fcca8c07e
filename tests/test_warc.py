"""WARC source (sources/warc.py): parser, gzip member handling, datasource."""

import gzip
import io
import os

import numpy as np
import pyarrow as pa

from search_engine_ray.sources.warc import (parse_warc_stream, read_warc,
                                            write_warc)


def _records(n=5):
    return [(f"http://site{i % 2}.example/p{i}", i * 1_000_000,
             f"<html><body>doc {i} тест</body></html>"
             .encode(), 200 + (i % 3))
            for i in range(n)]


def test_roundtrip_plain(tmp_path):
    p = str(tmp_path / "f.warc")
    recs = _records()
    assert write_warc(p, recs) == len(recs)
    with open(p, "rb") as f:
        got = list(parse_warc_stream(io.BufferedReader(f)))
    assert [(u, t, h, c) for u, t, h, c, _ in got] == recs
    assert all(w == "response" for *_, w in got)


def test_roundtrip_gzip_members(tmp_path):
    p = str(tmp_path / "f.warc.gz")
    recs = _records(7)
    write_warc(p, recs)
    # per-record gzip members: the raw file contains multiple gzip headers
    raw = open(p, "rb").read()
    assert raw.count(b"\x1f\x8b") >= len(recs)
    with gzip.open(p, "rb") as f:
        got = list(parse_warc_stream(io.BufferedReader(f)))
    assert [(u, t, h, c) for u, t, h, c, _ in got] == recs


def test_non_response_records_skipped():
    req = (b"WARC/1.0\r\n"
           b"WARC-Type: request\r\n"
           b"WARC-Target-URI: http://x/\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"Content-Length: 4\r\n\r\nGET /\r\n\r\n")
    # note Content-Length 4 covers only "GET " — keep framing honest
    req = req.replace(b"Content-Length: 4\r\n\r\nGET /",
                      b"Content-Length: 5\r\n\r\nGET /")
    resp = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: http://x/a\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: 48\r\n\r\n"
            b"HTTP/1.1 404 NF\r\nContent-Length: 9\r\n\r\n<html></h>"
            b"\r\n\r\n")
    got = list(parse_warc_stream(io.BufferedReader(
        io.BytesIO(req + resp))))
    assert len(got) == 1
    url, _ts, html, code, wtype = got[0]
    assert (url, code, wtype) == ("http://x/a", 404, "response")
    assert html == b"<html></h>"


def test_read_warc_dataset(ray_session, tmp_path):
    paths = []
    for shard in range(3):
        p = str(tmp_path / f"s{shard}.warc.gz")
        write_warc(p, [(f"http://s{shard}.example/p{i}", (shard * 10 + i)
                        * 1_000_000, b"<html>x</html>", 200)
                       for i in range(4)])
        paths.append(p)
    ds = read_warc(paths, batch_records=3)
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 12
    assert (df.code == 200).all()
    assert (df.html == b"<html>x</html>").all()
    assert df.warc_ts.astype(np.int64).min() >= 0


def test_warc_feeds_index_build(ray_session, tmp_path):
    """End-to-end: WARC -> read_warc -> build_index -> searchable segment."""
    from search_engine_ray.config import IndexBuildConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import IndexReader

    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, [
        (f"http://w.example/p{i}", i * 1_000_000,
         f"<html><title>t{i}</title><body>apple banana {'cherry ' * i}"
         f"</body></html>".encode(), 200)
        for i in range(6)])
    out = str(tmp_path / "idx")
    ds = read_warc([p]).drop_columns(["code", "warc_type"])
    res = build_index(ds, out, IndexBuildConfig(
        morphology="simple", num_partitions=2), resume=False)
    assert res.n_docs == 6
    rd_ix = IndexReader(out)
    # posting-level check: every doc contains "banana"
    total_df = sum(
        (rd_ix.reader(p_).postings("banana").df
         if rd_ix.reader(p_).postings("banana") else 0)
        for p_ in rd_ix.parts)
    assert total_df == 6

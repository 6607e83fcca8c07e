"""Corpus cleaning operators (stages/cleaning.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_engine_ray.stages.cleaning import (line_dedup, repetition_stats,
                                               scrub_pii)


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "hello world\nfooter line\nunique a",
            "second doc\nfooter line\nmail me a@b.co or 10.0.0.1",
            "third\nfooter line\nthird\nthird",
            "",
        ])})


def test_scrub_pii(ray_session):
    out = scrub_pii(rd.from_arrow(_docs())).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.text[1] == "second doc\nfooter line\nmail me <EMAIL> or <IP>"
    assert out.n_emails.tolist() == [0, 1, 0, 0]
    assert out.n_ips.tolist() == [0, 1, 0, 0]
    # scrubbing is idempotent on clean docs
    assert out.text[0] == "hello world\nfooter line\nunique a"


def test_scrub_pii_phone_not_ip(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["call +7 (495) 123-45-67 or 1.2.3.4"])})
    out = scrub_pii(rd.from_arrow(t)).to_pandas()
    assert out.text[0] == "call <PHONE> or <IP>"
    assert out.n_phones.tolist() == [1] and out.n_ips.tolist() == [1]


def test_line_dedup_removes_boilerplate(ray_session):
    out = line_dedup(rd.from_arrow(_docs()).repartition(3), max_docs=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # "footer line" appears in 3 docs -> removed everywhere
    assert out.clean_text.tolist() == [
        "hello world\nunique a",
        "second doc\nmail me a@b.co or 10.0.0.1",
        "third\nthird\nthird",  # within-doc repeats are NOT boilerplate
        "",
    ]
    assert out.n_lines.tolist() == [3, 3, 4, 1]
    assert out.n_removed.tolist() == [1, 1, 1, 0]


def test_line_dedup_shuffle_fallback_matches_broadcast(ray_session):
    """Tripping the broadcast guard (max_broadcast=0) now switches to the
    hash-partitioned semi-join plan instead of raising — output identical."""
    ds = rd.from_arrow(_docs()).repartition(3)

    def canon(d):
        return d.sort_values("doc_id").reset_index(drop=True)

    bcast = canon(line_dedup(ds, max_docs=1).to_pandas())
    assert bcast.equals(canon(
        line_dedup(ds, max_docs=1, force_shuffle=True).to_pandas()))
    assert bcast.equals(canon(
        line_dedup(ds, max_docs=1, max_broadcast=0).to_pandas()))
    # also under max_docs=0 (every line with nd > 0 removed -> all gone)
    all0 = canon(line_dedup(ds, max_docs=0, max_broadcast=0).to_pandas())
    assert all0.clean_text.tolist() == ["", "", "", ""]
    assert all0.n_removed.tolist() == [3, 3, 4, 1]


def test_repetition_stats(ray_session):
    out = repetition_stats(rd.from_arrow(_docs())).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.n_lines.tolist() == [3, 3, 4, 1]
    assert out.n_dup_lines.tolist() == [0, 0, 2, 0]
    assert out.dup_line_frac.tolist() == [0.0, 0.0, 0.5, 0.0]
    # doc 3: dup chars = 3 occurrences of "third" (15) over 15+11 total
    assert np.isclose(out.dup_line_char_frac[2], 15 / 26)
    # empty doc: one empty line, zero chars -> 0.0 by the frozen rule
    assert out.dup_line_char_frac[3] == 0.0


def test_parallelism_invariant(ray_session):
    docs = _docs()
    one = line_dedup(rd.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = line_dedup(rd.from_arrow(docs).repartition(7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)

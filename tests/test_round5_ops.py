"""Round-5 operator tests: ExactSubstr duplicated-span stats
(stages/dedup.py substring_dedup_stats, Lee et al. 2022)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _brute_span_stats(texts: dict[int, str], k: int) -> dict[int, tuple]:
    """Reference implementation with TRUE substrings and a per-position
    boolean mask — no fingerprints, no interval arithmetic."""
    from collections import Counter

    occ = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            occ[t[i:i + k]] += 1
    out = {}
    for d, t in texts.items():
        L = len(t)
        starts = [i for i in range(L - k + 1) if occ[t[i:i + k]] >= 2]
        mask = np.zeros(L, bool)
        for s in starts:
            mask[s:s + k] = True
        n_masked = int(mask.sum())
        # maximal contiguous masked regions
        n_spans = int(np.sum(np.diff(np.concatenate(
            [[0], mask.view(np.int8)])) == 1))
        out[d] = (L, max(L - k + 1, 0), len(starts), n_spans, n_masked)
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog again and again",
    2: "a totally unique line with no repeats whatsoever here",
    3: "the quick brown fox naps; the quick brown fox naps once more",
    4: "short",                                  # < k: zero windows
    5: "xyxyxyxyxyxyxyxyxyxyxyxyxy",             # self-repetition only
    6: "jumps over the lazy dog again and then jumps over the lazy dog",
    7: "ünïcödé text with ünïcödé repetition ünïcödé text with stuff",
}


def _run(ds_rows, k, **kw):
    from search_engine_ray.stages.dedup import substring_dedup_stats

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(ds_rows), pa.int64()),
        "text": pa.array([ds_rows[d] for d in ds_rows], pa.string())}))
    t = pa.Table.from_pylist(substring_dedup_stats(ds, k=k, **kw).take_all())
    return {r["doc_id"]: (r["n_chars"], r["n_windows"], r["n_dup_starts"],
                          r["n_spans"], r["n_masked"])
            for r in t.to_pylist()}


@pytest.mark.parametrize("k", [5, 15])
def test_substring_dedup_matches_bruteforce(ray_session, k):
    """Engine output == per-position boolean-mask reference: duplicated
    windows across docs AND within one doc, overlapping/touching span
    union, sub-k docs, non-ASCII codepoints (char semantics, not bytes)."""
    assert _run(CORPUS, k) == _brute_span_stats(CORPUS, k)


def test_substring_dedup_shuffle_plan_parity(ray_session):
    """The no-broadcast (semi-join + per-group union) plan returns the
    same rows as the broadcast plan."""
    a = _run(CORPUS, 15)
    b = _run(CORPUS, 15, force_shuffle=True)
    assert a == b


def test_substring_dedup_clean_text(ray_session):
    """emit_text=True removes exactly the masked characters, in order
    (per-position boolean-mask reference), including non-ASCII docs and
    the fully-duplicated doc (empty result)."""
    from collections import Counter

    from search_engine_ray.stages.dedup import substring_dedup_stats

    k = 15
    occ = Counter()
    for t in CORPUS.values():
        for i in range(len(t) - k + 1):
            occ[t[i:i + k]] += 1
    expect = {}
    for d, t in CORPUS.items():
        mask = np.zeros(len(t), bool)
        for i in range(len(t) - k + 1):
            if occ[t[i:i + k]] >= 2:
                mask[i:i + k] = True
        expect[d] = "".join(c for c, m in zip(t, mask) if not m)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(CORPUS), pa.int64()),
        "text": pa.array([CORPUS[d] for d in CORPUS], pa.string())}))
    rows = substring_dedup_stats(ds, k=k, emit_text=True).take_all()
    got = {r["doc_id"]: r["clean_text"] for r in rows}
    assert got == expect
    # doc 5 is pure self-repetition: everything masked
    assert got[5] == ""
    with pytest.raises(ValueError, match="broadcast"):
        substring_dedup_stats(ds, k=k, emit_text=True, force_shuffle=True)


def test_substring_dedup_random_fuzz(ray_session):
    """Randomized corpora over a tiny alphabet (dense collisions, heavy
    overlap, empty docs) vs the boolean-mask reference, k in {3, 5, 8} —
    guards the reduceat interval-union arithmetic's edge cases."""
    rng = np.random.default_rng(57)
    for trial in range(4):
        k = int(rng.choice([3, 5, 8]))
        texts = {}
        for d in range(12):
            L = int(rng.integers(0, 60))
            texts[d] = "".join(chr(97 + c) for c in rng.integers(0, 3, L))
        assert _run(texts, k) == _brute_span_stats(texts, k), (trial, k)


def test_proximity_counter_slop_boundary(ray_session):
    """NEAR/k pair counts: boundary inclusion at exactly slop, unordered
    (b before a counts), multiple pairs per doc, cross-doc isolation."""
    from search_engine_ray.pipelines.phrase import ProximityCounter

    docs = {
        1: "alpha x x beta",            # dist 3 == slop -> 1 pair
        2: "alpha x x x beta",          # dist 4 > slop -> 0
        3: "beta alpha",                # unordered, dist 1 -> 1
        4: "alpha beta alpha",          # pairs (0,1), (2,1) -> 2
        5: "alpha one two",             # no beta -> absent
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    rows = ds.map_batches(
        ProximityCounter,
        fn_constructor_kwargs={"term_a": "alpha", "term_b": "beta",
                               "slop": 3},
        batch_format="pyarrow", concurrency=1).take_all()
    got = {r["doc_id"]: r["n_pairs"] for r in rows}
    assert got == {1: 1, 3: 1, 4: 2}


def test_ngram_containment_finds_subset(ray_session):
    """Containment (|A∩B| / min) catches a small doc embedded in a much
    larger one that symmetric Jaccard misses at the same threshold."""
    from search_engine_ray.stages.dedup import (ngram_containment_pairs,
                                                ngram_jaccard_pairs)

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    big = filler + " " + small + " " + " ".join(
        f"p{i} q{i} r{i}" for i in range(40))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([small, big], pa.string())}))
    cont = ngram_containment_pairs(ds, n=3, threshold=0.8,
                                   max_shingle_df=50).take_all()
    assert [(r["doc_a"], r["doc_b"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0          # fully contained
    jac = ngram_jaccard_pairs(ds, n=3, threshold=0.8,
                              max_shingle_df=50).take_all()
    assert jac == []                              # Jaccard blind to subsets


def test_substring_dedup_all_unique(ray_session):
    """A corpus with no duplicated window yields all-zero stats rows."""
    rng = np.random.default_rng(41)
    texts = {i: "".join(chr(97 + c) for c in rng.integers(0, 26, 40))
             for i in range(5)}
    got = _run(texts, 15)
    for d, t in texts.items():
        assert got[d] == (len(t), max(len(t) - 14, 0), 0, 0, 0)


def test_curate_corpus_end_to_end(ray_session):
    """Gate, language filter, dedup winner, scrub and accounting on a
    corpus built to exercise every branch (the parquet fixtures have no
    exact duplicates, so the dedup arm needs a synthetic witness)."""
    from search_engine_ray.pipelines.curate import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs off into the woods to find a meal for the day")
    dup = good                                   # exact copy: loses to id 1
    short = "the cat"                            # fails min_tokens
    nostop = " ".join(f"tok{i}" for i in range(30))  # fails stop gate
    russian = ("съешь же ещё этих мягких французских булок " * 5
               + "and the " * 10)                # cyrillic -> dropped
    pii = good + " mail bob@example.com ip 10.0.0.1 call +1 (555) 123-4567"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([good, dup, short, nostop, russian, pii],
                         pa.string()),
    }))
    rows = {r["doc_id"]: r for r in curate_corpus(ds).take_all()}
    assert set(rows) == {1, 6}                   # 2 deduped, 3-5 gated
    assert rows[1]["text"] == good
    assert rows[1]["n_pii"] == 0
    assert rows[6]["n_pii"] == 3
    assert "<EMAIL>" in rows[6]["text"] and "<IP>" in rows[6]["text"] \
        and "<PHONE>" in rows[6]["text"]
    assert "bob@example.com" not in rows[6]["text"]
    n_tok = len(good.split())
    assert rows[1]["n_tokens"] == n_tok
    # subwords: ceil(len/4) per [a-z]+ token of the ORIGINAL text
    assert rows[1]["n_subwords"] == sum(
        (len(w) + 3) // 4 for w in good.split())


# --------------------------------------------------------------------------
# TPC-H Q5 / Q10 composed joins + grouped bivariate moments: the entry and
# its SQL oracle replayed over a SYNTHETIC mini-warehouse (FK-consistent,
# with date-boundary rows and half-cent prices to exercise the floor(+0.5)
# contract) — the same compare the driver runs, but on controlled data.
# --------------------------------------------------------------------------

def _entry_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "re5_", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _mini_tpch(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(55)
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA", "EUROPE"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(list(range(6)), pa.int32()),
        "n_name": pa.array(["BRAZIL", "NATION_1", "NATION_2", "JAPAN",
                            "FRANCE", "GERMANY"]),
        "n_regionkey": pa.array([0, 1, 1, 1, 2, 2], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(list(range(1, 21)), pa.int64()),
        "s_name": pa.array([f"S{i}" for i in range(1, 21)]),
        "s_nationkey": pa.array(rng.integers(0, 6, 20), pa.int32()),
        "s_acctbal": pa.array(rng.uniform(-100, 100, 20)),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(1, 51)), pa.int64()),
        "c_name": pa.array([f"C{i}" for i in range(1, 51)]),
        "c_nationkey": pa.array(rng.integers(0, 6, 50), pa.int32()),
        # exact half cents land on FLOOR(x*100+0.5) both sides
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 999, 50), 3)),
        "c_mktsegment": pa.array(rng.choice(["BUILDING", "AUTO"], 50)),
    }), str(tmp_path / "customer.parquet"))
    n_ord = 300
    # dates hit both boundaries: 1996-01-01 inclusive, 1997-01-01 exclusive
    days = rng.integers(0, 1100, n_ord)
    dates = (pd.Timestamp("1995-06-01")
             + pd.to_timedelta(days, unit="D")).astype("datetime64[us]")
    dates = dates.insert(0, pd.Timestamp("1996-01-01")) \
        .insert(0, pd.Timestamp("1996-12-31")) \
        .insert(0, pd.Timestamp("1997-01-01"))
    n_ord = len(dates)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, n_ord + 1)), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, 51, n_ord), pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_ord),
        "o_totalprice": pa.array(rng.uniform(10, 1000, n_ord)),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], n_ord)),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array(list(range(1, 100)), pa.int64()),
        # realistic two-word names so LIKE '%widget%' (Q9) has matches
        "p_name": pa.array(rng.choice(
            ["cold widget", "small widget", "large bolt",
             "blue rod", "green gear"], 99)),
        "p_brand": pa.array(rng.choice(
            ["Brand#12", "Brand#15", "Brand#23", "Brand#31"], 99)),
        "p_type": pa.array(rng.choice(["PROMO", "STANDARD", "SMALL"], 99)),
        "p_size": pa.array(rng.integers(1, 50, 99), pa.int32()),
        "p_retailprice": pa.array(rng.uniform(100, 2000, 99)),
    }), str(tmp_path / "part.parquet"))
    n_li = 1200
    ok = rng.integers(1, n_ord + 1, n_li)
    # two guaranteed large-volume orders so Q18's HAVING > 250 qualifies
    ok[:16] = 1
    ok[16:32] = 2
    lp = rng.integers(1, 100, n_li)
    lp[:40] = 7                       # hot part: Q11's above-2x-mean gate
    price = np.round(rng.uniform(1, 5000, n_li), 2) + 0.005
    price[:40] += 50_000.0            # ... must keep at least one group
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(lp, pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, 21, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 5, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 50, n_li).astype(float)),
        # .995 endings force half-cent rounding decisions
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(["F"] * n_li),
        "l_shipdate": pa.array(
            (pd.Timestamp("1996-01-01") + pd.to_timedelta(
                rng.integers(0, 900, n_li), unit="D"))
            .astype("datetime64[us]"), pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def _duck_with_views(tmp_path, tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", ["tpch_q5", "tpch_q10", "tpch_q18",
                                  "promo_revenue_monthly",
                                  "tpch_q4", "tpch_q6", "tpch_q12",
                                  "tpch_q19", "tpch_q7",
                                  "tpch_q13", "tpch_q16", "tpch_q17",
                                  "tpch_q22", "tpch_q15", "tpch_q11",
                                  "tpch_q9", "tpch_q2", "tpch_q8"])
def test_tpch_entry_matches_oracle(ray_session, tmp_path, name):
    _mini_tpch(tmp_path)
    m = _entry_module()
    out = m.queries()[name](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["region", "nation", "supplier",
                                      "customer", "orders", "lineitem",
                                      "part"])
    exp = con.execute(m.oracle_sql()[name]).df()
    assert list(sorted(out.columns)) == list(sorted(exp.columns))
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c


def test_event_type_corr_matches_oracle(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 2000
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array((pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 90 * 86400, n), unit="s"))
            .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 50, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "view", "purchase"], n)),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["event_type_corr"](str(tmp_path)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["event_type_corr"]).df() \
        .sort_values("event_type").reset_index(drop=True)
    for c in exp.columns:
        assert out[c].tolist() == exp[c].tolist(), c
    # the integer numerators support the float corr exactly
    r = (out.cov_num / np.sqrt(out.varx_num.astype(float)
                               * out.vary_num.astype(float)))
    assert (r.abs() <= 1).all()


def test_props_key_stats_handles_malformed(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    props = ['{"k": 3}', '{"k": -7}', '{"k":12}', 'not json', '{"j": 1}',
             '{"k": "x"}', '{"k": 0}', '{ "k" : 44 }']
    n = len(props)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * n,
                       pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "a", "b", "a", "b"]),
        "value": pa.array([1.0] * n),
        "props": pa.array(props),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["props_key_stats"](str(tmp_path)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["props_key_stats"]).df() \
        .sort_values("event_type").reset_index(drop=True)
    for c in exp.columns:
        assert out[c].tolist() == exp[c].tolist(), c
    assert out.n_bad.sum() == 3      # 'not json', missing k, string k


def test_grouped_zscore_outliers_boundary_exact(ray_session):
    """Per-group flags match a brute-force integer reference, including
    rows EXACTLY on the z^2 boundary (strict >) and constant groups
    (variance 0 -> nothing flagged)."""
    from search_engine_ray.stages.profile import grouped_zscore_outliers

    rng = np.random.default_rng(11)
    g = rng.integers(0, 6, 400)
    x = rng.integers(-50, 51, 400).astype(np.float64)
    g[:20] = 7
    x[:20] = 3.0                                 # constant group: var 0
    # plant unambiguous spikes (uniform data never exceeds 2 sigma)
    spike = np.where(g == 2)[0][:3]
    x[spike] = 4000.0
    tbl = pa.table({"id": pa.array(list(range(400)), pa.int64()),
                    "g": pa.array(g, pa.int64()),
                    "v": pa.array(x / 100.0)})   # cents == x exactly
    out = grouped_zscore_outliers(
        rd.from_arrow(tbl).repartition(5), group_col="g", value_col="v",
        id_col="id", z=2).to_pandas()
    xi = np.floor(x).astype(np.int64)
    want = set()
    for grp in np.unique(g):
        m = g == grp
        n, s, q = int(m.sum()), int(xi[m].sum()), int((xi[m] ** 2).sum())
        for i in np.where(m)[0]:
            lhs = n * int(xi[i]) - s
            if lhs * lhs > 4 * (n * q - s * s):
                want.add(i)
    assert set(out["id"].tolist()) == want
    assert not (out["g"] == 7).any()


def test_events_type_mad_matches_oracle(ray_session, tmp_path):
    """Grouped median/MAD outliers: even-sized groups force interpolated
    medians, duplicated values force rank ties — both must land on the
    same integer surface as the rank-arithmetic SQL."""
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n = 1501  # odd total, mixed odd/even per group
    vals = np.round(rng.uniform(0, 300, n), 2)
    vals[:50] = 7.77            # heavy tie block at one value
    vals[50:60] = 5000.0        # genuine outliers
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array((pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 86400, n), unit="s"))
            .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 40, n), pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_type_mad"](str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_type_mad"]).df() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(exp) and len(out) > 0
    for c in exp.columns:
        assert out[c].tolist() == exp[c].tolist(), c


def test_events_spearman_matches_oracle_and_monotone(ray_session, tmp_path):
    """Heavy x/y ties must resolve identically through numpy lexsort and
    SQL ROW_NUMBER (both tie-break on event_id); a perfectly monotone
    group must collapse to sum_d2 == 0 (rho = 1)."""
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    n = 1200
    ts = (pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 500, n), unit="s")).astype("datetime64[us]")
    vals = np.round(rng.choice([1.0, 2.5, 7.77, 100.0], n), 2)
    types = rng.choice(["a", "b"], n)
    # group "mono": value strictly increases with ts -> rho exactly 1
    ts_m = (pd.Timestamp("2024-02-01") + pd.to_timedelta(
        np.arange(50), unit="s")).astype("datetime64[us]")
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n + 50)), pa.int64()),
        "ts": pa.array(np.concatenate([np.asarray(ts), np.asarray(ts_m)]),
                       pa.timestamp("us")),
        "user_id": pa.array([1] * (n + 50), pa.int64()),
        "event_type": pa.array(list(types) + ["mono"] * 50),
        "value": pa.array(np.concatenate([vals, np.arange(50) * 1.5])),
        "props": pa.array(["{}"] * (n + 50)),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_spearman"](str(tmp_path)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_spearman"]).df() \
        .sort_values("event_type").reset_index(drop=True)
    for c in exp.columns:
        assert out[c].tolist() == exp[c].tolist(), c
    mono = out[out.event_type == "mono"].iloc[0]
    assert mono.n == 50 and mono.sum_d2 == 0


def test_events_iso_weekly_year_boundaries(ray_session, tmp_path):
    """ISO weeks crossing Gregorian years: 2021-01-01 -> (2020, W53),
    2016-01-03 -> (2015, W53), 2001-12-31 -> (2002, W1), plus a leap-year
    sweep — the Thursday-rule kernel must agree with DuckDB ISOYEAR/WEEK
    on every day of 1995-2024."""
    import pandas as pd
    import pyarrow.parquet as pq

    days = pd.date_range("1995-01-01", "2024-12-31", freq="D")
    n = len(days)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array(days.values.astype("datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["t"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    cols = ["iso_year", "iso_week"]
    out = m.queries()["events_iso_weekly"](str(tmp_path)).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_iso_weekly"]).df() \
        .sort_values(cols).reset_index(drop=True)
    assert len(out) == len(exp) > 1500
    for c in exp.columns:
        assert out[c].tolist() == exp[c].tolist(), c


def test_embedding_dim_stats_ragged_lists(ray_session, tmp_path):
    """List-column profiling must agree with SQL unnest/subscripts on
    RAGGED lists (variable lengths, including empty), not just the
    fixed-64 fixture shape."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(31)
    vecs = [list(np.round(rng.uniform(-1, 1, int(rng.integers(0, 9))), 6))
            for _ in range(200)]
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(200)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 200, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    m = _entry_module()
    out = m.queries()["embedding_dim_stats"](str(tmp_path)).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    con = _duck_with_views(tmp_path, ["embeddings"])
    exp = con.execute(m.oracle_sql()["embedding_dim_stats"]).df() \
        .sort_values("dim").reset_index(drop=True)
    assert len(out) == len(exp) > 0
    for c in exp.columns:
        assert out[c].tolist() == exp[c].tolist(), c


def test_jaccard_prefix_matches_bruteforce(ray_session):
    """Prefix-filtered exact Jaccard == brute force at several
    thresholds: shuffled near-duplicates, a high-df shingle cluster,
    identical docs, disjoint docs — NO df cap anywhere."""
    import itertools
    import re

    from search_engine_ray.stages.dedup import jaccard_prefix_pairs

    def brute(texts, n, t):
        sets = {}
        for d, s in texts.items():
            w = re.findall(r"[a-z]+", s.lower())
            sets[d] = set(tuple(w[i:i + n]) for i in range(len(w) - n + 1))
        out = []
        for a, b in itertools.combinations(sorted(texts), 2):
            A, B = sets[a], sets[b]
            if not A or not B:
                continue
            i = len(A & B)
            if i / (len(A) + len(B) - i) >= t:
                out.append((a, b, i))
        return sorted(out)

    rng = np.random.default_rng(9)
    texts = {}
    base = ("the quick brown fox jumps over the lazy dog near "
            "the river bank today").split()
    for d in range(40):
        w = list(base)
        rng.shuffle(w)
        if d % 4 == 0:
            w = base[:12] + [f"extra{d % 3}"]
        texts[d] = " ".join(w)
    texts[100] = "completely different words entirely unrelated here now"
    texts[101] = "completely different words entirely unrelated here now"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array([texts[d] for d in texts], pa.string())})) \
        .repartition(5)
    for n, t in ((3, 0.5), (2, 0.3), (2, 0.9)):
        got = jaccard_prefix_pairs(ds, n=n, threshold=t).to_pandas()
        g = sorted((int(r.doc_a), int(r.doc_b), int(r.n_inter))
                   for r in got.itertuples())
        assert g == brute(texts, n, t), (n, t)
    # the df-shuffle plan (past the broadcast guard) returns the same rows
    got = jaccard_prefix_pairs(ds, n=3, threshold=0.5,
                               force_shuffle=True).to_pandas()
    g = sorted((int(r.doc_a), int(r.doc_b), int(r.n_inter))
               for r in got.itertuples())
    assert g == brute(texts, 3, 0.5)


# --------------------------------------------------------------------------
# Corpus-curation trio: Gopher-rule gate, dedup keep-best finish,
# deterministic split — each replayed against its SQL oracle on a corpus
# built so every rule/branch fires at least once.
# --------------------------------------------------------------------------

def _mini_documents(tmp_path):
    import pyarrow.parquet as pq

    stopful = ("the quick brown fox jumps over the lazy dog and the "
               "cat sits on the mat with a hat and a bat for fun")
    rows = [
        # near-dup family: shared prefix, increasing length -> the
        # LONGEST (id 3), not the smallest id, must survive
        (1, "en", stopful),
        (2, "en", stopful + " extra tail words here"),
        (3, "en", stopful + " extra tail words here and even more of it"),
        # singleton that passes every gopher rule
        (4, "en", "she said that it was all they could do for the day"),
        # fails token count (< 5 tokens)
        (5, "de", "too short text"),
        # fails stopword share (no stopwords at all)
        (6, "de", " ".join(f"zz{i}qq" for i in range(30))),
        # fails distinct share (one token repeated)
        (7, "fr", " ".join(["buffalo"] * 40) + " the and of"),
        # fails mean word length (> 12 letters per token)
        (8, "fr", " ".join("x" * 20 for _ in range(10)) + " the of"),
        # zero-token doc: no agg row in SQL, n_tokens=0 on the Ray side
        (9, "fr", "!!! ??? 123"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.parametrize("name", ["dedup_survivors",
                                  "quality_filter_gopher",
                                  "dataset_split",
                                  "orc_roundtrip",
                                  "partitioned_parquet_roundtrip"])
def test_curation_entry_matches_oracle(ray_session, tmp_path, name):
    _mini_documents(tmp_path)
    m = _entry_module()
    out = m.queries()[name](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["documents"])
    exp = con.execute(m.oracle_sql()[name]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    if name == "dedup_survivors":
        # the near-dup cluster keeps the LONGEST member, not the min id
        winners = set(a["doc_id"])
        assert 3 in winners and 1 not in winners and 2 not in winners
    if name == "quality_filter_gopher":
        kept = set(a["doc_id"])
        assert 4 in kept and not kept & {5, 6, 7, 8, 9}


# --------------------------------------------------------------------------
# Event-time watermark: the inclusive distributed prefix max and the
# late-discard entry, replayed on a corpus with engineered inversions.
# --------------------------------------------------------------------------

def test_ordered_prefix_max_matches_numpy(ray_session):
    """Inclusive running max == numpy maximum.accumulate in sorted order,
    at several parallelism levels, with duplicate order keys broken by a
    second column and negative values included."""
    from search_engine_ray.stages.relational import ordered_prefix_max

    rng = np.random.default_rng(19)
    n = 400
    k1 = rng.integers(0, 40, n)          # heavy ties
    k2 = np.arange(n)
    rng.shuffle(k2)                       # unique tie-break
    v = rng.integers(-1000, 1000, n)
    order = np.lexsort((k2, k1))
    expect = dict(zip(zip(k1[order], k2[order]),
                      np.maximum.accumulate(v[order])))
    t = pa.table({"k1": pa.array(k1, pa.int64()),
                  "k2": pa.array(k2, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    for parts in (1, 3, 17):
        ds = rd.from_arrow(t).repartition(parts)
        out = ordered_prefix_max(ds, order_cols=["k1", "k2"],
                                 value_col="v").take_all()
        got = {(r["k1"], r["k2"]): r["run_max"] for r in out}
        assert got == expect, parts


def test_events_watermark_matches_oracle(ray_session, tmp_path):
    """Late rows (engineered arrival inversions) drop identically on both
    sides; on-time boundary (exactly watermark - 600) is kept."""
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    n = 500
    base = 1_700_000_000
    ts_sec = base + np.sort(rng.integers(0, 50_000, n))
    # force boundary cases: one event exactly 600 s late, one 601 s late
    ts_sec[10] = ts_sec[9]          # tie
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts_sec, unit="s")
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 50, n), pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(rng.uniform(0, 10, n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_watermark"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_watermark"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    # the jitter must actually drop something, or this test is vacuous
    total_kept = int(a["n_events"].sum())
    assert total_kept < n


def test_keep_best_per_cluster_minhash_matches_exact_twin(ray_session):
    """On a corpus of EXACT copies (LSH recall is certain: identical
    texts -> identical signatures -> every band collides) the production
    path (minhash pairs -> keep_best) returns the same surviving corpus
    as the exact-Jaccard twin, and both keep min-id per tied cluster and
    every singleton."""
    from search_engine_ray.stages.dedup import (keep_best_per_cluster,
                                                minhash_lsh_pairs,
                                                ngram_jaccard_pairs)

    a = ("the quick brown fox jumps over the lazy dog and runs far "
         "away into the deep dark woods tonight")
    b = ("completely different content about database engines and "
         "distributed query processing at large scale")
    docs = {1: a, 2: a, 7: a,            # exact-copy cluster, min id 1
            4: b, 5: b,                  # second cluster, min id 4
            6: "a unique singleton document with its own words"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array([docs[d] for d in docs], pa.string())})) \
        .repartition(3)

    def survivors(pairs):
        rows = keep_best_per_cluster(ds, pairs).take_all()
        return sorted((r["cluster"], r["doc_id"], r["n_chars"])
                      for r in rows)

    got_mh = survivors(minhash_lsh_pairs(ds, threshold=0.5))
    got_ex = survivors(ngram_jaccard_pairs(ds, n=3, threshold=0.5,
                                           max_shingle_df=50))
    assert got_mh == got_ex
    assert [r[1] for r in got_mh] == sorted([1, 4, 6])
    assert all(c == d for c, d, _ in got_mh)   # survivor id = cluster id here


def test_events_winsorized_matches_oracle(ray_session, tmp_path):
    """Winsorized per-type sums: exact quantile_disc bounds (element
    semantics, ties included) and the clip — checked against the CASE
    oracle on a fixture with heavy outliers and a constant-valued type
    (lo == hi: everything clips to one value)."""
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(31)
    n = 400
    vals = rng.uniform(0, 10, n)
    vals[:8] = 9_999.99               # heavy upper outliers
    vals[8:12] = 0.0                  # exact-boundary lows
    et = rng.choice(["a", "b"], n).astype(object)
    et[:30] = "const"
    vals[:30] = 5.25                  # constant group: lo == hi
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(
            1_700_000_000 + np.arange(n), unit="s")
            .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 50, n), pa.int64()),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_winsorized"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_winsorized"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) == 3
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    r = a[a["event_type"] == "const"].iloc[0]
    assert r["lo_c"] == r["hi_c"] == 525
    assert r["win_sum_c"] == 525 * 30


# --------------------------------------------------------------------------
# TPC-H Q21 / Q20 shapes (round-5 completion of the 22-query set) and the
# fuzzy term query — engineered micro-corpora where every branch (peer
# EXISTS, sole-failure NOT EXISTS, status filter, nation slice, dominance
# threshold, distance-1 band) has a positive AND a negative witness.
# --------------------------------------------------------------------------

def _mini_q2021(tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3, 4, 5], pa.int32()),
        "n_name": pa.array(["NATION_1", "NATION_3", "NATION_5",
                            "NATION_7", "NATION_11", "NATION_99"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "s_name": pa.array([f"S{i}" for i in range(1, 7)]),
        # supp4/supp6 sit OUTSIDE both nation slices
        "s_nationkey": pa.array([0, 1, 2, 5, 3, 5], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, 11)), pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O", "F",
                                   "F", "F", "O", "O", "O"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "p_name": pa.array(["red widget", "red bolt", "blue gear",
                            "red rod", "green gear"]),
    }), str(tmp_path / "part.parquet"))
    # (okey, pkey, skey, qty, rflag)
    rows = [
        # Q21 witnesses (part 3 = blue gear keeps them out of Q20):
        (1, 3, 1, 1.0, "R"), (1, 3, 1, 1.0, "R"), (1, 3, 2, 1.0, "A"),
        # -> order 1 (F): sole failing supp1, 2 failing rows -> +2
        (2, 3, 1, 1.0, "R"), (2, 3, 2, 1.0, "R"), (2, 3, 3, 1.0, "A"),
        # -> order 2: TWO failing suppliers -> excluded
        (3, 3, 1, 1.0, "R"),
        # -> order 3: no peer supplier -> excluded
        (4, 3, 1, 1.0, "R"), (4, 3, 2, 1.0, "A"),
        # -> order 4 is status O -> excluded
        (5, 3, 3, 1.0, "R"), (5, 3, 2, 1.0, "A"),
        # -> order 5: sole failing supp3 -> +1
        (6, 3, 4, 1.0, "R"), (6, 3, 5, 1.0, "A"),
        # -> order 6: sole failing supp4, but NATION_99 -> nation-sliced
        (7, 3, 1, 1.0, "A"), (7, 3, 2, 1.0, "A"),
        # -> order 7: no failure at all -> excluded
        # Q20 witnesses (orders 8-10 are status O, rflag A -> inert
        # for Q21).  part1: supp2 dominates (100 * 3 > 2 * 120), split
        # across two rows to exercise the pair-level sum:
        (8, 1, 1, 10.0, "A"), (8, 1, 2, 60.0, "A"), (9, 1, 2, 40.0, "A"),
        (9, 1, 3, 10.0, "A"),
        # part2: balanced -> nobody dominates
        (8, 2, 2, 50.0, "A"), (9, 2, 3, 50.0, "A"),
        # part4: supp6 dominates but sits in NATION_99 -> sliced out
        (9, 4, 6, 100.0, "A"), (10, 4, 5, 10.0, "A"), (10, 4, 1, 10.0, "A"),
        # part5 is not 'red %' -> name-filtered no matter the volume
        (10, 5, 5, 500.0, "A"),
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_quantity": pa.array([r[3] for r in rows], pa.float64()),
        "l_returnflag": pa.array([r[4] for r in rows], pa.string()),
    }), str(tmp_path / "lineitem.parquet"))


@pytest.mark.parametrize("name", ["tpch_q21", "tpch_q20"])
def test_tpch_q2021_matches_oracle(ray_session, tmp_path, name):
    _mini_q2021(tmp_path)
    m = _entry_module()
    out = m.queries()[name](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["nation", "supplier", "orders",
                                      "part", "lineitem"])
    exp = con.execute(m.oracle_sql()[name]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    if name == "tpch_q21":
        got = dict(zip(a["s_suppkey"], a["numwait"]))
        assert got == {1: 2, 3: 1}          # engineered winners only
    else:
        got = dict(zip(a["s_suppkey"], a["n_dom"]))
        assert got == {2: 1}                # supp6 nation-sliced out


def test_search_fuzzy_matches_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "en"]),
        # doc1: tabls(d0) table(d1) tables(d1) tbls(d1) stable(d>=2)
        # doc2: ONLY distance-2 near-misses -> must not appear at all
        # doc3: one matched term, tf=3 -> rollup witness
        "text": pa.array([
            "tabls table tables tbls stable",
            "cable fable tablet",
            "table table table word",
        ]),
    }), str(tmp_path / "documents.parquet"))
    m = _entry_module()
    out = m.queries()["search_fuzzy"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["documents"])
    exp = con.execute(m.oracle_sql()["search_fuzzy"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) == 2
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    byid = {r.doc_id: (r.n_terms, r.sum_tf) for r in a.itertuples()}
    assert byid == {1: (4, 4), 3: (1, 3)}


def test_global_row_number_matches_lexsort(ray_session):
    """Dense global ranks == numpy lexsort reference at several
    parallelism levels, mixed ASC/DESC directions, with heavy ties on
    the primary key broken by a unique secondary."""
    from search_engine_ray.stages.relational import global_row_number

    rng = np.random.default_rng(71)
    n = 500
    v = rng.integers(-50, 50, n)          # heavy ties
    eid = np.arange(1, n + 1)
    rng.shuffle(eid)
    # ORDER BY v DESC, eid ASC  ->  lexsort minor-to-major
    order = np.lexsort((eid, -v))
    expect = {int(eid[j]): r + 1 for r, j in enumerate(order)}
    t = pa.table({"eid": pa.array(eid, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    for parts in (1, 4, 13):
        ds = rd.from_arrow(t).repartition(parts)
        out = global_row_number(ds, order_cols=["v", "eid"],
                                descending=[True, False]).take_all()
        got = {r["eid"]: r["rnk"] for r in out}
        assert got == expect, parts


def test_events_global_rank_matches_oracle(ray_session, tmp_path):
    """Entry vs DuckDB ROW_NUMBER on an engineered fixture: NULL values
    excluded on both sides, cent-floor ties (1.231 vs 1.239) broken by
    event_id, negatives floor away from zero identically."""
    import pandas as pd
    import pyarrow.parquet as pq

    n = 300
    rng = np.random.default_rng(77)
    vals = rng.uniform(-5, 5, n).astype(object)
    vals[5] = None
    vals[17] = None
    # vals[i] belongs to event_id i+1: events 21/22 share cent bucket 123
    vals[20], vals[21] = 1.231, 1.239
    ts_sec = 1_700_000_000 + np.arange(n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts_sec, unit="s")
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 20, n), pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(list(vals), pa.float64()),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_global_rank"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_global_rank"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) == n - 2
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    # cent-tie must break by event_id: 21 ranks immediately before 22
    r = dict(zip(a["event_id"], a["rnk"]))
    assert r[22] == r[21] + 1


def test_fold_accents_matches_duckdb(ray_session, tmp_path):
    """lower(strip_accents()) parity on accent-heavy synthetic docs:
    precomposed AND decomposed inputs, Turkish dotted-I, Cyrillic,
    pass-through ß/ø/ł, NULL text."""
    import pyarrow.parquet as pq

    texts = ["Café au LAIT", "naı̈ve", "İstanbul KADIKOY",
             "ГОРОД Москва", "groß øre Łuk", None,
             "élève précis"]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
    }), str(tmp_path / "documents.parquet"))
    m = _entry_module()
    out = m.queries()["fold_accents_docs"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["documents"])
    exp = con.execute(m.oracle_sql()["fold_accents_docs"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) == len(texts)
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    folded = dict(zip(out["doc_id"], out["folded_text"]))
    assert folded[1].startswith("cafe au lait")
    assert folded[7].startswith("eleve precis")    # decomposed input folds


def test_bigram_lm_plans_and_oracle(ray_session, tmp_path):
    """Broadcast and shuffle plans return identical rows, both match the
    DuckDB bigram oracle on an engineered corpus (repeated boilerplate
    doc scores ~0 nats; empty and one-token docs come back with zero
    bigrams), and context probabilities sum to 1 by construction."""
    import pyarrow.parquet as pq

    from search_engine_ray.stages.lm import bigram_logprob_stats

    texts = [
        "the cat sat on the mat the cat sat again",
        "buy now buy now buy now buy now",        # boilerplate: P(now|buy)=1
        "completely different words entirely here",
        "",                                        # no tokens
        "single",                                  # one token, no bigram
        None,
        "the cat ran off the mat quickly today",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
    }), str(tmp_path / "documents.parquet"))
    m = _entry_module()
    out = m.queries()["doc_ppl_bigram"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["documents"])
    exp = con.execute(m.oracle_sql()["doc_ppl_bigram"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) == len(texts)
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    rowmap = {r.doc_id: (r.n_bigrams, r.sum_logp2_q) for r in a.itertuples()}
    assert rowmap[4] == (0, 0) and rowmap[5] == (0, 0)
    # P(now|buy) = 1 and P(buy|now) = 1 within doc 2's chain: only the
    # sentence-internal transitions cost anything -> score exactly 0
    assert rowmap[2][0] == 7 and rowmap[2][1] == 0
    # plan parity: shuffle == broadcast, bit-exact
    import ray.data as rd2
    docs = rd2.read_parquet(str(tmp_path / "documents.parquet"),
                            columns=["doc_id", "text"])
    sh = bigram_logprob_stats(docs, force_shuffle=True).to_pandas()
    s = sh[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert s[c].tolist() == a[c].tolist(), c


def test_pmi_keywords_plans_and_oracle(ray_session, tmp_path):
    """Engineered two-language corpus: a lang-exclusive term tops its
    language (max PMI), a uniform cross-language term scores ~0, the
    rare-term guard drops below-min_count cells, broadcast == shuffle
    plan bit-exact, and both match DuckDB."""
    import pyarrow.parquet as pq

    from search_engine_ray.stages.lm import pmi_keywords

    en = "common shared words appear here " * 3 + "python exclusive gem " * 2
    fr = "common shared words appear here " * 3 + "baguette exclusive vin " * 2
    texts = [en] * 5 + [fr] * 5 + ["rareword only once"]
    langs = ["en"] * 5 + ["fr"] * 5 + ["en"]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, 12)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    m = _entry_module()
    out = m.queries()["lang_pmi_keywords"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["documents"])
    exp = con.execute(m.oracle_sql()["lang_pmi_keywords"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    top_en = out[(out["lang"] == "en") & (out["rank"] == 1)]["term"].iloc[0]
    top_fr = out[(out["lang"] == "fr") & (out["rank"] == 1)]["term"].iloc[0]
    assert top_en in ("python", "gem")        # en-exclusive, tie on pmi_q
    assert top_fr in ("baguette", "vin")
    assert "rareword" not in set(out["term"])  # min_count guard
    # plan parity
    import ray.data as rd2
    docs = rd2.read_parquet(str(tmp_path / "documents.parquet"),
                            columns=["lang", "text"])
    sh = pmi_keywords(docs, k=10, min_count=5,
                      force_shuffle=True).to_pandas()
    s = sh[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert s[c].tolist() == a[c].tolist(), c


def test_term_drift_matches_oracle(ray_session, tmp_path):
    """Engineered snapshots: a term EXCLUSIVE to side A gets a large
    positive log-odds (finite thanks to the Haldane 0.5), a balanced
    term sits near 0, min_total drops rare terms; bit-exact vs DuckDB."""
    import pyarrow.parquet as pq

    a = "surge boom balanced words everywhere " * 4
    b = "crash drop balanced words everywhere " * 4
    texts, ids = [], []
    for i in range(12):
        ids.append(i)
        texts.append(a if i % 2 == 0 else b)
    texts[0] += " rare rare"          # below min_total across both sides
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids)),
    }), str(tmp_path / "documents.parquet"))
    m = _entry_module()
    out = m.queries()["term_drift"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["documents"])
    exp = con.execute(m.oracle_sql()["term_drift"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    x = out[cols].sort_values(cols).reset_index(drop=True)
    y = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(x) == len(y) > 0
    for c in cols:
        assert x[c].tolist() == y[c].tolist(), c
    r = {t.term: t for t in out.itertuples()}
    assert "rare" not in r
    assert r["surge"].n_b == 0 and r["surge"].logodds_q > 0
    assert r["crash"].n_a == 0 and r["crash"].logodds_q < 0
    assert abs(r["balanced"].logodds_q) < abs(r["surge"].logodds_q)


def test_rolling_distinct_bruteforce_and_oracle(ray_session, tmp_path):
    """Fuzz the dominance-scan COUNT(DISTINCT) against a per-row brute
    force (heavy ts ties = shared peer frames, tiny type alphabet =
    dense repeats), then the entry vs DuckDB's native DISTINCT window
    aggregate on the same fixture."""
    import pandas as pd
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.windows import rolling_distinct_time

    rng = np.random.default_rng(97)
    n = 600
    uid = rng.integers(1, 8, n)
    base = 1_700_000_000
    ts_sec = base + rng.integers(0, 3000, n)       # many exact ties
    et = rng.choice(["view", "click", "buy"], n)
    W = 600
    # brute force per row: distinct types of same-user rows in
    # [ts-600, ts] inclusive (peer rows regardless of event_id order)
    expect = {}
    for i in range(n):
        m = (uid == uid[i]) & (ts_sec >= ts_sec[i] - W) & \
            (ts_sec <= ts_sec[i])
        expect[i + 1] = len(set(et[m]))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts_sec, unit="s")
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et),
        "value": pa.array(rng.uniform(0, 10, n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_rolling_distinct"](str(tmp_path)).to_pandas()
    got = dict(zip(out["event_id"], out["win_distinct"]))
    assert got == expect
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_rolling_distinct"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c


def test_partitioned_sink_resume_and_idempotency(ray_session, tmp_path):
    """The three resume contracts of sources/sink.write_partitioned:
    (1) committed shards skip on resume; (2) a shard that crashed AFTER
    renaming some partition files but BEFORE its marker re-runs and
    overwrites its own deterministic names — no duplicate rows; (3) the
    resumed output is value-identical to a one-shot run."""
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.sources.sink import write_partitioned

    rng = np.random.default_rng(31)
    n = 200
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array(rng.choice(["en", "ru", "de"], n)),
        "text": pa.array([f"doc {i}" for i in range(n)]),
    })
    shards = []
    for i in range(4):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(t.slice(i * 50, 50), p)
        shards.append(p)

    ref_root = str(tmp_path / "oneshot")
    os.makedirs(ref_root)
    write_partitioned(shards, ref_root, partition_col="lang")

    root = str(tmp_path / "resumed")
    os.makedirs(root)
    a1 = write_partitioned(shards[:2], root, partition_col="lang")
    assert a1["skipped"].to_pylist() == [False, False]
    # simulate crash-mid-shard on shard 2: its partition files exist
    # (deterministic names) but the marker does not
    a_partial = write_partitioned([shards[2]], root, partition_col="lang")
    assert a_partial["skipped"].to_pylist() == [False]
    from search_engine_ray.sources.sink import _shard_tag
    os.remove(os.path.join(root, "_done", _shard_tag(shards[2]) + ".done"))
    a2 = write_partitioned(shards, root, partition_col="lang")
    sk = dict(zip([os.path.basename(p) for p in a2["path"].to_pylist()],
                  a2["skipped"].to_pylist()))
    assert sk == {"in-0.parquet": True, "in-1.parquet": True,
                  "in-2.parquet": False, "in-3.parquet": False}

    def load(r):
        import glob
        rows = []
        for f in glob.glob(f"{r}/lang=*/*.parquet"):
            lang = f.split("lang=")[1].split("/")[0]
            tt = pq.read_table(f)
            for rec in tt.to_pylist():
                rows.append((rec["doc_id"], lang, rec["text"]))
        return sorted(rows)

    assert load(root) == load(ref_root)
    assert len(load(root)) == n                      # no duplicates


def test_events_quarantine_priority_and_oracle(ray_session, tmp_path):
    """Every route has a witness; a row violating MULTIPLE rules lands
    on the highest-priority one only (error event that also has a bad
    value and an oversized k); NULL value/props route correctly."""
    import pandas as pd
    import pyarrow.parquet as pq

    rows = [
        # (event_type, value, props)            -> expected route
        ("error", 999.0, '{"k": 95}'),          # all three -> error_event
        ("click", -1.0, '{"k": 95}'),           # two -> value_range
        ("click", None, '{"k": 1}'),            # NULL value -> value_range
        ("view", 5.0, '{"k": 91}'),             # props_k_high
        ("view", 5.0, '{"k": 90}'),             # boundary k -> ok
        ("view", 150.0, '{"k": 1}'),            # boundary value -> ok
        ("view", 3.0, None),                    # NULL props -> ok
        ("purchase", 2.0, "not json"),          # unparseable -> ok
    ]
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(
            1_700_000_000 + np.arange(n), unit="s")
            .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(np.ones(n, np.int64), pa.int64()),
        "event_type": pa.array([r[0] for r in rows]),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": pa.array([r[2] for r in rows], pa.string()),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_quarantine"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_quarantine"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    got = {r.rule: r.n_rows for r in out.itertuples()}
    assert got == {"error_event": 1, "value_range": 2,
                   "props_k_high": 1, "ok": 4}


def test_column_entropy_matches_scipy_formula(ray_session, tmp_path):
    """Entropy recovered from the integer surface equals the direct
    -sum(p ln p) within quantization error (1e-4 nats per distinct
    value); constant column -> H == 0 exactly; NULLs fold to one
    sentinel value on both sides; oracle parity."""
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(41)
    n = 500
    et = rng.choice(["a", "b", "c", "d"], n, p=[0.7, 0.2, 0.05, 0.05])
    et = et.astype(object)
    et[::50] = None                      # NULL bucket
    uid = np.ones(n, np.int64)           # constant -> zero entropy
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(1_700_000_000 + np.arange(n),
                                      unit="s").astype("datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(rng.uniform(0, 1, n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_entropy"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_entropy"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    r = {x.column: x for x in out.itertuples()}
    # H from the integer surface vs direct computation
    vals, cnts = np.unique(np.array(
        ["__null__" if v is None else v for v in et], object),
        return_counts=True)
    p = cnts / n
    h_direct = float(-(p * np.log(p)).sum())
    h_q = np.log(r["event_type"].n) \
        - r["event_type"].sum_clnc_q / (1e4 * r["event_type"].n)
    assert abs(h_q - h_direct) < 1e-4 * len(vals)
    assert r["user_id"].ndv == 1 and r["user_id"].sum_clnc_q == \
        int(np.floor(n * np.log(n) * 1e4 + 0.5))


def test_compression_ratio_quality_ordering(ray_session, tmp_path):
    """The Gopher-proxy property the operator exists for: repetitive
    boilerplate << natural prose << incompressible noise; empty doc is
    well-defined (ratio of the 8-byte zlib header over max(n,1))."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    noise = "".join(chr(33 + c) for c in rng.integers(0, 90, 4000))
    texts = {
        1: "spam " * 800,                               # repetitive
        2: ("the quick brown fox jumps over the lazy dog and keeps "
            "running through fields of barley while the sun sets ") * 40,
        3: noise,                                       # incompressible
        4: "",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
        "lang": pa.array(["en"] * 4),
    }), str(tmp_path / "documents.parquet"))
    m = _entry_module()
    out = m.queries()["doc_compression_ratio"](str(tmp_path)).to_pandas()
    r = dict(zip(out["doc_id"], out["ratio_q"]))
    assert r[1] < r[2] < r[3]
    assert r[1] < 300                                  # boilerplate: <3%
    assert r[3] > 8000                                 # noise: >80%
    n = dict(zip(out["doc_id"], out["n_bytes"]))
    assert n[4] == 0 and r[4] > 0


def test_resample_audio_block_mean_floor(ray_session):
    """Decimation spec against a hand-computed signal: true floor on
    negative block sums, trailing-sample drop at odd length, factor 3,
    and stereo channel-0 selection."""
    from search_engine_ray.stages.multimodal import (ResampleAudio,
                                                     encode_wav)

    s = np.array([5, 6, -5, -6, 7, 0, 9], np.int16)   # len 7, factor 2
    # blocks: (5,6)->5, (-5,-6)->-6 (floor!), (7,0)->3; trailing 9 drops
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_wav(s, rate=8000)], pa.binary())}))
    r = ds.map_batches(ResampleAudio, fn_constructor_kwargs={"factor": 2},
                       batch_format="pyarrow", concurrency=1).take_all()[0]
    assert (r["n_in"], r["n_out"], r["rate_out"]) == (7, 3, 4000)
    assert r["sum_out"] == 5 - 6 + 3 and r["sum_abs_out"] == 5 + 6 + 3
    # factor 3: (5,6,-5)->2, (-6,7,0)->0 (floor(1/3)=0); trailing 9 drops
    r3 = ds.map_batches(ResampleAudio, fn_constructor_kwargs={"factor": 3},
                        batch_format="pyarrow", concurrency=1).take_all()[0]
    assert (r3["n_out"], r3["rate_out"]) == (2, 2666)
    assert r3["sum_out"] == 2 + 0


def test_event_transitions_matches_oracle(ray_session, tmp_path):
    """Per-user chains split correctly (no cross-user transition), ties
    break by event_id identically, single-event users emit nothing."""
    import pandas as pd
    import pyarrow.parquet as pq

    # user 1: a->b->b->c ; user 2: c->a ; user 3: single event (none);
    # user 4: tie ts resolved by event_id -> a->c->b
    rows = [
        (1, 1, 100, "a"), (2, 1, 110, "b"), (3, 1, 120, "b"),
        (4, 1, 130, "c"),
        (5, 2, 100, "c"), (6, 2, 105, "a"),
        (7, 3, 100, "b"),
        (8, 4, 200, "a"), (9, 4, 210, "c"), (10, 4, 210, "b"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([1_700_000_000 + r[2] for r in rows],
                                      unit="s").astype("datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["event_transitions"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["event_transitions"]).df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1,
                   ("c", "a"): 1, ("a", "c"): 1, ("c", "b"): 1}


def test_global_ntile_uneven_split(ray_session, tmp_path):
    """n=103, k=10: DuckDB gives the first 3 tiles 11 rows and the rest
    10 — the engine's rank arithmetic must match exactly, including a
    NULL-value row excluded on both sides."""
    import pandas as pd
    import pyarrow.parquet as pq

    n = 104
    rng = np.random.default_rng(11)
    vals = rng.uniform(-3, 3, n).astype(object)
    vals[7] = None                       # -> 103 ranked rows
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(1_700_000_000 + np.arange(n),
                                      unit="s").astype("datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(np.ones(n, np.int64)),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(list(vals), pa.float64()),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    m = _entry_module()
    out = m.queries()["events_global_ntile"](str(tmp_path)).to_pandas()
    con = _duck_with_views(tmp_path, ["events"])
    exp = con.execute(m.oracle_sql()["events_global_ntile"]).df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) == n - 1
    for c in cols:
        assert a[c].tolist() == b[c].tolist(), c
    sizes = out.groupby("tile").size().to_dict()
    assert sizes == {t: (11 if t <= 3 else 10) for t in range(1, 11)}


def test_jaro_winkler_scores_bitexact_vs_duckdb():
    """The vectorized JW scorer == DuckDB jaro_winkler_similarity to the
    BIT on random multibyte strings (the similar_docs_jw oracle
    contract): same byte alphabet, window, transpositions, boost, and
    the empty/equal edge rules."""
    import random
    import struct

    import duckdb

    from search_engine_ray.stages.strings import (_codes,
                                                  jaro_winkler_scores)

    rng = random.Random(11)
    strings = ["".join(rng.choice("abcd é日")
                       for _ in range(rng.randint(0, 20)))
               for _ in range(120)]
    codes, lens = _codes(strings)
    ia, ib = np.triu_indices(len(strings), k=1)
    got = jaro_winkler_scores(codes, lens, ia, ib)
    con = duckdb.connect()
    sample = rng.sample(range(len(ia)), 1200)
    for k in sample:
        exp = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                          [strings[ia[k]], strings[ib[k]]]).fetchone()[0]
        assert struct.pack("d", got[k]) == struct.pack("d", exp), (
            strings[ia[k]], strings[ib[k]], got[k], exp)


def test_jaro_winkler_pairs_matches_duckdb(ray_session):
    """End-to-end blocked self-join parity incl. the micro-int floor."""
    import duckdb
    import pandas as pd

    from search_engine_ray.stages.strings import jaro_winkler_pairs

    rng = np.random.RandomState(7)
    words = ["martha", "marhta", "dwayne", "duane", "dixon", "dicksonx",
             "jellyfish", "smellyfish", "ветер", "вечер"]
    rows = []
    for i in range(90):
        w = words[rng.randint(len(words))]
        if rng.rand() < 0.4:
            pos = rng.randint(len(w))
            w = w[:pos] + chr(97 + rng.randint(26)) + w[pos + 1:]
        rows.append((i, w + " tail", ["en", "ru"][rng.randint(2)]))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = jaro_winkler_pairs(rd.from_pandas(df), prefix_len=12,
                             threshold_micro=850000) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ref = duckdb.sql("""
        WITH p AS (SELECT doc_id, lang, substr(text, 1, 12) AS s FROM df)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(FLOOR(jaro_winkler_similarity(a.s, b.s) * 1000000)
                    AS BIGINT) AS jw_micro
        FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(FLOOR(jaro_winkler_similarity(a.s, b.s) * 1000000)
                   AS BIGINT) >= 850000
        ORDER BY id_a, id_b""").fetchdf()
    assert len(out) > 0
    assert out["id_a"].tolist() == ref["id_a"].tolist()
    assert out["id_b"].tolist() == ref["id_b"].tolist()
    assert out["jw_micro"].tolist() == ref["jw_micro"].tolist()


def test_damerau_levenshtein_true_variant_vs_duckdb():
    """The DL verify kernel == DuckDB damerau_levenshtein on random
    multibyte strings, including the case separating true DL from OSA
    (CA/ABC = 2, where OSA says 3)."""
    import random

    import duckdb

    from search_engine_ray.stages.strings import (
        _codes, damerau_levenshtein_pairs)

    strings = ["CA", "ABC"]
    rng = random.Random(5)
    strings += ["".join(rng.choice("abc é日")
                        for _ in range(rng.randint(0, 14)))
                for _ in range(100)]
    codes, lens = _codes(strings)
    ia, ib = np.triu_indices(len(strings), k=1)
    got = damerau_levenshtein_pairs(codes, lens, ia, ib)
    assert got[0] == 2  # CA -> ABC: unrestricted transposition + insert
    con = duckdb.connect()
    for k in rng.sample(range(len(ia)), 1000):
        exp = con.execute("SELECT damerau_levenshtein(?, ?)",
                          [strings[ia[k]], strings[ib[k]]]).fetchone()[0]
        assert got[k] == exp, (strings[ia[k]], strings[ib[k]], got[k], exp)


def test_edit_distance_pairs_damerau_variant(ray_session):
    """Blocked self-join end-to-end with variant='damerau' == DuckDB."""
    import duckdb
    import pandas as pd

    from search_engine_ray.stages.strings import edit_distance_pairs

    rng = np.random.RandomState(9)
    words = ["kitten", "iktten", "sititng", "sitting", "abcdef",
             "bacdef", "abdcef", "вечер", "веечр"]
    rows = []
    for i in range(80):
        w = words[rng.randint(len(words))]
        if rng.rand() < 0.3:
            pos = rng.randint(len(w) - 1)
            w = w[:pos] + w[pos + 1] + w[pos] + w[pos + 2:]  # transpose
        rows.append((i, w + " tail", ["en", "ru"][rng.randint(2)]))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = edit_distance_pairs(rd.from_pandas(df), prefix_len=10,
                              max_dist=3, variant="damerau") \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ref = duckdb.sql("""
        WITH p AS (SELECT doc_id, lang, substr(text, 1, 10) AS s FROM df)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               damerau_levenshtein(a.s, b.s)::BIGINT AS dist
        FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE damerau_levenshtein(a.s, b.s) <= 3
        ORDER BY id_a, id_b""").fetchdf()
    assert len(out) > 0
    assert out["id_a"].tolist() == ref["id_a"].tolist()
    assert out["id_b"].tolist() == ref["id_b"].tolist()
    assert out["dist"].tolist() == ref["dist"].tolist()

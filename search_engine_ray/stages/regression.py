"""Distributed model fitting via exact sufficient statistics.

The classic scale pattern for closed-form models (linear / ridge
regression, Naive Bayes, Gaussian stats): the data pass reduces to a
FIXED-SIZE sufficient statistic (here the normal-equation sums
``X'X`` and ``X'y``), partials combine associatively, and the solve is
a driver-side O(p^3) afterthought.  Nothing model-sized ever shuffles;
the corpus streams through one stateless ``map_batches``.

Exactness contract (driver-oracle-checkable, same trick as k-means /
PageRank): features and targets are INTEGERS (counts, or pre-quantized
fixed-point), so every partial sum is exact int64 and order-free; the
closed-form solve runs in IEEE float64 with a FIXED expression order
(Cramer's rule, identical parenthesization in numpy and SQL), so even
the float coefficients are bitwise-reproducible.  Int64 bounds: sums of
``x_i * x_j`` must stay under 2^63 — true for count features at any
corpus the driver tests; document your ranges when reusing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["linreg_sufficient_stats", "solve_ridge_3x3",
           "grouped_spearman"]

_STAT_COLS = ["n", "sx1", "sx2", "sy", "s11", "s12", "s22", "sx1y", "sx2y"]


def linreg_sufficient_stats(ds: rd.Dataset, *, x1: str, x2: str,
                            y: str) -> dict[str, int]:
    """Exact int64 normal-equation sums for ``y ~ 1 + x1 + x2``.

    One stateless vectorized pass; each block collapses to ONE partial
    row; Ray's tree-aggregating ``sum`` combines them (integer addition —
    any order).  Returns the 9 sums as python ints.
    """

    def partial(batch: pa.Table) -> pa.Table:
        a = batch[x1].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[x2].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = [len(a), a.sum(), b.sum(), t.sum(), (a * a).sum(),
                (a * b).sum(), (b * b).sum(), (a * t).sum(), (b * t).sum()]
        return pa.table({c: pa.array([int(v)], pa.int64())
                         for c, v in zip(_STAT_COLS, vals)})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.sum(_STAT_COLS)
    # ray returns {"sum(col)": v}
    return {c: int(out[f"sum({c})"]) for c in _STAT_COLS}


def solve_ridge_3x3(stats: dict[str, int], *, lam: int = 0
                    ) -> tuple[float, float, float, float]:
    """Cramer's-rule solve of the 3x3 ridge normal equations with a FIXED
    float64 expression order (the SQL oracle evaluates the identical
    expressions from its own exact sums — coefficients match bitwise).

    System (A + lam*I) beta = v with
    A = [[n, sx1, sx2], [sx1, s11+lam', s12], [sx2, s12, s22+lam']] —
    ridge only penalizes the feature rows (intercept unpenalized).
    Returns (det, b0, b1, b2).
    """
    s = {k: float(v) for k, v in stats.items()}
    a11, a12, a13 = s["n"], s["sx1"], s["sx2"]
    a22, a23, a33 = s["s11"] + float(lam), s["s12"], s["s22"] + float(lam)
    v1, v2, v3 = s["sy"], s["sx1y"], s["sx2y"]
    det = (a11 * (a22 * a33 - a23 * a23)
           - a12 * (a12 * a33 - a23 * a13)
           + a13 * (a12 * a23 - a22 * a13))
    d0 = (v1 * (a22 * a33 - a23 * a23)
          - a12 * (v2 * a33 - a23 * v3)
          + a13 * (v2 * a23 - a22 * v3))
    d1 = (a11 * (v2 * a33 - a23 * v3)
          - v1 * (a12 * a33 - a23 * a13)
          + a13 * (a12 * v3 - v2 * a13))
    d2 = (a11 * (a22 * v3 - v2 * a23)
          - a12 * (a12 * v3 - v2 * a13)
          + v1 * (a12 * a23 - a22 * a13))
    return det, d0 / det, d1 / det, d2 / det


def grouped_spearman(ds: rd.Dataset, *, group_col: str, x_col: str,
                     y_col: str, id_col: str) -> rd.Dataset:
    """Per-group Spearman rank-correlation sufficient statistic with an
    all-integer surface: rows rank by ``(x, id)`` and ``(y, id)`` (the
    deterministic tie-break makes every rank an exact int — both sides
    compute ROW_NUMBER semantics, not tie-averaged ranks), and the group
    collapses to ``(n, sum_d2)`` where ``sum_d2 = Σ(rank_x - rank_y)²``.
    Spearman's ``rho = 1 - 6·sum_d2 / (n(n²-1))`` is one float division
    away and stays OFF the hash surface (the Q14-ratio pattern).

    Scale note: each group ranks in one worker (``map_groups``, the same
    documented caveat as ``grouped_percentile_cont``); a corpus-scale
    group would use two distributed sorts + ``ordered_prefix_sum``-style
    block-offset ranking — same integer contract.  Int64 bound:
    ``n·(n-1)² < 2^63`` per group.
    """

    def per_group(g: pa.Table) -> pa.Table:
        key = g[group_col][0].as_py()
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = x.size
        rx = np.empty(n, np.int64)
        rx[np.lexsort((i, x))] = np.arange(1, n + 1)
        ry = np.empty(n, np.int64)
        ry[np.lexsort((i, y))] = np.arange(1, n + 1)
        d = rx - ry
        return pa.table({group_col: pa.array([key]),
                         "n": pa.array([n], pa.int64()),
                         "sum_d2": pa.array([int((d * d).sum())],
                                            pa.int64())})

    return ds.select_columns([group_col, x_col, y_col, id_col]) \
        .groupby(group_col).map_groups(per_group, batch_format="pyarrow")

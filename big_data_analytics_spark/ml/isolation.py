"""Isolation forest (Liu, Ting & Zhou 2008) — native implementation,
upgrading the median/MAD substitute in gaps.robust_anomaly_scores to
the reference's actual M13 semantics (sklearn IsolationForest;
sklearn itself is absent from this environment, checked 2026-08-13).

Scale shape — the same split as every tree/quantizer fit here:

- **Fit on subsamples, driver-side.** An iTree is built from ψ=256
  random rows (the paper's default); the whole training set for T
  trees is T×ψ rows — kilobytes. Collecting it is not a scale
  violation, it is the algorithm (sampling is what gives isolation
  forests their bias toward global anomalies).
- **Score distributed, vectorized.** Trees are flattened to numpy
  arrays (feature/threshold/child/size per node) and broadcast; a
  pandas UDF walks all rows through a tree simultaneously with
  boolean-mask updates — no per-row Python, one Arrow batch per
  partition chunk.

Anomaly score = 2^(−E[h(x)]/c(ψ)) per the paper: h = path depth plus
c(node_size) for unsplit leaves; c(n) = 2·H(n−1) − 2(n−1)/n is the
expected BST unsuccessful-search depth. Scores near 1 = anomalous,
near 0.5 = normal.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EULER = 0.5772156649015329


def _c(n: float) -> float:
    """Expected path-length normalizer c(n) (paper eq. 1)."""
    if n <= 1:
        return 0.0
    h = math.log(n - 1) + _EULER
    return 2.0 * h - 2.0 * (n - 1) / n


@dataclass
class _Tree:
    feature: np.ndarray    # int32, -1 = leaf
    threshold: np.ndarray  # float64
    left: np.ndarray       # int32 node index
    right: np.ndarray      # int32 node index
    depth: np.ndarray      # int32
    size: np.ndarray       # int32 rows that landed here during fit


def _build_tree(x: np.ndarray, rng: np.random.Generator,
                max_depth: int) -> _Tree:
    feature, threshold, left, right, depth_a, size = [], [], [], [], [], []

    def add_node(rows: np.ndarray, depth: int) -> int:
        idx = len(feature)
        feature.append(-1)
        threshold.append(0.0)
        left.append(-1)
        right.append(-1)
        depth_a.append(depth)
        size.append(len(rows))
        if depth >= max_depth or len(rows) <= 1:
            return idx
        sub = x[rows]
        spans = sub.max(axis=0) - sub.min(axis=0)
        candidates = np.flatnonzero(spans > 0)
        if candidates.size == 0:  # all points identical
            return idx
        f = int(rng.choice(candidates))
        lo, hi = sub[:, f].min(), sub[:, f].max()
        t = float(rng.uniform(lo, hi))
        mask = sub[:, f] < t
        feature[idx] = f
        threshold[idx] = t
        left[idx] = add_node(rows[mask], depth + 1)
        right[idx] = add_node(rows[~mask], depth + 1)
        return idx

    add_node(np.arange(len(x)), 0)
    return _Tree(
        np.array(feature, dtype=np.int32),
        np.array(threshold, dtype=np.float64),
        np.array(left, dtype=np.int32),
        np.array(right, dtype=np.int32),
        np.array(depth_a, dtype=np.int32),
        np.array(size, dtype=np.int32),
    )


def _path_lengths(tree: _Tree, x: np.ndarray) -> np.ndarray:
    """Vectorized traversal: every row descends one level per
    iteration via mask updates; terminated rows keep their node."""
    node = np.zeros(len(x), dtype=np.int32)
    active = tree.feature[node] >= 0
    while active.any():
        f = tree.feature[node[active]]
        t = tree.threshold[node[active]]
        vals = x[active, :]
        go_left = vals[np.arange(len(f)), f] < t
        nxt = np.where(go_left, tree.left[node[active]],
                       tree.right[node[active]])
        node[active] = nxt
        active = tree.feature[node] >= 0
    # h = depth + c(leaf size): unsplit mass contributes its expected
    # further depth (paper §4.1)
    leaf_sizes = tree.size[node].astype(np.float64)
    adj = np.array([_c(s) for s in leaf_sizes])
    return tree.depth[node].astype(np.float64) + adj


def isolation_forest_fit(df: DataFrame, features: list[str],
                         n_trees: int = 100, sample_size: int = 256,
                         seed: int = 17):
    """Fit T iTrees on hash-deterministic subsamples. Returns an
    opaque model usable with :func:`isolation_forest_score`."""
    n = df.count()
    if n == 0:
        raise ValueError("isolation_forest_fit: input DataFrame has no rows")
    psi = min(sample_size, n)
    rng = np.random.default_rng(seed)
    # one deterministic pool of up to T×ψ rows, partitioned into
    # per-tree subsamples. Rows are picked by ordering on a content
    # hash and taking the first `need` (TakeOrderedAndProject: each
    # partition keeps a local top-`need`, only those reach the driver)
    # — unlike sample().limit(), membership does not depend on the
    # input's partitioning, so the fit is deterministic per (data, seed).
    need = min(n, n_trees * psi)
    pool = np.array(
        df.select(
            F.xxhash64(F.lit(seed), *[F.col(f) for f in features])
            .alias("__h"), *features)
        .orderBy("__h").limit(need).drop("__h").collect(),
        dtype=np.float64)
    max_depth = math.ceil(math.log2(max(psi, 2)))
    trees = []
    for _ in range(n_trees):
        take = rng.choice(len(pool), size=psi,
                          replace=len(pool) < psi)
        trees.append(_build_tree(pool[take], rng, max_depth))
    return {"trees": trees, "psi": psi, "features": features}


def isolation_forest_score(model, df: DataFrame,
                           keep_cols: list[str] | None = None,
                           out_col: str = "if_score") -> DataFrame:
    """Anomaly score per row: 2^(−mean path length / c(ψ)). Trees are
    closure-captured (broadcast with the serialized UDF); scoring is
    one narrow mapInPandas pass. ``keep_cols`` (e.g. a row id) pass
    through untouched."""
    import pandas as pd

    features = model["features"]
    trees = model["trees"]
    c_psi = _c(model["psi"]) or 1.0
    keep_cols = keep_cols or []
    ktypes = dict(df.dtypes)
    fields = [f"{k} {ktypes[k]}" for k in keep_cols]
    fields += [f"{f} double" for f in features]
    schema = ", ".join(fields + [f"{out_col} double"])
    out_cols = keep_cols + features

    def score(batches):
        for pdf in batches:
            x = pdf[features].to_numpy(dtype=np.float64)
            if len(x) == 0:
                yield pdf[out_cols].assign(
                    **{out_col: pd.Series(dtype=np.float64)})
                continue
            total = np.zeros(len(x))
            for t in trees:
                total += _path_lengths(t, x)
            score_v = np.power(2.0, -(total / len(trees)) / c_psi)
            yield pdf[out_cols].assign(**{out_col: score_v})

    proj = keep_cols + [f"CAST({f} AS DOUBLE) AS {f}" for f in features]
    return df.selectExpr(*proj).mapInPandas(score, schema)

"""Isolation forest, vmapped over trees (and objects) on the VPU.

Re-design of the reference's header-only iForest
(`include/isolation_forest.h`: recursive `IsolationTree::Node::Build` at
:165, scoring at :398) with the pointer tree replaced by level-synchronous
arrays: each of T trees is a complete binary tree of depth D stored as
(split_dim, split_val) per node; building walks all sample points down one
level at a time (scatter-min/max per node for the split range, PRNG splits),
and scoring routes query points through all trees at once, accumulating the
standard path-length estimate h(x) = depth-to-isolation + c(leaf_size).

Usage gates mirror `Object_Map::IsolationForestDeleteOutliers`
(`src/Object.cc:1248-1348`): >= 30 points, 50 trees, sample n/2, anomaly
threshold 0.6 (0.65 for one class)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

EULER_GAMMA = 0.5772156649


def _avg_path(n):
    """c(n): average BST unsuccessful-search path length."""
    n = jnp.maximum(n.astype(jnp.float32), 2.0)
    return 2.0 * (jnp.log(n - 1.0) + EULER_GAMMA) - 2.0 * (n - 1.0) / n


@functools.partial(jax.jit, static_argnames=("n_trees", "depth", "sample"))
def anomaly_scores(pts: jax.Array, valid: jax.Array, key: jax.Array,
                   *, n_trees: int = 50, depth: int = 8,
                   sample: int = 64) -> jax.Array:
    """pts [M, 3], valid [M] -> scores [M] in [0, 1] (0.5 = typical).

    Invalid points get score 0 (never culled)."""
    M = pts.shape[0]
    k_samp, k_dim, k_split = jax.random.split(key, 3)

    # --- sampling: each tree draws `sample` indices among valid points ----
    w = valid.astype(jnp.float32)
    p = w / jnp.maximum(w.sum(), 1.0)
    samp_idx = jax.random.choice(k_samp, M, shape=(n_trees, sample),
                                 replace=True, p=p)
    spts = pts[samp_idx]                                   # [T, S, 3]

    n_nodes = 1 << depth

    def build_tree(tree_i, tpts, kd, ks):
        """Level-synchronous build. Returns (dims [n_nodes], splits [n_nodes],
        counts [n_nodes]) where node numbering is heap order within level
        arrays concatenated (we store per-level offset implicitly)."""
        S = tpts.shape[0]
        node = jnp.zeros((S,), jnp.int32)     # node id within current level
        dims_all = []
        splits_all = []
        counts_all = []
        for lvl in range(depth):
            n_lvl = 1 << lvl
            # per-node min/max over assigned sample points
            big = 1e9
            mn = jnp.full((n_lvl, 3), big).at[node].min(tpts)
            mx = jnp.full((n_lvl, 3), -big).at[node].max(tpts)
            cnt = jnp.zeros((n_lvl,), jnp.int32).at[node].add(1)
            kd, kdu = jax.random.split(kd)
            ks, ksu = jax.random.split(ks)
            dim = jax.random.randint(kdu, (n_lvl,), 0, 3)
            u = jax.random.uniform(ksu, (n_lvl,))
            lo = jnp.take_along_axis(mn, dim[:, None], 1)[:, 0]
            hi = jnp.take_along_axis(mx, dim[:, None], 1)[:, 0]
            split = lo + u * jnp.maximum(hi - lo, 1e-9)
            dims_all.append(dim)
            splits_all.append(split)
            counts_all.append(cnt)
            # descend
            v = jnp.take_along_axis(tpts, dim[node][:, None], 1)[:, 0]
            go_right = v > split[node]
            node = node * 2 + go_right.astype(jnp.int32)
        return (jnp.concatenate(dims_all), jnp.concatenate(splits_all),
                jnp.concatenate(counts_all))

    kds = jax.random.split(k_dim, n_trees)
    kss = jax.random.split(k_split, n_trees)
    dims, splits, counts = jax.vmap(build_tree)(
        jnp.arange(n_trees), spts, kds, kss)   # [T, sum levels]

    # --- scoring: route every point through every tree -------------------
    def route(tree_dims, tree_splits, tree_counts):
        node = jnp.zeros((M,), jnp.int32)
        h = jnp.zeros((M,), jnp.float32)
        alive = jnp.ones((M,), bool)          # still in a node with >1 sample
        off = 0
        last_cnt = jnp.full((M,), sample, jnp.int32)
        for lvl in range(depth):
            n_lvl = 1 << lvl
            dim = tree_dims[off:off + n_lvl]
            split = tree_splits[off:off + n_lvl]
            cnt = tree_counts[off:off + n_lvl]
            c_here = cnt[node]
            isolated_now = alive & (c_here <= 1)
            alive = alive & (c_here > 1)
            h = h + alive.astype(jnp.float32)  # one more edge traversed
            last_cnt = jnp.where(isolated_now, 1, jnp.where(alive, c_here,
                                                            last_cnt))
            v = jnp.take_along_axis(pts, dim[node][:, None], 1)[:, 0]
            node = node * 2 + (v > split[node]).astype(jnp.int32)
            off += n_lvl
        # terminal correction for points still in populated nodes
        h = h + jnp.where(last_cnt > 1, _avg_path(last_cnt), 0.0)
        return h

    hs = jax.vmap(route)(dims, splits, counts)             # [T, M]
    h_mean = hs.mean(axis=0)
    score = jnp.exp2(-h_mean / _avg_path(jnp.asarray(float(sample))))
    return jnp.where(valid, score, 0.0)


def cull_mask(pts: jax.Array, valid: jax.Array, key: jax.Array,
              threshold: float, *, n_trees: int = 50, min_points: int = 30
              ) -> jax.Array:
    """bool [M]: True for members to REMOVE. No-op below min_points
    (`src/Object.cc:1265`)."""
    s = anomaly_scores(pts, valid, key, n_trees=n_trees)
    enough = jnp.sum(valid.astype(jnp.int32)) >= min_points
    return valid & (s > threshold) & enough

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

    def onehot(node, n):
        grid = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        return (node[:, None] == grid).astype(jnp.float32)

    # Levels are UNROLLED with exact per-level widths (2**l nodes at level
    # l): the one-hot contractions that dominate cost scale with the node
    # width, and padding every level to 2**(depth-1) (the lax.scan form)
    # wastes 4x work (sum 2^l = 255 vs depth * 128 = 1024 for depth 8).
    # All per-node lookups stay one-hot matmuls — arbitrary gathers are
    # pathologically slow on the TPU.
    def build_tree(tpts, kd, ks):
        """Returns per-level lists: dims one-hot [w,3], splits [w],
        counts [w] with w = 2**l."""
        kds = jax.random.split(kd, depth)
        kss = jax.random.split(ks, depth)
        node = jnp.zeros((tpts.shape[0],), jnp.int32)
        out = []
        for l in range(depth):
            w = 1 << l
            oh = onehot(node, w)                           # [S, w]
            big = 1e9
            sel = oh[:, :, None] > 0                       # [S, w, 1]
            mn = jnp.min(jnp.where(sel, tpts[:, None, :], big), axis=0)
            mx = jnp.max(jnp.where(sel, tpts[:, None, :], -big), axis=0)
            cnt = oh.sum(axis=0)                           # [w]
            dim_oh = jax.nn.one_hot(
                jax.random.randint(kds[l], (w,), 0, 3), 3)   # [w, 3]
            u = jax.random.uniform(kss[l], (w,))
            lo = jnp.sum(mn * dim_oh, axis=-1)
            hi = jnp.sum(mx * dim_oh, axis=-1)
            split = lo + u * jnp.maximum(hi - lo, 1e-9)
            # per-sample chosen coordinate + split via one-hot contractions
            v = jnp.einsum("sp,pd,sd->s", oh, dim_oh, tpts)
            sp_here = oh @ split
            node = node * 2 + (v > sp_here)
            out.append((dim_oh, split, cnt))
        return tuple(out)

    kds = jax.random.split(k_dim, n_trees)
    kss = jax.random.split(k_split, n_trees)
    levels = jax.vmap(build_tree)(spts, kds, kss)
    # levels[l] = (dims_oh [T, w, 3], splits [T, w], counts [T, w])

    # --- scoring: route every point through every tree -------------------
    def route(tree_levels):
        node = jnp.zeros((M,), jnp.int32)
        h = jnp.zeros((M,), jnp.float32)
        alive = jnp.ones((M,), bool)
        last_cnt = jnp.full((M,), float(sample), jnp.float32)
        for l in range(depth):
            dim_oh, split, cnt = tree_levels[l]
            w = 1 << l
            oh = onehot(node, w)                           # [M, w]
            c_here = oh @ cnt
            isolated_now = alive & (c_here <= 1.0)
            alive2 = alive & (c_here > 1.0)
            h = h + alive2.astype(jnp.float32)
            last_cnt = jnp.where(isolated_now, 1.0,
                                 jnp.where(alive2, c_here, last_cnt))
            v = jnp.einsum("mp,pd,md->m", oh, dim_oh, pts)
            sp_here = oh @ split
            node = node * 2 + (v > sp_here)
            alive = alive2
        # terminal correction for points still in populated nodes
        return h + jnp.where(last_cnt > 1.0, _avg_path(last_cnt), 0.0)

    hs = jax.vmap(route)(levels)                           # [T, M]
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

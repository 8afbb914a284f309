"""Microbench: TPU cost of the mapping-path scatter/gather patterns.

Hypothesis: keyframe-rate stages are scatter-bound (XLA TPU serializes
scatters with arbitrary indices); row-local updates and unique_indices
should be large wins.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

K, N, P = 256, 512, 16384
r = np.random.default_rng(0)
kf_pt = jnp.asarray(r.integers(-1, P, size=(K, N)), jnp.int32)
desc = jnp.asarray(r.integers(0, 2, size=(K, N, 256)), jnp.int8) * 2 - 1
kf_valid = jnp.ones((K,), bool)


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.time()-t)/reps*1000:8.3f} ms", flush=True)


def refresh_full(kf_pt):
    kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    pt = kf_pt.reshape(-1)
    ok = pt >= 0
    Z = jnp.zeros((K, P + 1), bool)
    Z = Z.at[kf, jnp.where(ok, pt, P)].set(True)
    return Z[:, :P]


def refresh_full_unique(kf_pt):
    kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    pt = kf_pt.reshape(-1)
    ok = pt >= 0
    Z = jnp.zeros((K, P + 1), bool)
    Z = Z.at[kf, jnp.where(ok, pt, P)].set(True, unique_indices=True)
    return Z[:, :P]


def refresh_rows(Z, kf_pt, rows):  # rows: [R] kf indices
    R = rows.shape[0]
    sub = kf_pt[rows]                       # [R, N]
    ok = sub >= 0
    newrows = jnp.zeros((R, P + 1), bool).at[
        jnp.arange(R)[:, None], jnp.where(ok, sub, P)].set(True)[:, :P]
    return Z.at[rows].set(newrows)


def refresh_onehot(kf_pt):
    # indicator via comparison against a per-row sorted table: one-hot sum
    oh = jax.nn.one_hot(jnp.where(kf_pt >= 0, kf_pt, P), P + 1,
                        dtype=jnp.bfloat16)        # [K, N, P+1]
    return (jnp.sum(oh, axis=1) > 0)[:, :P]


def desc_votes_scatter(kf_pt, desc):
    pt = kf_pt.reshape(-1)
    ok = pt >= 0
    tgt = jnp.where(ok, pt, P)
    votes = jnp.zeros((P + 1, 256), jnp.float32).at[tgt].add(
        desc.reshape(-1, 256).astype(jnp.float32)
        * ok[:, None].astype(jnp.float32))[:P]
    return votes


def desc_votes_matmul(kf_pt, desc):
    # einsum over per-KF one-hot selection: votes = sum_k OH_k^T @ desc_k
    def body(acc, inp):
        row, d = inp
        oh = jax.nn.one_hot(jnp.where(row >= 0, row, P), P + 1,
                            dtype=jnp.bfloat16)          # [N, P+1]
        return acc + jnp.einsum('np,nd->pd', oh,
                                d.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), 0
    acc0 = jnp.zeros((P + 1, 256), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (kf_pt, desc))
    return acc[:P]


Z0 = refresh_full(kf_pt)
rows3 = jnp.asarray([3, 7, 11], jnp.int32)
rows32 = jnp.asarray(np.arange(32), jnp.int32)

timeit("refresh_obs_ind FULL scatter", refresh_full, kf_pt)
timeit("refresh_obs_ind FULL unique_indices", refresh_full_unique, kf_pt)
timeit("refresh_obs_ind 3 rows", refresh_rows, Z0, kf_pt, rows3)
timeit("refresh_obs_ind 32 rows", refresh_rows, Z0, kf_pt, rows32)
timeit("covis matmul f32",
       lambda Z: jnp.dot(Z.astype(jnp.float32), Z.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32), Z0)
timeit("obs gather [K,N] from [P]",
       lambda kf_pt: jnp.sum(jnp.where(
           kf_pt >= 0,
           jnp.arange(P, dtype=jnp.float32)[jnp.clip(kf_pt, 0, None)],
           0.0)), kf_pt)
timeit("desc votes scatter-add", desc_votes_scatter, kf_pt, desc)
timeit("desc votes scan-einsum", desc_votes_matmul, kf_pt, desc)

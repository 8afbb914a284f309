"""Single-dispatch Cholesky solve for the reduced camera system.

The local-BA LM iteration ends in a dense SPD solve of the Schur
complement, size C*6 = 192 (`solvers/ba.py:bundle_adjust_coo`). XLA's
`jnp.linalg.solve` / `lax.linalg.cholesky` lower to a blocked LU/Cholesky
of many small ops; at 192x192 the math is ~2.4 MFLOP but the op chain
costs ~1.0-1.5 ms on a v5e — pure per-op overhead, not FLOPs or bytes
(measured in dev/bench_solve192.py: LU, Cholesky, Newton-Schulz and
preconditioned CG all land within 10% of each other because every variant
is a serial chain of tiny kernels). This kernel runs the whole
factor + forward + back substitution in ONE `pallas_call`: the matrix
lives in VMEM (256x256 f32 = 256 KB) and the 3*D serial steps are
in-kernel vector ops with no dispatch between them.

Matches the role of g2o's `LinearSolverEigen` Cholesky inside
`Optimizer::LocalBundleAdjustment` (/root/reference/src/Optimizer.cc:
675-1139); parity with `jnp.linalg.solve` is asserted in
tests/test_ba.py.

Layout: D (=C*6) pads to P=256 lanes. The factor loop is unblocked
left-looking column Cholesky: column j of L is derived from one masked
row-extract, one row-broadcast multiply-reduce (the L[:, :j] @ L[j, :j]
product), and one masked column write — all [P, P] VPU ops, rank-2
iotas only (TPU requires >=2D iota). Rows/cols >= D carry an identity
diagonal so the recurrence stays defined on the padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P = 256  # padded size; fits [P, P] f32 in VMEM with room to spare


def _kernel(D: int):
    def kernel(m_ref, b_ref, x_ref):
        A = m_ref[:, :]                       # [P, P]
        b = b_ref[:, :]                       # [1, P]
        rows = jax.lax.broadcasted_iota(jnp.int32, (_P, _P), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_P, _P), 1)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (_P, 1), 0)
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)

        # identity on the padded diagonal keeps the recurrence defined
        pad_eye = ((rows == cols) & (rows >= D)).astype(jnp.float32)

        def chol_step(j, L):
            # row j of L (columns < j are filled, the rest still zero)
            row_j = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0,
                            keepdims=True)                    # [1, P]
            # v[i] = sum_k L[i, k] * L[j, k]  (k >= j contribute zeros)
            v = jnp.sum(L * row_j, axis=1, keepdims=True)     # [P, 1]
            mcol = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1,
                           keepdims=True)                     # [P, 1]
            c = mcol - v
            dsq = jnp.sum(jnp.where(rows1 == j, c, 0.0))
            d = jnp.sqrt(jnp.maximum(dsq, 1e-20))
            colv = (jnp.where(rows1 > j, c / d, 0.0)
                    + jnp.where(rows1 == j, d, 0.0))          # [P, 1]
            return L + colv * (cols == j).astype(jnp.float32)

        L = jax.lax.fori_loop(0, D, chol_step, pad_eye)

        # forward: L y = b
        def fwd_step(i, y):
            row_i = jnp.sum(jnp.where(rows == i, L, 0.0), axis=0,
                            keepdims=True)                    # [1, P]
            s = jnp.sum(row_i * y)
            lii = jnp.sum(jnp.where(cols1 == i, row_i, 0.0))
            bi = jnp.sum(jnp.where(cols1 == i, b, 0.0))
            yi = (bi - s) / lii
            return y + jnp.where(cols1 == i, yi, 0.0)

        y = jax.lax.fori_loop(0, D, fwd_step, jnp.zeros((1, _P),
                                                        jnp.float32))

        # back: L^T x = y — one in-kernel transpose, then the same
        # lane-indexed row-extract recurrence as the forward pass
        LT = L.T
        def bwd_step(t, x):
            i = D - 1 - t
            rowT_i = jnp.sum(jnp.where(rows == i, LT, 0.0), axis=0,
                             keepdims=True)                   # [1, P]
            # x[k] = 0 for k <= i, so the full product sums only k > i
            s = jnp.sum(rowT_i * x)
            lii = jnp.sum(jnp.where(cols1 == i, rowT_i, 0.0))
            yi = jnp.sum(jnp.where(cols1 == i, y, 0.0))
            xi = (yi - s) / lii
            return x + jnp.where(cols1 == i, xi, 0.0)

        x = jax.lax.fori_loop(0, D, bwd_step, jnp.zeros((1, _P),
                                                        jnp.float32))
        x_ref[:, :] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_pallas(M: jax.Array, rhs: jax.Array,
                          *, interpret: bool = False) -> jax.Array:
    """Solve M x = rhs for symmetric positive-definite M [D, D], D <= 256.

    One fused TPU kernel (factor + both substitutions). `interpret=True`
    runs under the Pallas interpreter for CPU tests.
    """
    D = M.shape[0]
    assert M.shape == (D, D) and rhs.shape == (D,) and D <= _P
    Mp = jnp.zeros((_P, _P), jnp.float32).at[:D, :D].set(
        M.astype(jnp.float32))
    bp = jnp.zeros((1, _P), jnp.float32).at[0, :D].set(
        rhs.astype(jnp.float32))
    x = pl.pallas_call(
        _kernel(D),
        out_shape=jax.ShapeDtypeStruct((1, _P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Mp, bp)
    return x[0, :D]

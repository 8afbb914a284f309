"""Variants for the [C*6=192] reduced-camera solve inside the local-BA LM
iteration (round-4 SOL table: jnp.linalg.solve ~1.0 ms of the 3.0 ms
iteration). Times each variant inside a lax.scan over 16 damping values
(same in-graph amortization as dev/bench_ba_parts.py) and reports relative
residual ||Mx-b||/||b|| so speed is not bought with a wrong step.

Variants:
  lu        jnp.linalg.solve (baseline)
  chol      lax.linalg.cholesky + two triangular_solves
  schulz    Newton-Schulz inverse iteration (all 192x192 matmuls, MXU)
  pcg       block-Jacobi (6x6) preconditioned CG, fixed iteration count
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n_reps = 16
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    D = 192
    C = D // 6
    rng = np.random.default_rng(0)
    # SPD test matrix with BA-like conditioning: random covisibility-style
    # block structure, eigenvalue spread ~1e5, plus LM damping.
    Q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    eigs = np.logspace(0, 5, D)
    M0 = (Q * eigs) @ Q.T
    M0 = 0.5 * (M0 + M0.T)
    b0 = rng.standard_normal(D)
    M0j = jnp.asarray(M0, jnp.float32)
    b0j = jnp.asarray(b0, jnp.float32)
    lams = jnp.asarray(rng.uniform(1e-4, 1e-2, n_reps), jnp.float32)

    def prep(lam):
        return M0j + lam * jnp.eye(D, dtype=jnp.float32), b0j

    def v_lu(M, b):
        return jnp.linalg.solve(M, b)

    def v_chol(M, b):
        L = jax.lax.linalg.cholesky(M)
        y = jax.lax.linalg.triangular_solve(
            L, b[:, None], left_side=True, lower=True)
        x = jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True)
        return x[:, 0]

    def v_schulz(M, b, iters=30):
        # X0 = M^T / (||M||_1 ||M||_inf) guarantees ||I - X0 M|| < 1 for
        # any nonsingular M; SPD here so M^T = M.
        a = jnp.max(jnp.sum(jnp.abs(M), axis=0))
        c = jnp.max(jnp.sum(jnp.abs(M), axis=1))
        X = M.T / (a * c)
        I2 = 2.0 * jnp.eye(D, dtype=jnp.float32)

        def body(X, _):
            X = jnp.dot(X, I2 - jnp.dot(M, X,
                                        preferred_element_type=jnp.float32),
                        preferred_element_type=jnp.float32)
            return X, 0

        X, _ = jax.lax.scan(body, X, None, length=iters)
        return X @ b

    def v_pcg(M, b, iters=40):
        # block-Jacobi preconditioner: invert the C diagonal 6x6 blocks
        blocks = M.reshape(C, 6, C, 6)[jnp.arange(C), :, jnp.arange(C), :]
        binv = jnp.linalg.inv(blocks)                       # batched, small

        def apply_prec(r):
            return jnp.einsum("cij,cj->ci", binv,
                              r.reshape(C, 6)).reshape(-1)

        x = jnp.zeros_like(b)
        r = b
        z = apply_prec(r)
        p = z
        rz = jnp.dot(r, z)

        def body(carry, _):
            x, r, p, rz = carry
            Mp = M @ p
            alpha = rz / jnp.maximum(jnp.dot(p, Mp), 1e-20)
            x = x + alpha * p
            r = r - alpha * Mp
            z = apply_prec(r)
            rz2 = jnp.dot(r, z)
            beta = rz2 / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return (x, r, p, rz2), 0

        (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None,
                                       length=iters)
        return x

    variants = {"lu": v_lu, "chol": v_chol, "schulz": v_schulz, "pcg": v_pcg}

    for name, fn in variants.items():
        @jax.jit
        def loop(lams, fn=fn):
            def body(acc, lam):
                M, b = prep(lam)
                x = fn(M, b)
                res = jnp.linalg.norm(M @ x - b) / jnp.linalg.norm(b)
                return acc + jnp.sum(x), res

            acc, ress = jax.lax.scan(body, jnp.float32(0.0), lams)
            return acc, ress

        out = loop(lams)
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(lams)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:8s} {dt:8.3f} ms/solve   relres max "
            f"{float(jnp.max(out[1])):.2e}")


if __name__ == "__main__":
    main()

"""Matmul-precision control for the geometric solvers.

TPU matmuls default to bfloat16 inputs (f32 accumulate). That is the right
trade for the detector convs and descriptor-distance matmuls, but the
Newton-type solvers (pose GN, bundle adjustment, pose graph, RANSAC model
fits) need full-f32 products: with bf16 inputs the normal equations carry
~1e-2 relative error and Levenberg-Marquardt stalls ~5 cm from the optimum
on a zero-noise toy problem (measured on v5e — see tests/test_ba.py
convergence tests). Wrapping the solver trace in
``jax.default_matmul_precision("float32")`` restores 1e-7-level convergence
at a cost only on the solver path, leaving the rest of the pipeline on the
fast MXU path.
"""

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace `fn` with full-float32 matmul precision. Place it
    UNDER `@jax.jit` so the context is active while the body is traced."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped

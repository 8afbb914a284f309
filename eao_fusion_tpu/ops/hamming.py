"""Hamming distance scoring for 256-bit ORB descriptors on the MXU.

Redesign of the reference's per-pair popcount loop
(`src/ORBmatcher.cc:1649` DescriptorDistance) as one matmul: descriptors are
kept as ±1 int8 vectors, so for a, b in {−1,+1}^256:

    hamming(a, b) = (256 − a·b) / 2

and a full N×M distance matrix is a single [N,256]x[256,M] int8 matmul on
the MXU (~0.5 GMAC for 1k x 1k — microseconds). Invalid descriptor slots are
all-zero, which yields distance 128 > TH_HIGH and can never win a match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BITS = 256
INVALID_DIST = N_BITS // 2  # what all-zero (invalid) rows score


def hamming_matrix(pm1_a: jax.Array, pm1_b: jax.Array) -> jax.Array:
    """[N, 256] x [M, 256] ±1 int8 -> [N, M] int32 Hamming distances.

    On TPU the contraction runs in bfloat16 on the MXU (exact for ±1 inputs
    and small accumulations up to 256, accumulated in f32); on CPU f32 hits
    BLAS instead of the slow int8 path."""
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    dot = jax.lax.dot_general(
        pm1_a.astype(dt), pm1_b.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ((N_BITS - dot) * 0.5).astype(jnp.int32)


def hamming_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Popcount XOR distance for packed [.., 8] uint32 descriptor pairs
    (elementwise, not a matrix). Used for small oracle checks."""
    x = jnp.bitwise_xor(a, b)
    # SWAR popcount
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    cnt = (x * jnp.uint32(0x01010101)) >> 24
    return jnp.sum(cnt, axis=-1).astype(jnp.int32)

"""Flat visual vocabulary: BoW as one MXU matmul.

TPU re-design of DBoW2 (`Thirdparty/DBoW2`: k-ary TemplatedVocabulary tree
+ `KeyFrameDatabase` inverted index, SURVEY.md §2.3 item 6): the tree is an
acceleration structure for CPUs; on the MXU, direct nearest-word assignment
of all descriptors against all W words is a single ±1 matmul
([N,256]x[256,W]), so the vocabulary is flat. Scoring matches DBoW2's
L1 metric: s(v, w) = 1 − 0.5·|v̂ − ŵ|₁ over tf-idf-weighted, L1-normalized
bow vectors.

The vocabulary is trained in-repo (tools/train_vocab.py) by Hamming-space
k-means (majority-vote centroids) over descriptors from synthetic scenes —
the reference's ORBvoc is trained for OpenCV's BRIEF pattern and would not
match our pattern anyway.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_VOCAB_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                                  os.pardir, "data", "vocab.npz")


class Vocabulary:
    """words: [W, 256] int8 ±1 centroids; idf: [W] float32."""

    def __init__(self, words: np.ndarray, idf: Optional[np.ndarray] = None):
        self.words = jnp.asarray(words, jnp.int8)
        W = words.shape[0]
        self.idf = jnp.asarray(idf if idf is not None
                               else np.ones(W, np.float32))

    @property
    def n_words(self) -> int:
        return self.words.shape[0]

    @classmethod
    def load(cls, path: str = DEFAULT_VOCAB_PATH) -> "Vocabulary":
        z = np.load(path)
        return cls(z["words"], z.get("idf"))

    @classmethod
    def random(cls, n_words: int = 2048, seed: int = 0) -> "Vocabulary":
        """Random ±1 codebook — usable fallback (random projections in
        Hamming space still bucket similar descriptors together)."""
        r = np.random.default_rng(seed)
        return cls(np.where(r.uniform(size=(n_words, 256)) < 0.5, -1, 1)
                   .astype(np.int8))


def assign_words(vocab: Vocabulary, desc_pm1: jax.Array,
                 valid: jax.Array) -> jax.Array:
    """[N, 256] -> word id [N] (−1 for invalid slots)."""
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    sim = jax.lax.dot_general(desc_pm1.astype(dt), vocab.words.astype(dt),
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    wid = jnp.argmax(sim, axis=1).astype(jnp.int32)
    return jnp.where(valid, wid, -1)


def bow_vector(vocab: Vocabulary, desc_pm1: jax.Array,
               valid: jax.Array) -> jax.Array:
    """tf-idf weighted, L1-normalized bow vector [W]."""
    W = vocab.n_words
    wid = assign_words(vocab, desc_pm1, valid)
    counts = jnp.zeros((W + 1,), jnp.float32).at[
        jnp.where(wid >= 0, wid, W)].add(1.0)[:W]
    v = counts * vocab.idf
    return v / jnp.maximum(v.sum(), 1e-9)


def l1_scores(query: jax.Array, db: jax.Array,
              db_valid: jax.Array) -> jax.Array:
    """DBoW2 L1 score of `query` [W] against rows of `db` [K, W]:
    s = 1 − 0.5·Σ|q − d| (both L1-normalized). Invalid rows score 0."""
    s = 1.0 - 0.5 * jnp.sum(jnp.abs(db - query[None, :]), axis=1)
    return jnp.where(db_valid, s, 0.0)

"""Train the flat ORB vocabulary by Hamming-space k-means.

Counterpart of the reference's offline DBoW2 vocabulary + converter
(`tools/bin_vocabulary.cc`): gathers descriptors from a batch of synthetic
scenes, runs k-means with majority-vote (sign of summed ±1 vectors)
centroid updates, computes idf weights, writes data/vocab.npz.

Run:  python tools/train_vocab.py [n_words] [n_scenes]
"""

import os
import sys

import numpy as np


def main(n_words: int = 2048, n_scenes: int = 6, iters: int = 12):
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.io import synthetic

    cfg = SystemConfig()
    descs = []
    for s in range(n_scenes):
        seq = synthetic.generate_sequence(
            n_frames=4, seed=100 + s, style="arc",
            cache_dir=synthetic.DEFAULT_CACHE)
        for f in seq.frames:
            feats = extractor.extract_features(
                jnp.asarray(f.gray), jnp.asarray(f.depth),
                orb_cfg=cfg.orb, cam_cfg=cfg.camera)
            d = np.asarray(feats.desc_pm1)[np.asarray(feats.valid)]
            descs.append(d)
    X = np.concatenate(descs).astype(np.float32)          # [D, 256] ±1
    print(f"training on {len(X)} descriptors")

    r = np.random.default_rng(0)
    C = X[r.choice(len(X), n_words, replace=False)]       # init centroids

    Xj = jnp.asarray(X)
    for it in range(iters):
        sim = Xj @ jnp.asarray(C).T                       # [D, W]
        assign = np.asarray(jnp.argmax(sim, axis=1))
        sums = np.zeros((n_words, 256), np.float32)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=n_words)
        # majority vote; empty clusters get re-seeded
        C = np.where(sums > 0, 1.0, -1.0).astype(np.float32)
        empty = counts == 0
        C[empty] = X[r.choice(len(X), int(empty.sum()))]
        inertia = float(np.asarray(
            jnp.max(sim, axis=1)).mean())
        print(f"iter {it}: mean-sim {inertia:.1f} empty {int(empty.sum())}")

    # idf over per-image word occurrence
    n_img = 0
    df = np.zeros(n_words, np.float64)
    off = 0
    for d in descs:
        sim = jnp.asarray(d.astype(np.float32)) @ jnp.asarray(C).T
        a = np.unique(np.asarray(jnp.argmax(sim, axis=1)))
        df[a] += 1
        n_img += 1
    idf = np.log(n_img / np.maximum(df, 1.0)).astype(np.float32)

    out = os.path.join(os.path.dirname(__file__), os.pardir, "data",
                       "vocab.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, words=C.astype(np.int8), idf=idf)
    print(f"wrote {out}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

"""Train the flat ORB vocabulary by Hamming-space k-means.

Counterpart of the reference's offline DBoW2 vocabulary + converter
(`tools/bin_vocabulary.cc`): gathers descriptors from a diverse batch of
synthetic scenes (styles x textures x seeds), runs k-means with
majority-vote (sign of summed ±1 vectors) centroid updates, computes idf
weights, writes data/vocab.npz.

The vocabulary is FLAT by design (mapping/vocabulary.py): DBoW2's k-ary
tree is a CPU acceleration structure; on the MXU, nearest-word assignment
of all descriptors against all W words is a single ±1 matmul, so scale
comes from W directly (default 8192 words — ~1k-4k distinct words per
image at the 1000-keypoint budget), not tree depth.

Run:  python -m tools.train_vocab [n_words] [iters]
"""

import os
import sys

import numpy as np


def gather_descriptors():
    """Descriptors from a diverse scene mix: 3 trajectory styles x 2
    textures x 4 seeds, 8 frames each (~190k descriptors)."""
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.io import synthetic

    cfg = SystemConfig()
    descs = []
    for style in ("arc", "forward", "spin"):
        for tex in ("blocky", "aperiodic"):
            for seed in (100, 101, 102, 103):
                seq = synthetic.generate_sequence(
                    n_frames=8, seed=seed, style=style, texture=tex,
                    cache_dir=synthetic.DEFAULT_CACHE)
                for f in seq.frames:
                    feats = extractor.extract_features(
                        jnp.asarray(f.gray), jnp.asarray(f.depth),
                        orb_cfg=cfg.orb, cam_cfg=cfg.camera)
                    d = np.asarray(feats.desc_pm1)[np.asarray(feats.valid)]
                    descs.append(d)
    return descs


def main(n_words: int = 8192, iters: int = 15):
    import jax.numpy as jnp

    descs = gather_descriptors()
    X = np.concatenate(descs).astype(np.float32)          # [D, 256] ±1
    print(f"training {n_words} words on {len(X)} descriptors")

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
        print(f"iter {it}: mean-sim {inertia:.1f} empty {int(empty.sum())}",
              flush=True)

    # idf over per-image word occurrence
    n_img = 0
    df = np.zeros(n_words, np.float64)
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
    print(f"wrote {out} ({n_words} words)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

"""Train and ship the synthetic-scene YOLOX weights (data/yolox_synth.npz).

Usage:
    python tools/train_yolox.py [--steps 1200] [--width 0.25] [--out PATH]

Renders (or loads from the shared cache) a mix of room scenes, trains the
width-0.25 YOLOX variant (frontend/yolox_train.py), evaluates box recall on
a held-out scene, and saves float16 weights. The System's online detector
lane (`semantic_online=True`) picks the file up automatically.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# class_textures=True: objects carry their class's canonical texture, so
# class identity is learnable (random per-scene textures make the class
# labels pure noise — box recall trains fine but class accuracy cannot).
TRAIN_SPECS = [  # (style, seed, n_objects, texture)
    ("arc", 0, 4, "blocky"), ("arc", 1, 6, "blocky"),
    ("arc", 2, 8, "blocky"), ("loop", 3, 6, "blocky"),
    ("loop", 4, 8, "aperiodic"), ("spin", 5, 6, "aperiodic"),
    # round-4 additions: more viewpoint/scale/background diversity for the
    # class head (held-out cls_acc 0.65 -> target >= 0.8)
    ("arc", 6, 6, "aperiodic"), ("spin", 7, 8, "blocky"),
    ("loop", 8, 4, "blocky"), ("spin", 10, 4, "aperiodic"),
    ("arc", 11, 8, "aperiodic"), ("loop", 12, 6, "aperiodic"),
]
VAL_SPEC = ("arc", 9, 5, "blocky")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--out", default="data/yolox_synth.npz")
    args = ap.parse_args()

    from eao_fusion_tpu.frontend import yolox, yolox_train
    from eao_fusion_tpu.io import synthetic

    def seq(spec):
        style, seed, nobj, tex = spec
        print(f"loading sequence {spec} ...", flush=True)
        return synthetic.generate_sequence(
            n_frames=args.frames, seed=seed, style=style, n_objects=nobj,
            texture=tex, class_textures=True,
            cache_dir=synthetic.DEFAULT_CACHE)

    train_seqs = [seq(s) for s in TRAIN_SPECS]
    val_seq = seq(VAL_SPEC)

    params, metrics = yolox_train.train(
        train_seqs, val_seq, n_classes=8, width_mult=args.width,
        batch=args.batch, n_steps=args.steps,
        log=lambda m: print(m, flush=True))
    import numpy as np
    yolox.save_params(args.out, params, dtype=np.float16)
    sz = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({sz:.1f} MB) — recall {metrics['recall']:.3f}")


if __name__ == "__main__":
    main()

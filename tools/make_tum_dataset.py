"""Export a synthetic ground-truthed sequence as an ON-DISK TUM dataset.

Produces the exact layout the reference's live pipeline consumes
(`ros_test/` message flow / `data/rgb_*.txt` lists) and that
`apps/run_tum.py` reads: 8-bit RGB PNGs + 16-bit depth PNGs with
`rgb.txt` / `depth.txt` timestamp lists, `groundtruth.txt` (TUM Twc),
offline detection files `boxes/<ts>.txt` (rows `class x y w h score`, the
`data/yolo_txts` format read at `src/Tracking.cc:476-524`), a rectified
right-eye `right/` + `right.txt` for the stereo lane, and a constant
gravity `accelerometer.txt` for the IMU alignment path.

Run:  python -m tools.make_tum_dataset OUT_DIR [n_frames] [seed] [style]
Then: python apps/run_tum.py OUT_DIR --boxes OUT_DIR/boxes \
          --gt OUT_DIR/groundtruth.txt --out traj.txt
"""

import os
import sys

import numpy as np


def main(out_dir: str, n_frames: int = 20, seed: int = 0,
         style: str = "arc", depth_factor: float = 5000.0,
         fps: float = 30.0):
    from PIL import Image

    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.ops import lie
    import jax.numpy as jnp

    seq = synthetic.generate_sequence(n_frames=n_frames, seed=seed,
                                      style=style,
                                      cache_dir=synthetic.DEFAULT_CACHE)
    right = synthetic.render_right_images(seq, seed=seed,
                                          cache_dir=synthetic.DEFAULT_CACHE)

    for sub in ("rgb", "depth", "right", "boxes"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    rgb_lines, dep_lines, right_lines, gt_lines = [], [], [], []
    for i, f in enumerate(seq.frames):
        ts = f"{f.timestamp:.6f}"
        g8 = np.clip(np.round(f.gray * 255), 0, 255).astype(np.uint8)
        Image.fromarray(np.stack([g8] * 3, axis=-1)).save(
            os.path.join(out_dir, "rgb", f"{ts}.png"))
        d16 = np.clip(np.round(f.depth * depth_factor), 0,
                      65535).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(
            os.path.join(out_dir, "depth", f"{ts}.png"))
        r8 = np.clip(np.round(right[i] * 255), 0, 255).astype(np.uint8)
        Image.fromarray(r8).save(os.path.join(out_dir, "right", f"{ts}.png"))
        with open(os.path.join(out_dir, "boxes", f"{ts}.txt"), "w") as fh:
            for b in f.boxes:
                fh.write(" ".join(str(float(v)) for v in b) + "\n")
        rgb_lines.append(f"{ts} rgb/{ts}.png")
        dep_lines.append(f"{ts} depth/{ts}.png")
        right_lines.append(f"{ts} right/{ts}.png")
        twc = np.asarray(lie.se3_inverse(jnp.asarray(f.tcw)))
        qw, qx, qy, qz = twc[0], twc[1], twc[2], twc[3]
        tx, ty, tz = twc[4], twc[5], twc[6]
        gt_lines.append(f"{ts} {tx} {ty} {tz} {qx} {qy} {qz} {qw}")

    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", dep_lines),
                        ("right.txt", right_lines),
                        ("groundtruth.txt", gt_lines)):
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    # constant gravity along -y at 100 Hz (the D435i convention the
    # gravity-alignment path expects, `message_flow.cc:270-308`)
    t_end = seq.frames[-1].timestamp
    with open(os.path.join(out_dir, "accelerometer.txt"), "w") as fh:
        fh.write("# t ax ay az\n")
        for k in range(int(t_end * 100) + 2):
            fh.write(f"{k / 100:.6f} 0.05 -9.78 0.12\n")

    print(f"wrote {len(seq.frames)}-frame TUM dataset -> {out_dir}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0], *(int(x) if x.isdigit() else x for x in a[1:]))

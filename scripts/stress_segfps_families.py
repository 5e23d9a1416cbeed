"""Spatial-segfps generator-family stress matrix (VERDICT r4 #2).

The flagship default (fps_segments=8, mode="spatial") was validated on
ONE synthetic generator whose instances are denser than background by
construction — exactly the property the spatial mode's equal-count
Morton tiles key on. This script re-runs the paired bootstrap A/B
(main arm = spatial8, B arm = exact seg1) on the SAME r4 checkpoints
across every generator family in ``data/synthetic.FAMILIES`` (uniform
density, instances-sparser-than-background adversarial, heavy
background, many-small / few-large, volumetric background).

One process, families sequential (chip serialization; the pipeline
shapes are identical across families so the jit cache carries over).

    python scripts/stress_segfps_families.py \
        [--gspn-ckpt runs/r4_gspn/ckpt] [--rpointnet-ckpt runs/r4_rpn/ckpt] \
        [--num-scenes 64] [--bootstrap 100] [--families default,uniform,...]

Per family prints the run_eval summary JSON (ap/ap_armB + paired
*_diff CIs: main - armB = spatial8 - exact; positive = spatial8 wins),
then a final one-line-per-family matrix.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gspn-ckpt", default="runs/r4_gspn/ckpt")
    ap.add_argument("--rpointnet-ckpt", default="runs/r4_rpn/ckpt")
    ap.add_argument("--num-scenes", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-points", type=int, default=8192)
    ap.add_argument("--bootstrap", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--families", type=str, default=None,
                    help="comma list (default: all)")
    args = ap.parse_args()

    from gspn_tpu.data import synthetic
    from gspn_tpu.eval import run_eval

    fams = (
        args.families.split(",")
        if args.families
        else sorted(synthetic.FAMILIES)
    )
    rows = []
    for fam in fams:
        argv = [
            "--gspn-ckpt", args.gspn_ckpt,
            "--rpointnet-ckpt", args.rpointnet_ckpt,
            "--num-scenes", str(args.num_scenes),
            "--batch", str(args.batch),
            "--num-points", str(args.num_points),
            "--seed", str(args.seed),
            "--family", fam,
            # main arm: spatial8, PINNED explicitly — run_eval builds its
            # config from the restored (exact-FPS-trained) checkpoint, so
            # relying on the inference preset default would silently run
            # exact-vs-exact (observed: identical arms, diff CI [0, 0])
            "--fps-segments", "8",
            "--fps-segment-mode", "spatial",
            # B arm: exact
            "--ab-fps-segments", "1",
            "--bootstrap", str(args.bootstrap),
        ]
        buf = io.StringIO()
        print(f"== family {fam}", flush=True)
        with contextlib.redirect_stdout(buf):
            run_eval.main(argv)
        out = buf.getvalue().strip().splitlines()
        summary = json.loads(out[-1])
        summary["family"] = fam
        rows.append(summary)
        print(json.dumps(summary), flush=True)

    print("\n== matrix (spatial8 main vs exact armB; diff = main - armB)")
    for r in rows:
        print(json.dumps({
            "family": r["family"],
            "ap_spatial8": r.get("ap"),
            "ap_exact": r.get("ap_armB"),
            "ap_diff_ci": r.get("ap_diff"),
            "ap50_diff_ci": r.get("ap_50_diff"),
            "ap25_diff_ci": r.get("ap_25_diff"),
        }), flush=True)


if __name__ == "__main__":
    main()

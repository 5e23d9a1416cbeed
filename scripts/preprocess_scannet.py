"""Offline ScanNet-v2 preprocessing: raw scans -> per-scene .npz.

    python scripts/preprocess_scannet.py --scans <scannet>/scans \
        --out scannet_npz [--label-tsv scannetv2-labels.combined.tsv]

Each scan directory must contain ``<id>_vh_clean_2.ply``,
``<id>_vh_clean_2.0.010000.segs.json`` and ``<id>.aggregation.json``
(the standard ScanNet release layout). Equivalent of the reference's
scene-prep scripts (SURVEY.md §2.2).
"""

import argparse
import pathlib
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scans", required=True, help="dir of scan directories")
    p.add_argument("--out", required=True)
    p.add_argument("--label-tsv", default=None)
    args = p.parse_args(argv)

    from gspn_tpu.data.scannet import load_label_tsv, preprocess_to_npz

    label_map = load_label_tsv(args.label_tsv) if args.label_tsv else None
    scans = sorted(
        d for d in pathlib.Path(args.scans).iterdir() if d.is_dir()
    )
    if not scans:
        sys.exit(f"no scan directories under {args.scans}")
    for i, scan in enumerate(scans):
        try:
            out = preprocess_to_npz(scan, args.out, label_map)
            print(f"[{i + 1}/{len(scans)}] {scan.name} -> {out}")
        except FileNotFoundError as e:
            print(f"[{i + 1}/{len(scans)}] {scan.name}: SKIP ({e})")


if __name__ == "__main__":
    main()

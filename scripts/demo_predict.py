"""Qualitative demo: run instance-seg inference on a scene and export the
input + predicted instances as colored PLY files for visual inspection.

    python scripts/demo_predict.py --out demo/ \
        [--gspn-ckpt runs/q2_gspn/ckpt --rpointnet-ckpt runs/q2_rpn/ckpt] \
        [--scannet-dir scannet_npz]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def write_ply(path, xyz: np.ndarray, rgb: np.ndarray):
    """ASCII PLY point cloud with uchar colors."""
    path = pathlib.Path(path)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(xyz)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
    return path


_PALETTE = np.asarray(
    [
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
        [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
    ],
    np.uint8,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="demo")
    p.add_argument("--gspn-ckpt", default=None)
    p.add_argument("--rpointnet-ckpt", default=None)
    p.add_argument("--scannet-dir", default=None)
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--num-seeds", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gspn_tpu.data import synthetic
    from gspn_tpu.models.gspn import GSPNConfig
    from gspn_tpu.models.pipeline import (
        PipelineConfig,
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.rpointnet import RPointNetConfig
    from gspn_tpu.train.checkpoint import restore_variable_collections

    cfg = PipelineConfig(
        gspn=GSPNConfig(),
        rpointnet=RPointNetConfig(num_classes=args.num_classes),
        num_seeds=args.num_seeds,
        box_percentile=0.1,
        score_thresh=0.01,
    )
    rng = np.random.default_rng(args.seed)
    if args.scannet_dir:
        from gspn_tpu.data.scannet import ScanNetCrops

        batch = ScanNetCrops(
            args.scannet_dir, num_points=args.num_points
        ).sample_batch(rng, 1)
    else:
        batch = synthetic.scene_batch(
            rng, 1, n_points=args.num_points, max_instances=6
        )

    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), args.num_points)
    for name, ckpt in (("gspn", args.gspn_ckpt), ("rpointnet", args.rpointnet_ckpt)):
        if ckpt:
            variables[name] = restore_variable_collections(
                ckpt, variables[name]
            )

    infer = jax.jit(make_inference_fn(cfg))
    preds = infer(
        variables,
        jnp.asarray(batch["xyz"]),
        None,
        jnp.asarray(batch["valid"]),
        jax.random.PRNGKey(1),
    )

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    xyz = batch["xyz"][0][batch["valid"][0]]
    # GT coloring
    gt_rgb = np.full((len(xyz), 3), 128, np.uint8)
    inst = batch["inst_label"][0][batch["valid"][0]]
    for i in np.unique(inst[inst > 0]):
        gt_rgb[inst == i] = _PALETTE[int(i) % len(_PALETTE)]
    write_ply(out / "scene_gt.ply", xyz, gt_rgb)
    # prediction coloring: each kept proposal a palette color
    pr_rgb = np.full((len(xyz), 3), 128, np.uint8)
    masks = np.asarray(preds.masks[0])[:, batch["valid"][0]]
    order = np.argsort(np.asarray(preds.scores[0]))  # low→high: best paints last
    kept = 0
    for r in order:
        if not bool(preds.valid[0, r]):
            continue
        pr_rgb[masks[r]] = _PALETTE[kept % len(_PALETTE)]
        kept += 1
    write_ply(out / "scene_pred.ply", xyz, pr_rgb)
    print(
        f"wrote {out}/scene_gt.ply and {out}/scene_pred.ply "
        f"({kept} predicted instances, {len(np.unique(inst[inst > 0]))} GT)"
    )


if __name__ == "__main__":
    main()

"""Stage-1 trainer: GSPN CVAE proposal network.

CLI parity with the reference's root ``train_gspn.py`` (argparse flags,
epoch loop, periodic checkpoints, text+JSONL logging — SURVEY.md §2.2),
rebuilt around a jitted (optionally data-parallel) train step.

    python -m gspn_tpu.train.train_gspn --steps 200 --batch 4 --synthetic
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gspn_tpu.data import synthetic
from gspn_tpu.data.augment import augment_scene
from gspn_tpu.models.gspn import GSPN, GSPNConfig
from gspn_tpu.parallel import make_dp_train_step, make_mesh
from gspn_tpu.train.checkpoint import CheckpointManager
from gspn_tpu.train.metrics import MetricsLogger, format_metrics
from gspn_tpu.train.steps import TrainState, make_gspn_loss_fn, make_train_step


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train GSPN (stage 1)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--num-seeds", type=int, default=64)
    p.add_argument("--gt-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--kl-weight", type=float, default=1.0)
    p.add_argument("--log-dir", type=str, default="runs/gspn")
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation-loss interval on a held-out batch "
                        "(0 = off; the reference's eval_one_epoch analog)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    p.add_argument("--synthetic", action="store_true", default=True)
    p.add_argument("--scannet-dir", type=str, default=None,
                   help="preprocessed ScanNet crops dir (overrides synthetic)")
    p.add_argument("--shapenet-dir", type=str, default=None,
                   help="ShapeNet h5 dir: single-object CVAE pretrain "
                        "(BASELINE config 1)")
    p.add_argument("--shapenet-category", type=int, default=None)
    p.add_argument("--partnet-dir", type=str, default=None,
                   help="PartNet ins_seg h5 dir (BASELINE config 5)")
    p.add_argument("--synthetic-objects", action="store_true",
                   help="single-object CVAE workload (BASELINE config 1) "
                        "from the parametric shape generator")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--preset", choices=["default", "tiny", "object"],
                   default="default",
                   help="tiny = small config for smoke tests / CPU; "
                        "object = single-object CVAE (one whole-object "
                        "context per centroid seed, BASELINE config 1)")
    return p.parse_args(argv)


TINY_GSPN = GSPNConfig(
    context_radii=(0.3, 0.6),
    context_nsample=(16, 32),
    encoder_mlp=(16, 32),
    center_mlp=(16, 32),
    center_fc=(32,),
    latent_dim=8,
    cond_dim=32,
    generator_fc=(64,),
    num_gen_points=32,
    objectness_fc=(16,),
)


def data_iterator(args, np_rng):
    ds = None
    if getattr(args, "scannet_dir", None):
        from gspn_tpu.data.scannet import ScanNetCrops

        ds = ScanNetCrops(args.scannet_dir, num_points=args.num_points)
    elif getattr(args, "shapenet_dir", None):
        from gspn_tpu.data.shapenet import ShapeNetObjects

        ds = ShapeNetObjects(
            args.shapenet_dir,
            num_points=args.num_points,
            category=getattr(args, "shapenet_category", None),
        )
    elif getattr(args, "partnet_dir", None):
        from gspn_tpu.data.partnet import PartNetParts

        ds = PartNetParts(args.partnet_dir, num_points=args.num_points)
    if ds is not None:
        while True:
            yield ds.sample_batch(np_rng, args.batch)
    elif getattr(args, "synthetic_objects", False):
        while True:
            yield synthetic.object_scene_batch(
                np_rng, args.batch, n_points=args.num_points
            )
    else:
        while True:
            yield synthetic.scene_batch(
                np_rng, args.batch, n_points=args.num_points, max_instances=8
            )


def main(argv=None):
    args = parse_args(argv)
    if args.preset == "tiny":
        cfg = TINY_GSPN
    elif args.preset == "object":
        from gspn_tpu.models.gspn import shapenet_config

        cfg = shapenet_config(args.num_points, num_gen_points=512)
    else:
        cfg = GSPNConfig()
    model = GSPN(cfg)
    tx = optax.adam(args.lr)
    key = jax.random.PRNGKey(args.seed)
    np_rng = np.random.default_rng(args.seed)

    batches = data_iterator(args, np_rng)
    first = {k: jnp.asarray(v) for k, v in next(batches).items()}

    # init against real shapes
    from gspn_tpu import ops
    from gspn_tpu.data.instances import gather_seed_instances

    seed_idx = ops.farthest_point_sample(
        args.num_seeds, first["xyz"], first["valid"], impl=cfg.ops_impl
    )
    gt_pts, gt_valid, _, _ = gather_seed_instances(
        first["xyz"], first["inst_label"], seed_idx, args.gt_size
    )
    variables = model.init(
        key, first["xyz"], seed_idx, valid=first["valid"],
        gt_points=gt_pts, gt_valid=gt_valid, z_rng=key, train=False,
    )
    state = TrainState.create(variables, tx)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"GSPN: {n_params / 1e6:.2f}M params, devices={jax.device_count()}")

    loss_fn = make_gspn_loss_fn(
        model, args.num_seeds, args.gt_size, {"kl_weight": args.kl_weight}
    )
    if args.dp:
        mesh = make_mesh()
        step_fn = make_dp_train_step(loss_fn, tx, mesh)
    else:
        step_fn = make_train_step(loss_fn, tx)

    ckpt = CheckpointManager(f"{args.log_dir}/ckpt")
    logger = MetricsLogger(args.log_dir)
    from gspn_tpu.train.config_io import save_config

    save_config(f"{args.log_dir}/config.json", model=cfg, args=args)

    @jax.jit
    def prep(batch, rng):
        if not args.no_augment:
            batch = dict(batch)
            batch["xyz"] = augment_scene(rng, batch["xyz"], batch["valid"])
        return batch

    val_batch = None
    val_fn = None
    if args.eval_every:
        val_batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        val_fn = jax.jit(
            lambda s, b, r: loss_fn(s.params, s.batch_stats, b, r)[1][0]
        )

    for i in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        k_aug, k_step = jax.random.split(jax.random.fold_in(key, i))
        batch = prep(batch, k_aug)
        state, metrics = step_fn(state, batch, k_step)
        if (i + 1) % args.log_every == 0 or i == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.log(int(state.step), m)
            print(format_metrics(int(state.step), m))
        if args.eval_every and (i + 1) % args.eval_every == 0:
            vm = val_fn(state, val_batch, jax.random.PRNGKey(args.seed + 1))
            vm = {f"val_{k}": float(v) for k, v in vm.items()}
            logger.log(int(state.step), vm)
            print(format_metrics(int(state.step), vm))
        if (i + 1) % args.ckpt_every == 0 or i + 1 == args.steps:
            ckpt.save(int(state.step), state)
    ckpt.close()
    logger.close()
    return state


if __name__ == "__main__":
    main()

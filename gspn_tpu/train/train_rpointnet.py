"""Stage-2 trainer: R-PointNet over (frozen) GSPN proposals.

CLI parity with the reference's root ``train_rpointnet.py`` (restores
stage-1 weights, trains backbone + heads, lr/bn-decay schedules —
SURVEY.md §2.2/§3.2), with deterministic resumable data (``--resume``).

    python -m gspn_tpu.train.train_rpointnet --steps 200 --batch 2 \
        --gspn-ckpt runs/gspn/ckpt         # or --gt-boxes for isolated training
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import optax

from gspn_tpu.data.augment import augment_scene
from gspn_tpu.data.iterator import DeterministicBatches
from gspn_tpu.models.gspn import GSPN, GSPNConfig
from gspn_tpu.models.rpointnet import RPointNet, RPointNetConfig
from gspn_tpu.parallel import make_dp_train_step, make_mesh
from gspn_tpu.train.checkpoint import CheckpointManager
from gspn_tpu.train.metrics import MetricsLogger, format_metrics
from gspn_tpu.train.schedules import bn_momentum_schedule, build_lr_schedule
from gspn_tpu.train.steps import (
    TrainState,
    make_rpointnet_loss_fn,
    make_train_step,
)
from gspn_tpu.train.train_gspn import (
    add_common_args,
    batch_feature_dim,
    device_batch,
    make_sample_fn,
    restore_or_init,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train R-PointNet (stage 2)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--morton", action="store_true",
                   help="Morton-sort each crop (spatially coherent point order; enables AABB chunk pruning in the device kernels)")
    p.add_argument("--num-seeds", type=int, default=64)
    p.add_argument("--max-instances", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=18)
    p.add_argument("--log-dir", type=str, default="runs/rpointnet")
    p.add_argument("--gspn-ckpt", type=str, default=None,
                   help="stage-1 checkpoint dir for frozen proposals")
    p.add_argument("--gt-boxes", action="store_true",
                   help="train with jittered GT boxes instead of GSPN proposals")
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation-loss interval on a held-out batch (0 = off)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true")
    p.add_argument("--point-sharded", action="store_true",
                   help="shard one scene's work over all devices (batch "
                        "replicated): frozen-GSPN seeds, backbone points "
                        "and RoIs all shard (parallel/train_points.py)")
    p.add_argument("--data-rows", type=int, default=0,
                   help="with --point-sharded: hybrid 2-D mesh — scenes "
                        "shard over this many data rows, each scene's "
                        "work over the remaining devices per row")
    p.add_argument("--prefetch", type=int, default=2,
                   help="stage this many batches on-device ahead of the "
                        "running step (0 disables); resume stays "
                        "bit-exact")
    p.add_argument("--synthetic", action="store_true", default=True)
    p.add_argument("--scannet-dir", type=str, default=None)
    p.add_argument("--partnet-dir", type=str, default=None)
    p.add_argument("--no-mix-gt-boxes", action="store_true",
                   help="disable GT-box mixing into stage-2 RoIs")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--preset", choices=["default", "tiny"], default="default")
    add_common_args(p)
    return p.parse_args(argv)


def tiny_rpointnet(num_classes: int) -> RPointNetConfig:
    from gspn_tpu.models.rpointnet import SALayerSpec

    return RPointNetConfig(
        sa_layers=(
            SALayerSpec(64, 0.4, 16, (16, 32)),
            SALayerSpec(16, 0.8, 16, (32, 64)),
        ),
        fp_mlps=((32,), (32, 32)),
        roi_samples=16,
        roi_mlp=(32, 32),
        cls_fc=(32,),
        box_fc=(32,),
        mask_mlp=(32,),
        num_classes=num_classes,
    )


def main(argv=None):
    args = parse_args(argv)

    batches = DeterministicBatches(make_sample_fn(args), args.batch, args.seed)
    first = device_batch(batches.batch_at(0))
    fdim = batch_feature_dim(first)
    feats0 = first.get("features") if fdim else None

    cfg = (
        tiny_rpointnet(args.num_classes)
        if args.preset == "tiny"
        else RPointNetConfig(num_classes=args.num_classes)
    )
    if fdim != cfg.feature_dim:  # backbone consumes RGB & friends
        cfg = dataclasses.replace(cfg, feature_dim=fdim)
    if args.width_mult != 1:
        from gspn_tpu.models.presets import scale_rpointnet_widths

        cfg = scale_rpointnet_widths(cfg, args.width_mult)
    if args.dtype == "bf16":
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    if args.fps_segments != 1:
        cfg = dataclasses.replace(
            cfg, fps_segments=args.fps_segments,
            fps_segment_mode=args.fps_segment_mode,
        )
    if args.group_select != "first":
        cfg = dataclasses.replace(cfg, group_select=args.group_select)
    else:
        # layout-bias probe: warn when the data layout is in the measured
        # first-K pathology regime (gspn_tpu/data/layout_probe.py)
        import numpy as _np

        from gspn_tpu.data.layout_probe import warn_if_layout_biased

        warn_if_layout_biased(
            {k: _np.asarray(v) for k, v in first.items()},
            radius=float(cfg.sa_layers[0].radius),
            k=int(cfg.sa_layers[0].nsample),
            where="training data",
        )
    model = RPointNet(cfg)
    tx = optax.adam(build_lr_schedule(args))
    bn_fn = (
        bn_momentum_schedule(
            decay_steps=args.bn_decay_steps, decay_rate=args.bn_decay_rate
        )
        if args.bn_decay
        else None
    )
    key = jax.random.PRNGKey(args.seed)

    frozen = None
    if args.gspn_ckpt and not args.gt_boxes:
        from gspn_tpu.train.train_gspn import TINY_GSPN

        gcfg = TINY_GSPN if args.preset == "tiny" else GSPNConfig()
        if fdim != gcfg.feature_dim:  # must match the stage-1 checkpoint
            gcfg = dataclasses.replace(gcfg, feature_dim=fdim)
        if args.width_mult != 1:  # must match the stage-1 --width-mult
            from gspn_tpu.models.presets import scale_gspn_widths

            gcfg = scale_gspn_widths(gcfg, args.width_mult)
        if args.dtype == "bf16":
            gcfg = dataclasses.replace(gcfg, dtype=jnp.bfloat16)
        if args.fps_segments != 1:
            gcfg = dataclasses.replace(
                gcfg, fps_segments=args.fps_segments,
                fps_segment_mode=args.fps_segment_mode,
            )
        if args.group_select != "first":
            gcfg = dataclasses.replace(
                gcfg, group_select=args.group_select
            )
        gmodel = GSPN(gcfg)
        from gspn_tpu import ops
        from gspn_tpu.data.instances import gather_seed_instances
        from gspn_tpu.train.checkpoint import restore_variable_collections

        sidx = ops.farthest_point_sample(
            args.num_seeds, first["xyz"], first["valid"], impl=gcfg.ops_impl
        )
        gp, gv, _, _ = gather_seed_instances(
            first["xyz"], first["inst_label"], sidx,
            min(256, args.num_points),
        )
        gvars = gmodel.init(
            key, first["xyz"], sidx, features=feats0, valid=first["valid"],
            gt_points=gp, gt_valid=gv, z_rng=key, train=False,
        )
        # params/batch_stats only: agnostic to the stage-1 optimizer's
        # opt_state structure (constant lr vs schedule-wrapped adam)
        frozen_vars = restore_variable_collections(args.gspn_ckpt, gvars)
        frozen = (gmodel, frozen_vars, args.num_seeds)
        print(f"loaded frozen GSPN from {args.gspn_ckpt}")

    # init stage-2 against dummy boxes WITH the data's features so the
    # backbone's first Dense matches what training feeds it
    dummy_boxes = jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]], jnp.float32),
        (first["xyz"].shape[0], 8, 1),
    ).reshape(first["xyz"].shape[0], 8, 6)
    variables = model.init(
        key, first["xyz"], dummy_boxes, features=feats0,
        valid=first["valid"], train=False,
    )
    state = TrainState.create(variables, tx)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"R-PointNet: {n_params / 1e6:.2f}M params, feature_dim={fdim}")

    if args.dp and args.point_sharded:
        raise SystemExit("--dp and --point-sharded are mutually exclusive")
    if args.dp:
        mesh = make_mesh()
        loss_fn = make_rpointnet_loss_fn(
            model, args.max_instances, frozen,
            mix_gt_boxes=not args.no_mix_gt_boxes,
            dp_axis="data", dp_size=mesh.shape["data"],
        )
        step_fn = make_dp_train_step(loss_fn, tx, mesh, bn_momentum_fn=bn_fn)
    elif args.point_sharded:
        from gspn_tpu.parallel.mesh import make_mesh_2d
        from gspn_tpu.parallel.train_points import (
            make_point_sharded_rpointnet_train_step,
        )

        rows = getattr(args, "data_rows", 0)
        step_fn = make_point_sharded_rpointnet_train_step(
            cfg, tx,
            make_mesh_2d(rows) if rows else make_mesh(axis="space"),
            args.max_instances,
            frozen_gspn=frozen,  # factory accepts the GSPN model directly
            mix_gt_boxes=not args.no_mix_gt_boxes,
            bn_momentum_fn=bn_fn,
            data_axis="data" if rows else None,
        )
    else:
        loss_fn = make_rpointnet_loss_fn(
            model, args.max_instances, frozen,
            mix_gt_boxes=not args.no_mix_gt_boxes,
        )
        step_fn = make_train_step(loss_fn, tx, bn_momentum_fn=bn_fn)

    ckpt = CheckpointManager(f"{args.log_dir}/ckpt")
    state, start_step = restore_or_init(ckpt, state, args.resume)
    logger = MetricsLogger(args.log_dir)
    from gspn_tpu.train.config_io import save_config

    save_config(f"{args.log_dir}/config.json", model=cfg, args=args)

    val_batch = None
    val_fn = None
    if args.eval_every:
        val_batch = device_batch(
            DeterministicBatches(
                make_sample_fn(args), args.batch, args.seed + 1_000_003
            ).batch_at(0)
        )
        val_fn = jax.jit(
            lambda s, b, r: loss_fn(s.params, s.batch_stats, b, r)[1][0]
        )

    # prefetch (see data/iterator.py — same contract, resume stays bit-exact)
    import contextlib

    from gspn_tpu.data.iterator import make_feed

    feed = make_feed(
        batches, start_step, args.steps, args.prefetch,
        stage=device_batch,
    )
    from gspn_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(
        f"{args.log_dir}/trace", start_step + 1,
        getattr(args, "profile_steps", 0),
    )
    try:
        with contextlib.closing(feed):
            for i, batch in feed:
                tracer.tick(i)
                batch = dict(batch)
                k_aug, k_step = jax.random.split(jax.random.fold_in(key, i))
                if not args.no_augment:
                    batch["xyz"] = augment_scene(k_aug, batch["xyz"], batch["valid"])
                state, metrics = step_fn(state, batch, k_step)
                if (i + 1) % args.log_every == 0 or i == start_step:
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
    finally:
        tracer.close()
    ckpt.close()
    logger.close()
    return state


if __name__ == "__main__":
    main()

"""Stage-1 trainer: GSPN CVAE proposal network.

CLI parity with the reference's root ``train_gspn.py`` (argparse flags,
epoch loop, lr/bn-decay schedules, periodic checkpoints, text+JSONL
logging — SURVEY.md §2.2), rebuilt around a jitted (optionally
data-parallel) train step with deterministic, exactly-resumable data:
batch ``i`` is a pure function of ``(seed, i)``, so ``--resume`` after a
crash reproduces the uninterrupted run bit-for-bit (SURVEY.md §5).

    python -m gspn_tpu.train.train_gspn --steps 200 --batch 4 --synthetic
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gspn_tpu.data import synthetic
from gspn_tpu.data.augment import augment_scene
from gspn_tpu.data.iterator import DeterministicBatches
from gspn_tpu.models.gspn import GSPN, GSPNConfig
from gspn_tpu.parallel import make_dp_train_step, make_mesh
from gspn_tpu.train.checkpoint import CheckpointManager
from gspn_tpu.train.metrics import MetricsLogger, format_metrics
from gspn_tpu.train.schedules import bn_momentum_schedule, build_lr_schedule
from gspn_tpu.train.steps import TrainState, make_gspn_loss_fn, make_train_step


def device_batch(b: dict) -> dict:
    """Stage a host batch on device. Host-only metadata (``scene_ids``,
    a list of strings from ScanNetCrops) stays off-device — training
    never needs it."""
    return {k: jnp.asarray(v) for k, v in b.items() if k != "scene_ids"}


def add_common_args(p: argparse.ArgumentParser):
    """Flags shared by both stage trainers (reference trainer family idiom)."""
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-schedule", choices=["constant", "exp", "cosine"],
                   default="constant",
                   help="'exp' = the reference's staircase exponential decay")
    p.add_argument("--lr-decay-steps", type=int, default=10000)
    p.add_argument("--lr-decay-rate", type=float, default=0.7)
    p.add_argument("--lr-min", type=float, default=1e-5)
    p.add_argument("--bn-decay", action="store_true",
                   help="schedule BN momentum toward 0.99 (reference "
                        "get_bn_decay idiom)")
    p.add_argument("--bn-decay-steps", type=int, default=10000)
    p.add_argument("--bn-decay-rate", type=float, default=0.5)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint under --log-dir and "
                        "continue the exact run (same data stream + rng)")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="MLP/head compute dtype (params stay f32; point-op "
                        "kernels always f32). bf16 is MXU-native and wins "
                        "on train steps at --width-mult >= 2 (STATUS.md "
                        "width study)")
    p.add_argument("--width-mult", type=int, default=1,
                   help="multiply every MLP/FC width (sampling geometry "
                        "unchanged; models/presets.py scale_*_widths). "
                        "Stage-2/eval restores must pass the same value "
                        "as the checkpoint was trained with")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler device trace of this many "
                        "steps (after one warmup step) under "
                        "{log_dir}/trace — Perfetto/TensorBoard viewable")
    p.add_argument("--fps-segments", type=int, default=1,
                   help=">1: segmented parallel-chain FPS approximation "
                        "(S exact greedy chains over disjoint subsets; "
                        "documented seed-level parity delta, ops/fps.py) — "
                        "cuts FPS latency ~S-fold where sizes are eligible")
    p.add_argument("--fps-segment-mode",
                   choices=["contiguous", "strided", "spatial"],
                   default="spatial",
                   help="segment partition when --fps-segments > 1. "
                        "Default 'spatial' (Morton-sort inside the FPS "
                        "op) matches run_eval/bench/export — the only "
                        "mode measured AP-safe on raw layouts; "
                        "'contiguous' on unsorted data was the "
                        "round-4 AP falsifier")
    p.add_argument("--group-select", choices=["first", "strided"],
                   default="first",
                   help="neighborhood K-selection: 'first' (reference "
                        "first-K-in-input-order) or 'strided' "
                        "(subsample-robust systematic sample — for "
                        "spatially-coherent raw layouts; the trainer "
                        "warns when its layout probe detects one). Must "
                        "match between training and eval.")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train GSPN (stage 1)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--morton", action="store_true",
                   help="Morton-sort each crop (spatially coherent point order; enables AABB chunk pruning in the device kernels)")
    p.add_argument("--num-seeds", type=int, default=64)
    p.add_argument("--gt-size", type=int, default=256)
    p.add_argument("--kl-weight", type=float, default=1.0)
    p.add_argument("--log-dir", type=str, default="runs/gspn")
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation-loss interval on a held-out batch "
                        "(0 = off; the reference's eval_one_epoch analog)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    p.add_argument("--point-sharded", action="store_true",
                   help="shard the per-scene SEED work over all devices "
                        "(batch replicated; parallel/train_points.py) — "
                        "the whole-scene/long-context regime where one "
                        "scene's work, not the batch, is what scales")
    p.add_argument("--data-rows", type=int, default=0,
                   help="with --point-sharded: hybrid 2-D mesh — scenes "
                        "shard over this many data rows, each scene's "
                        "work over the remaining devices per row "
                        "(DP x intra-scene; must divide the batch size)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="stage this many batches on-device ahead of the "
                        "running step (host gen + transfer overlap "
                        "compute; 0 disables). Same batches in the same "
                        "order — resume stays bit-exact")
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
    add_common_args(p)
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


def make_sample_fn(args):
    """``sample_fn(np_rng, batch_size) -> batch dict`` for the configured
    data source — feeds :class:`DeterministicBatches` so batch ``i`` is a
    pure function of ``(seed, i)`` and runs resume exactly."""
    if getattr(args, "scannet_dir", None):
        from gspn_tpu.data.scannet import ScanNetCrops

        ds = ScanNetCrops(args.scannet_dir, num_points=args.num_points,
                          morton=getattr(args, "morton", False))
        return lambda rng, b: ds.sample_batch(rng, b)
    if getattr(args, "shapenet_dir", None):
        from gspn_tpu.data.shapenet import ShapeNetObjects

        ds = ShapeNetObjects(
            args.shapenet_dir,
            num_points=args.num_points,
            category=getattr(args, "shapenet_category", None),
        )
        return _maybe_morton(args, lambda rng, b: ds.sample_batch(rng, b))
    if getattr(args, "partnet_dir", None):
        from gspn_tpu.data.partnet import PartNetParts

        ds = PartNetParts(args.partnet_dir, num_points=args.num_points)
        return _maybe_morton(args, lambda rng, b: ds.sample_batch(rng, b))
    if getattr(args, "synthetic_objects", False):
        return _maybe_morton(
            args,
            lambda rng, b: synthetic.object_scene_batch(
                rng, b, n_points=args.num_points
            ),
        )
    return _maybe_morton(
        args,
        lambda rng, b: synthetic.scene_batch(
            rng, b, n_points=args.num_points, max_instances=8
        ),
    )


def _maybe_morton(args, sample_fn):
    """Apply host-side Morton scene sorting to sources without a
    prep-time ``morton=`` knob (ScanNetCrops sorts internally) when
    ``--morton`` is set — the layout fps_segments' contiguous mode and
    the kernels' AABB pruning expect."""
    if not getattr(args, "morton", False):
        return sample_fn
    from gspn_tpu.data import native

    return lambda rng, b: native.morton_sort_batch(sample_fn(rng, b))


def data_iterator(args, np_rng):
    """Back-compat generator API over :func:`make_sample_fn` (not
    resumable; the trainers use DeterministicBatches directly)."""
    sample_fn = make_sample_fn(args)
    while True:
        yield sample_fn(np_rng, args.batch)


def batch_feature_dim(batch) -> int:
    f = batch.get("features")
    return 0 if f is None else int(f.shape[-1])


def restore_or_init(ckpt: CheckpointManager, state, resume: bool):
    """(state, start_step): restore the latest checkpoint when resuming."""
    if not resume:
        return state, 0
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = ckpt.restore(abstract)
    if restored is None:
        print("--resume: no checkpoint found, starting fresh")
        return state, 0
    start = int(restored.step)
    print(f"--resume: restored step {start}")
    return restored, start


def main(argv=None):
    args = parse_args(argv)

    # deterministic data stream: batch i depends only on (seed, i)
    batches = DeterministicBatches(make_sample_fn(args), args.batch, args.seed)
    first = device_batch(batches.batch_at(0))
    fdim = batch_feature_dim(first)

    if args.preset == "tiny":
        cfg = TINY_GSPN
    elif args.preset == "object":
        from gspn_tpu.models.gspn import shapenet_config

        cfg = shapenet_config(args.num_points, num_gen_points=512)
    else:
        cfg = GSPNConfig()
    if fdim != cfg.feature_dim:  # consume RGB & friends when the data has them
        cfg = dataclasses.replace(cfg, feature_dim=fdim)
    if args.width_mult != 1:
        from gspn_tpu.models.presets import scale_gspn_widths

        cfg = scale_gspn_widths(cfg, args.width_mult)
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
        from gspn_tpu.data.layout_probe import warn_if_layout_biased

        host_first = {k: np.asarray(v) for k, v in first.items()}
        mid = min(1, len(cfg.context_radii) - 1)
        warn_if_layout_biased(
            host_first, radius=float(cfg.context_radii[mid]),
            k=int(cfg.context_nsample[mid]), where="training data",
        )
    model = GSPN(cfg)
    tx = optax.adam(build_lr_schedule(args))
    bn_fn = (
        bn_momentum_schedule(
            decay_steps=args.bn_decay_steps, decay_rate=args.bn_decay_rate
        )
        if args.bn_decay
        else None
    )
    key = jax.random.PRNGKey(args.seed)

    # init against real shapes (with features so param shapes match the data)
    from gspn_tpu import ops
    from gspn_tpu.data.instances import gather_seed_instances

    seed_idx = ops.farthest_point_sample(
        args.num_seeds, first["xyz"], first["valid"], impl=cfg.ops_impl
    )
    gt_pts, gt_valid, _, _ = gather_seed_instances(
        first["xyz"], first["inst_label"], seed_idx, args.gt_size
    )
    variables = model.init(
        key, first["xyz"], seed_idx, features=first.get("features") if fdim else None,
        valid=first["valid"], gt_points=gt_pts, gt_valid=gt_valid,
        z_rng=key, train=False,
    )
    state = TrainState.create(variables, tx)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"GSPN: {n_params / 1e6:.2f}M params, devices={jax.device_count()}, "
          f"feature_dim={fdim}")

    if args.dp and args.point_sharded:
        raise SystemExit("--dp and --point-sharded are mutually exclusive")
    if args.dp:
        mesh = make_mesh()
        loss_fn = make_gspn_loss_fn(
            model, args.num_seeds, args.gt_size,
            {"kl_weight": args.kl_weight},
            dp_axis="data", dp_size=mesh.shape["data"],
        )
        step_fn = make_dp_train_step(loss_fn, tx, mesh, bn_momentum_fn=bn_fn)
    elif args.point_sharded:
        from gspn_tpu.parallel.mesh import make_mesh_2d
        from gspn_tpu.parallel.train_points import (
            make_point_sharded_gspn_train_step,
        )

        rows = getattr(args, "data_rows", 0)
        step_fn = make_point_sharded_gspn_train_step(
            cfg, tx,
            make_mesh_2d(rows) if rows else make_mesh(axis="space"),
            args.num_seeds, args.gt_size,
            loss_weights={"kl_weight": args.kl_weight}, bn_momentum_fn=bn_fn,
            data_axis="data" if rows else None,
        )
    else:
        loss_fn = make_gspn_loss_fn(
            model, args.num_seeds, args.gt_size,
            {"kl_weight": args.kl_weight},
        )
        step_fn = make_train_step(loss_fn, tx, bn_momentum_fn=bn_fn)

    ckpt = CheckpointManager(f"{args.log_dir}/ckpt")
    state, start_step = restore_or_init(ckpt, state, args.resume)
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
        # held-out batch from a disjoint stream (never collides with train)
        val_batch = device_batch(
            DeterministicBatches(
                make_sample_fn(args), args.batch, args.seed + 1_000_003
            ).batch_at(0)
        )
        val_fn = jax.jit(
            lambda s, b, r: loss_fn(s.params, s.batch_stats, b, r)[1][0]
        )

    # prefetch: stage batches on-device up to N ahead of the running step
    # (same values in the same order — DeterministicBatches contract; the
    # bit-exact resume tests run through this path)
    import contextlib

    from gspn_tpu.data.iterator import make_feed

    feed = make_feed(
        batches, start_step, args.steps, args.prefetch,
        stage=device_batch,
    )
    from gspn_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(
        f"{args.log_dir}/trace", start_step + 1, args.profile_steps
    )
    try:
        with contextlib.closing(feed):
            for i, batch in feed:
                tracer.tick(i)
                k_aug, k_step = jax.random.split(jax.random.fold_in(key, i))
                batch = prep(batch, k_aug)
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

"""Exact trainer resume (SURVEY.md §5: "deterministic data iterator keyed
by (epoch, step) for exact resume") and lr/bn-decay schedules (the
reference trainer family's exponential_decay + get_bn_decay idioms)."""

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.train.schedules import (
    bn_momentum_schedule,
    build_lr_schedule,
    reblend_batch_stats,
)

TINY_ARGS = [
    "--steps", "6", "--batch", "2", "--num-points", "128",
    "--num-seeds", "8", "--gt-size", "16", "--preset", "tiny",
    "--log-every", "100", "--ckpt-every", "3",
]


def _params_equal(a, b):
    for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gspn_resume_is_bit_exact(tmp_path):
    """Train 6 steps; separately train 3, kill, --resume to 6: final
    params, batch stats, and opt state must be bit-equal."""
    from gspn_tpu.train import train_gspn

    full = train_gspn.main(
        TINY_ARGS + ["--log-dir", str(tmp_path / "full")]
    )
    train_gspn.main(
        TINY_ARGS[:1] + ["3"] + TINY_ARGS[2:]
        + ["--log-dir", str(tmp_path / "split")]
    )
    resumed = train_gspn.main(
        TINY_ARGS + ["--log-dir", str(tmp_path / "split"), "--resume"]
    )
    assert int(full.step) == int(resumed.step) == 6
    _params_equal(full.params, resumed.params)
    _params_equal(full.batch_stats, resumed.batch_stats)
    _params_equal(full.opt_state, resumed.opt_state)


def test_rpointnet_resume_is_bit_exact(tmp_path):
    from gspn_tpu.train import train_rpointnet

    args = [
        "--steps", "6", "--batch", "2", "--num-points", "128",
        "--max-instances", "4", "--num-classes", "3", "--preset", "tiny",
        "--gt-boxes", "--log-every", "100", "--ckpt-every", "3",
    ]
    full = train_rpointnet.main(args + ["--log-dir", str(tmp_path / "full")])
    train_rpointnet.main(
        args[:1] + ["3"] + args[2:] + ["--log-dir", str(tmp_path / "split")]
    )
    resumed = train_rpointnet.main(
        args + ["--log-dir", str(tmp_path / "split"), "--resume"]
    )
    assert int(full.step) == int(resumed.step) == 6
    _params_equal(full.params, resumed.params)
    _params_equal(full.batch_stats, resumed.batch_stats)


def test_gspn_resume_dp_on_8_device_mesh(tmp_path):
    """Resume exactness must hold for the data-parallel step too."""
    assert jax.device_count() >= 8
    from gspn_tpu.train import train_gspn

    args = [
        "--steps", "4", "--batch", "8", "--num-points", "128",
        "--num-seeds", "8", "--gt-size", "16", "--preset", "tiny",
        "--log-every", "100", "--ckpt-every", "2", "--dp",
    ]
    full = train_gspn.main(args + ["--log-dir", str(tmp_path / "full")])
    train_gspn.main(
        args[:1] + ["2"] + args[2:] + ["--log-dir", str(tmp_path / "split")]
    )
    resumed = train_gspn.main(
        args + ["--log-dir", str(tmp_path / "split"), "--resume"]
    )
    assert int(full.step) == int(resumed.step) == 4
    _params_equal(full.params, resumed.params)
    _params_equal(full.batch_stats, resumed.batch_stats)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


class _Args:
    lr = 1e-3
    lr_schedule = "exp"
    lr_decay_steps = 100
    lr_decay_rate = 0.5
    lr_min = 1e-5
    steps = 1000


def test_exp_lr_schedule_staircase_values():
    sched = build_lr_schedule(_Args())
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(99)), 1e-3)  # staircase: flat within step
    assert np.isclose(float(sched(100)), 5e-4)
    assert np.isclose(float(sched(200)), 2.5e-4)
    assert float(sched(100000)) >= 1e-5 - 1e-12  # floor


def test_cosine_lr_schedule_endpoints():
    a = _Args()
    a.lr_schedule = "cosine"
    sched = build_lr_schedule(a)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(1000)), 1e-5, rtol=1e-3)


def test_constant_lr_schedule():
    a = _Args()
    a.lr_schedule = "constant"
    assert build_lr_schedule(a) == 1e-3


def test_bn_momentum_schedule_reference_idiom():
    """m(step) = min(0.99, 1 - 0.5 * 0.5^(step // decay_steps))."""
    m = bn_momentum_schedule(init_decay=0.5, decay_steps=100, decay_rate=0.5)
    assert np.isclose(float(m(0)), 0.5)
    assert np.isclose(float(m(99)), 0.5)
    assert np.isclose(float(m(100)), 0.75)
    assert np.isclose(float(m(200)), 0.875)
    assert np.isclose(float(m(10000)), 0.99)  # clip


def test_reblend_batch_stats_exact_algebra():
    """Re-blending a momentum-m0 update to momentum-m must equal applying
    momentum m directly to the same batch statistics."""
    rng = np.random.default_rng(0)
    old = {"bn": {"mean": jnp.asarray(rng.standard_normal(8), jnp.float32)}}
    batch_stats = jnp.asarray(rng.standard_normal(8), jnp.float32)
    m0, m = 0.9, 0.6543
    mutated = {"bn": {"mean": m0 * old["bn"]["mean"] + (1 - m0) * batch_stats}}
    out = reblend_batch_stats(old, mutated, m, m0)
    expect = m * old["bn"]["mean"] + (1 - m) * batch_stats
    np.testing.assert_allclose(
        np.asarray(out["bn"]["mean"]), np.asarray(expect), rtol=1e-5
    )


def test_trainer_with_schedules_smoke(tmp_path):
    """CLI smoke: exp lr decay + bn-decay scheduling trains and improves."""
    from gspn_tpu.train import train_gspn

    state = train_gspn.main(
        TINY_ARGS
        + [
            "--log-dir", str(tmp_path / "sched"),
            "--lr-schedule", "exp", "--lr-decay-steps", "3",
            "--bn-decay", "--bn-decay-steps", "2",
        ]
    )
    assert int(state.step) == 6
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_compact_instance_ids_overflow_falls_back():
    """>4095 distinct ids must not hang the native path (bounded probing
    + NumPy fallback of identical semantics)."""
    from gspn_tpu.data import native

    ids = np.arange(1, 6000, dtype=np.int32)
    inst = np.repeat(ids, 2)
    out, k = native.compact_instance_ids(inst)
    assert k == 5999
    np.testing.assert_array_equal(out, np.repeat(np.arange(1, 6000), 2))


def test_width_mult_bf16_train_and_eval_restore(tmp_path):
    """--width-mult / --dtype bf16 flags: the trainer builds the scaled
    bf16 model (params stay f32) and run_eval restores the checkpoint
    when given the same multiplier — the shapes round-trip."""
    from gspn_tpu.eval import run_eval
    from gspn_tpu.train import train_gspn

    args = [
        "--steps", "2", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--gt-size", "16", "--preset", "tiny",
        "--log-every", "100", "--ckpt-every", "2",
        "--width-mult", "2", "--dtype", "bf16",
        "--log-dir", str(tmp_path / "w2"),
    ]
    state = train_gspn.main(args)
    assert int(state.step) == 2
    # params stay f32 even with bf16 compute
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32
    res = run_eval.main([
        "--num-scenes", "2", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        "--width-mult", "2", "--dtype", "bf16",
        "--gspn-ckpt", str(tmp_path / "w2" / "ckpt"),
    ])
    assert "ap" in res


def test_stage2_and_eval_restore_schedule_trained_ckpt(tmp_path):
    """Regression: a stage-1 checkpoint trained WITH an lr schedule has a
    different opt_state pytree than constant-lr adam; frozen-GSPN restore
    in stage 2 and eval restore must be agnostic to it (params-only
    partial restore)."""
    from gspn_tpu.eval import run_eval
    from gspn_tpu.train import train_gspn, train_rpointnet

    train_gspn.main(
        TINY_ARGS
        + [
            "--log-dir", str(tmp_path / "s1"),
            "--lr-schedule", "exp", "--lr-decay-steps", "3", "--bn-decay",
        ]
    )
    s2_args = [
        "--steps", "6", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--max-instances", "4", "--num-classes", "3",
        "--preset", "tiny", "--log-every", "100", "--ckpt-every", "3",
    ]
    state2 = train_rpointnet.main(
        s2_args
        + [
            "--log-dir", str(tmp_path / "s2"),
            "--gspn-ckpt", str(tmp_path / "s1" / "ckpt"),
            "--lr-schedule", "cosine",
        ]
    )
    assert int(state2.step) == 6
    res = run_eval.main(
        [
            "--gspn-ckpt", str(tmp_path / "s1" / "ckpt"),
            "--rpointnet-ckpt", str(tmp_path / "s2" / "ckpt"),
            "--num-scenes", "2", "--batch", "2", "--num-points", "128",
            "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        ]
    )
    assert set(res) >= {"ap", "ap_50", "ap_25"}

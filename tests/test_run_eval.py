"""End-to-end eval driver smoke: inference over synthetic scenes,
AP computation, prediction dumping."""

import json

import numpy as np

from gspn_tpu.eval import run_eval


def test_run_eval_synthetic(tmp_path):
    res = run_eval.main([
        "--num-scenes", "4", "--batch", "2", "--num-points", "192",
        "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        "--dump-dir", str(tmp_path / "preds"),
    ])
    assert set(res) >= {"ap", "ap_50", "ap_25", "per_class"}
    dumps = sorted((tmp_path / "preds").glob("*.npz"))
    assert len(dumps) == 4
    with np.load(dumps[0]) as z:
        assert {"masks", "scores", "classes"} <= set(z.files)


def test_run_eval_point_sharded(tmp_path):
    """--point-sharded runs the fully sharded pipeline over the 8-device
    virtual mesh from the user-facing CLI and produces the same metric
    keys (numeric parity with single-device is pinned separately in
    tests/test_scene_sharded.py)."""
    res = run_eval.main([
        "--num-scenes", "2", "--batch", "2", "--num-points", "192",
        "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        "--point-sharded",
    ])
    assert set(res) >= {"ap", "ap_50", "ap_25", "per_class"}


def test_run_eval_from_artifact_matches_live(tmp_path):
    """--artifact serves the eval from the AOT-exported .gspnx: the AP
    summary must equal the live-pipeline run bit-for-bit (same seed →
    same batches/variables; the artifact IS the same function)."""
    import jax

    from gspn_tpu.models.pipeline import (
        PipelineConfig,
        init_pipeline_variables,
    )
    from gspn_tpu.serve import export_inference, save_artifact
    from gspn_tpu.train.train_gspn import TINY_GSPN
    from gspn_tpu.train.train_rpointnet import tiny_rpointnet

    b, n, seeds, ncls = 2, 192, 8, 3
    cfg = PipelineConfig(
        gspn=TINY_GSPN, rpointnet=tiny_rpointnet(ncls), num_seeds=seeds,
        score_thresh=0.05,
    )
    # shapes/dtypes only — run_eval passes its own restored values at call
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(42), n)
    exported = export_inference(cfg, variables, n, batch_size=b)
    art = save_artifact(tmp_path / "tiny.gspnx", exported, cfg)

    common = [
        "--num-scenes", "4", "--batch", str(b), "--num-points", str(n),
        "--num-seeds", str(seeds), "--num-classes", str(ncls),
        "--preset", "tiny",
    ]
    live = run_eval.main(common)
    served = run_eval.main(common + ["--artifact", str(art)])
    assert served["ap"] == live["ap"]
    assert served["ap_50"] == live["ap_50"]
    assert served["ap_25"] == live["ap_25"]


def test_run_eval_scannet_dump_real_ids_and_collisions(tmp_path):
    """ScanNet-source eval dumps under the REAL scene id (official
    evaluator matches by id), and repeat draws of the same scene get a
    __cropN suffix instead of overwriting (sampling is with
    replacement; with one scene on disk every draw collides)."""
    from tests.test_data import _write_scannet_scene
    from gspn_tpu.data.scannet import preprocess_to_npz

    rng = np.random.default_rng(0)
    scan, *_ = _write_scannet_scene(tmp_path, rng)
    preprocess_to_npz(scan, tmp_path / "npz")
    run_eval.main([
        "--num-scenes", "3", "--batch", "1", "--num-points", "128",
        "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        "--scannet-dir", str(tmp_path / "npz"),
        "--dump-dir", str(tmp_path / "preds"),
    ])
    names = sorted(p.stem for p in (tmp_path / "preds").glob("*.npz"))
    assert len(names) == 3  # nothing overwritten
    assert "__crop" not in names[0]  # first draw keeps the real id
    assert names[1].endswith("__crop1") and names[2].endswith("__crop2")


def test_run_eval_width_mismatch_is_friendly_error(tmp_path):
    """Restoring a width-scaled checkpoint without --width-mult raises
    the clear config-mismatch error, not an Orbax shape error."""
    import pytest

    from gspn_tpu.train import train_gspn

    train_gspn.main([
        "--steps", "1", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--gt-size", "16", "--preset", "tiny",
        "--log-every", "100", "--ckpt-every", "1", "--width-mult", "2",
        "--log-dir", str(tmp_path / "w2"),
    ])
    with pytest.raises(ValueError, match="width-mult"):
        run_eval.main([
            "--num-scenes", "2", "--batch", "2", "--num-points", "128",
            "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
            "--gspn-ckpt", str(tmp_path / "w2" / "ckpt"),
        ])


def test_run_eval_partnet_source(tmp_path):
    """--partnet-dir drives the eval from PartNet h5 part-instance data
    (BASELINE config 5 workload)."""
    import h5py

    rng = np.random.default_rng(0)
    b, n = 6, 96
    with h5py.File(tmp_path / "p0.h5", "w") as f:
        f.create_dataset(
            "pts", data=rng.standard_normal((b, n, 3)).astype(np.float32)
        )
        f.create_dataset("label", data=rng.integers(0, 3, (b, n)))
        f.create_dataset("ins_label", data=rng.integers(-1, 4, (b, n)))
    res = run_eval.main([
        "--num-scenes", "2", "--batch", "2", "--num-points", "64",
        "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        "--partnet-dir", str(tmp_path),
    ])
    assert set(res) >= {"ap", "ap_50", "ap_25", "per_class"}


def test_run_eval_flag_validation():
    """Fixed-shape serving paths reject configurations they cannot run,
    at parse time (not mid-eval): --artifact + --point-sharded conflict,
    --data-rows without --point-sharded, row/batch indivisibility, and
    ragged final batches (num_scenes % batch != 0)."""
    import pytest

    base = ["--num-scenes", "4", "--batch", "2", "--preset", "tiny"]
    for bad in (
        ["--artifact", "x.gspnx", "--point-sharded"],
        ["--data-rows", "2"],
        ["--point-sharded", "--data-rows", "3"],
        ["--artifact", "x.gspnx", "--num-scenes", "3"],
        ["--point-sharded", "--data-rows", "2", "--num-scenes", "3"],
    ):
        with pytest.raises(SystemExit):
            run_eval.parse_args(base + bad)
    # the valid combinations still parse
    run_eval.parse_args(base + ["--artifact", "x.gspnx"])
    run_eval.parse_args(base + ["--point-sharded", "--data-rows", "2"])


def test_scannet_submission_roundtrip(tmp_path):
    """The official-format writer/reader are exact inverses, and the
    written layout matches the official evaluator's expectations
    (per-scene txt of 'mask_path label confidence' + 0/1 mask files)."""
    from gspn_tpu.eval.instance_eval import ScenePredictions
    from gspn_tpu.eval.scannet_export import (
        SCANNET_BENCHMARK_LABEL_IDS,
        read_scannet_submission,
        write_scannet_submission,
    )

    rng = np.random.default_rng(0)
    pred = ScenePredictions(
        masks=rng.random((3, 50)) > 0.5,
        scores=np.round(rng.random(3), 6),
        classes=np.array([1, 18, 7]),
    )
    path = write_scannet_submission(tmp_path, "scene0000_00", pred)
    lines = path.read_text().splitlines()
    assert len(lines) == 3
    rel, label, conf = lines[0].split()
    assert rel == "predicted_masks/scene0000_00_000.txt"
    assert int(label) == SCANNET_BENCHMARK_LABEL_IDS[1] == 3
    assert (tmp_path / rel).exists()
    mask_lines = (tmp_path / rel).read_text().split()
    assert set(mask_lines) <= {"0", "1"} and len(mask_lines) == 50

    back = read_scannet_submission(tmp_path, "scene0000_00")
    np.testing.assert_array_equal(back.masks, pred.masks)
    np.testing.assert_array_equal(back.classes, pred.classes)
    np.testing.assert_allclose(back.scores, pred.scores, atol=1e-6)


def test_run_eval_dump_format_scannet(tmp_path):
    run_eval.main([
        "--num-scenes", "2", "--batch", "2", "--num-points", "192",
        "--num-seeds", "8", "--num-classes", "3", "--preset", "tiny",
        "--dump-dir", str(tmp_path / "sub"), "--dump-format", "scannet",
    ])
    from gspn_tpu.eval.scannet_export import read_scannet_submission

    scenes = sorted((tmp_path / "sub").glob("scene_*.txt"))
    assert len(scenes) == 2
    back = read_scannet_submission(tmp_path / "sub", scenes[0].stem)
    assert back.masks.ndim == 2


def test_run_eval_paired_ab(tmp_path):
    """--ab-fps-segments runs a second FPS arm on the same scenes and
    reports the paired bootstrap diff: armB point APs + *_diff CIs in the
    summary; flag validation rejects missing --bootstrap and the sharded
    path."""
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res = run_eval.main([
            "--num-scenes", "4", "--batch", "2", "--num-points", "256",
            "--num-seeds", "16", "--num-classes", "3", "--preset", "tiny",
            "--fps-segments", "2", "--fps-segment-mode", "spatial",
            "--ab-fps-segments", "1", "--bootstrap", "8",
        ])
    assert set(res) >= {"ap", "ap_50", "ap_25"}
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    for k in ("ap_armB", "ap_diff", "ap_diff_mean", "ap_50_diff",
              "ap_25_diff"):
        assert k in summary, sorted(summary)
    lo, hi = summary["ap_diff"]
    assert lo <= hi

    import pytest

    # flag-combination errors fail at parse time (argparse SystemExit),
    # BEFORE checkpoint restore / arm compile (ADVICE r4)
    err = io.StringIO()
    with pytest.raises(SystemExit), contextlib.redirect_stderr(err):
        run_eval.parse_args([
            "--num-scenes", "2", "--batch", "2", "--num-points", "256",
            "--num-seeds", "16", "--num-classes", "3", "--preset", "tiny",
            "--ab-fps-segments", "1",
        ])
    assert "bootstrap" in err.getvalue()
    err = io.StringIO()
    with pytest.raises(SystemExit), contextlib.redirect_stderr(err):
        run_eval.parse_args([
            "--num-scenes", "2", "--batch", "2", "--num-points", "256",
            "--num-seeds", "16", "--num-classes", "3", "--preset", "tiny",
            "--ab-fps-segments", "1", "--bootstrap", "4",
            "--point-sharded",
        ])
    assert "incompatible" in err.getvalue()

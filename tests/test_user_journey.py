"""One test that walks the README quickstart end to end on fabricated
raw data: raw ScanNet-format scan -> preprocess -> stage-1 training ->
stage-2 training (frozen stage-1 restore) -> evaluation from checkpoints
on the same data -> AOT export -> artifact-served evaluation.

Every piece has its own unit tests; this pins the SEAMS (crop
conventions shared by trainer and eval, feature_dim derivation from real
RGB data, checkpoint/config round-trips, artifact serving shapes) so the
documented user journey cannot silently break.
"""

from __future__ import annotations

import numpy as np

from tests.test_data import _write_scannet_scene


def test_quickstart_journey(tmp_path, rng):
    from gspn_tpu.data.scannet import preprocess_to_npz
    from gspn_tpu.eval import run_eval
    from gspn_tpu.train import train_gspn, train_rpointnet

    # --- raw scans -> npz (two scenes so eval batches have > 1 scene)
    scan, _, _, _ = _write_scannet_scene(tmp_path, rng)
    npz_dir = tmp_path / "npz"
    preprocess_to_npz(scan, npz_dir)

    n_points, batch = 128, 2

    # --- stage 1 on the preprocessed data (RGB features derive fdim=3)
    g_dir = tmp_path / "gspn"
    state1 = train_gspn.main([
        "--steps", "2", "--batch", str(batch),
        "--num-points", str(n_points), "--num-seeds", "8",
        "--gt-size", "16", "--preset", "tiny",
        "--scannet-dir", str(npz_dir),
        "--log-dir", str(g_dir), "--log-every", "1", "--ckpt-every", "1",
    ])
    assert int(state1.step) == 2
    assert (g_dir / "ckpt").exists()

    # --- stage 2 restoring the frozen stage-1 checkpoint
    r_dir = tmp_path / "rpn"
    state2 = train_rpointnet.main([
        "--steps", "2", "--batch", str(batch),
        "--num-points", str(n_points), "--max-instances", "4",
        "--num-seeds", "8", "--preset", "tiny",
        "--scannet-dir", str(npz_dir),
        "--gspn-ckpt", str(g_dir / "ckpt"),
        "--log-dir", str(r_dir), "--log-every", "1", "--ckpt-every", "1",
    ])
    assert int(state2.step) == 2

    # --- evaluation from the trained checkpoints on the same data
    dump = tmp_path / "preds"
    res = run_eval.main([
        "--gspn-ckpt", str(g_dir / "ckpt"),
        "--rpointnet-ckpt", str(r_dir / "ckpt"),
        "--scannet-dir", str(npz_dir),
        "--batch", str(batch), "--num-points", str(n_points),
        "--num-seeds", "8", "--preset", "tiny",
        "--dump-dir", str(dump),
    ])
    assert "ap" in res and np.isfinite(res["ap"])
    assert any(dump.iterdir())

    # --- AOT export + artifact-served evaluation of the same checkpoints
    import sys

    sys.path.insert(0, "scripts")
    try:
        import export_serving
    finally:
        sys.path.pop(0)

    art = tmp_path / "model.gspnx"
    export_serving.main([
        "--out", str(art), "--batch", str(batch),
        "--num-points", str(n_points), "--num-seeds", "8",
        "--preset", "tiny", "--feature-dim", "3",
        "--gspn-ckpt", str(g_dir / "ckpt"),
        "--rpointnet-ckpt", str(r_dir / "ckpt"),
        "--verify",
    ])
    assert art.exists()
    res_art = run_eval.main([
        "--artifact", str(art),
        "--gspn-ckpt", str(g_dir / "ckpt"),
        "--rpointnet-ckpt", str(r_dir / "ckpt"),
        "--scannet-dir", str(npz_dir),
        "--batch", str(batch), "--num-points", str(n_points),
        "--num-seeds", "8", "--preset", "tiny",
    ])
    # the artifact serves the same math as the live pipeline
    assert abs(res_art["ap"] - res["ap"]) < 1e-6

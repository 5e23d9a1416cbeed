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

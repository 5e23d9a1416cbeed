"""Roofline model sanity: costs are positive and additive, floors/report
fields well-formed, and the flagship pipeline's analytic totals land in
the physically sensible range (the model is arithmetic over static
shapes — these tests pin its structure, not chip measurements)."""

import numpy as np

from gspn_tpu.models.presets import scannet_pipeline
from gspn_tpu.utils import roofline as rf


def test_cost_addition_and_floors():
    a = rf.Cost(mxu_flops=1e12, vpu_ops=1e10, hbm_bytes=1e9)
    b = rf.Cost(vpu_ops=3e10)
    c = a + b
    assert c.mxu_flops == 1e12 and c.vpu_ops == 4e10 and c.hbm_bytes == 1e9
    f = c.floors(rf.V5E)
    assert set(f) == {"mxu", "vpu", "hbm", "floor", "bound"}
    assert f["floor"] == max(f["mxu"], f["vpu"], f["hbm"])
    assert f["bound"] in ("mxu", "vpu", "hbm")


def test_report_fractions():
    c = rf.Cost(mxu_flops=rf.V5E.mxu_flops)  # exactly 1 second of MXU
    rep = c.report(2.0)
    assert np.isclose(rep["mfu"], 0.5)
    assert np.isclose(rep["frac_of_roof"], 0.5)
    assert rep["bound"] == "mxu"


def test_mlp_cost_formula():
    c = rf.mlp_cost(rows=100, cin=3, widths=(8, 16))
    assert c.mxu_flops == 2 * 100 * (3 * 8 + 8 * 16)
    assert c.hbm_bytes == 100 * (3 + 16) * 4


def test_train_step_cost_structure():
    """Both stages: positive, additive, physically sensible, and a train
    step costs MORE than the matching inference slice (backward pass +
    optimizer can't be free)."""
    cfg = scannet_pipeline()
    infer = rf.pipeline_cost(cfg, b=4, n=4096)
    for stage in (1, 2):
        stages = rf.train_step_cost(cfg, b=4, n=4096, gt_size=256,
                                    stage=stage)
        assert "total" in stages and "adam" in stages
        total = stages["total"]
        partial = rf.Cost()
        for k, v in stages.items():
            assert v.mxu_flops >= 0 and v.vpu_ops >= 0 and v.hbm_bytes >= 0, k
            if k != "total":
                partial = partial + v
        assert np.isclose(partial.vpu_ops, total.vpu_ops)
        assert 1e-5 < total.floors()["floor"] < 1e-2
    # stage-2 training covers the full backbone fwd+bwd: more work than
    # the whole inference pipeline at the same shapes
    s2 = rf.train_step_cost(cfg, b=4, n=4096, stage=2)["total"]
    assert s2.mxu_flops > infer["total"].mxu_flops
    assert s2.vpu_ops > 0


def test_pipeline_cost_structure():
    cfg = scannet_pipeline()
    stages = rf.pipeline_cost(cfg, b=8, n=8192)
    assert "total" in stages and "fps(shared seeds+sa1)" in stages
    total = stages["total"]
    partial = rf.Cost()
    for k, v in stages.items():
        assert v.mxu_flops >= 0 and v.vpu_ops >= 0 and v.hbm_bytes >= 0
        if k != "total":
            assert v.vpu_ops + v.mxu_flops > 0, k
            partial = partial + v
    assert np.isclose(partial.mxu_flops, total.mxu_flops)
    assert np.isclose(partial.vpu_ops, total.vpu_ops)
    assert np.isclose(partial.hbm_bytes, total.hbm_bytes)
    # physical sanity at B=8 x N=8192: total floor is sub-10ms (the
    # pipeline is small) but not sub-100us (it does real work)
    floor = total.floors()["floor"]
    assert 1e-4 < floor < 1e-2, floor

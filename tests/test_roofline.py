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


def test_fp_cost_pairing_matches_model():
    """Regression (r3 review): the FP cost stages must pair fp_mlps[i]
    with the level the BACKBONE applies it at — fp_mlps[0] at the
    deepest target, fp_mlps[-1] at the N-point target with the previous
    FP's output as source channels (models/rpointnet.py fp loop)."""
    cfg = scannet_pipeline()
    r = cfg.rpointnet
    b, n = 1, 8192
    stages = rf.pipeline_cost(cfg, b=b, n=n)
    nsa = len(r.sa_layers)
    # last FP (fp4): target = N points, source = sa1's npoint points,
    # source channels = fp3's output, skip = raw (3 + fdim)
    tgt, src = n, r.sa_layers[0].npoint
    src_c = r.fp_mlps[-2][-1]
    expect = (
        rf.three_nn_cost(b, tgt, src)
        + rf.interpolate_mm_cost(b, tgt, src, src_c)
        + rf.mlp_cost(b * tgt, src_c + 3, r.fp_mlps[-1])
    )
    got = stages[f"fp{len(r.fp_mlps)}"]
    assert np.isclose(got.mxu_flops, expect.mxu_flops)
    assert np.isclose(got.vpu_ops, expect.vpu_ops)
    # first FP (fp1): deepest target, source channels = sa-last output
    tgt1, src1 = r.sa_layers[nsa - 2].npoint, r.sa_layers[nsa - 1].npoint
    expect1 = (
        rf.three_nn_cost(b, tgt1, src1)
        + rf.interpolate_mm_cost(b, tgt1, src1, r.sa_layers[-1].mlp[-1])
        + rf.mlp_cost(
            b * tgt1,
            r.sa_layers[-1].mlp[-1] + r.sa_layers[nsa - 2].mlp[-1],
            r.fp_mlps[0],
        )
    )
    assert np.isclose(stages["fp1"].mxu_flops, expect1.mxu_flops)


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

"""Real-TPU smoke drive: exercise the public op API on the actual chip with
Pallas kernels natively compiled, cross-checking pallas vs xla paths
on-device. Run: python scripts/tpu_smoke.py"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import gspn_tpu
from gspn_tpu import ops


def main():
    print(f"gspn_tpu {gspn_tpu.__version__} | backend={jax.default_backend()} "
          f"| devices={jax.devices()}")
    assert jax.default_backend() == "tpu", "smoke test must run on the chip"

    rng = np.random.default_rng(0)
    b, n, m, k = 4, 4096, 512, 32
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    valid = jnp.asarray(np.concatenate(
        [np.ones((b, n - 512), bool), np.zeros((b, 512), bool)], axis=1))

    # --- FPS: pallas (compiled) vs xla, masked + unmasked
    for v in (None, valid):
        t0 = time.perf_counter()
        i_p = ops.farthest_point_sample(m, xyz, v, impl="pallas", interpret=False)
        i_p.block_until_ready()
        t1 = time.perf_counter()
        i_x = ops.farthest_point_sample(m, xyz, v, impl="xla")
        same = bool(jnp.all(i_p == i_x))
        print(f"fps masked={v is not None}: pallas==xla {same} "
              f"(first call incl compile {t1-t0:.2f}s)")
        assert same

    # --- segmented FPS (parallel chains, B*S sublane rows): pallas vs xla
    s_p = ops.farthest_point_sample(
        m, xyz, valid, impl="pallas", interpret=False, segments=8
    )
    s_x = ops.farthest_point_sample(m, xyz, valid, impl="xla", segments=8)
    same = bool(jnp.all(s_p == s_x))
    print(f"fps segmented (S=8, {b * 8} chain rows): pallas==xla {same}")
    assert same

    # --- spatial segmented FPS (Morton sort inside the op) — also pins
    # that the chip's morton codes/sort agree with the XLA chain path
    sp_p = ops.farthest_point_sample(
        m, xyz, valid, impl="pallas", interpret=False, segments=8,
        segment_mode="spatial",
    )
    sp_x = ops.farthest_point_sample(
        m, xyz, valid, impl="xla", segments=8, segment_mode="spatial"
    )
    same = bool(jnp.all(sp_p == sp_x))
    nuniq = int(np.unique(np.asarray(sp_p)).size)
    print(f"fps spatial-segmented (S=8): pallas==xla {same}, "
          f"{nuniq} unique picks")
    assert same

    centers = ops.gather_point(xyz, i_p)

    # --- ball query: pallas vs xla
    bi_p, bc_p = ops.query_ball_point(0.4, k, xyz, centers, valid,
                                      impl="pallas", interpret=False)
    bi_x, bc_x = ops.query_ball_point(0.4, k, xyz, centers, valid, impl="xla")
    print(f"ball_query: idx match {bool(jnp.all(bi_p == bi_x))}, "
          f"cnt match {bool(jnp.all(bc_p == bc_x))}, "
          f"mean cnt {float(jnp.mean(bc_p)):.1f}")
    assert bool(jnp.all(bi_p == bi_x)) and bool(jnp.all(bc_p == bc_x))

    # probe: far-away queries -> empty rows
    far = jnp.full((b, 8, 3), 1e3, jnp.float32)
    fi, fc = ops.query_ball_point(0.4, k, xyz, far, impl="pallas", interpret=False)
    assert bool(jnp.all(fc == 0)) and bool(jnp.all(fi == 0))
    print("ball_query probe (far queries): empty rows OK")

    # --- fused chunked ball-query+group kernel (multi-scale, early exit)
    fused = ops.query_ball_group_multi(
        (0.2, 0.4), (16, k), xyz, centers, valid,
        impl="pallas", interpret=False,
    )
    for (fgi, fgc, fgx), r, kk in zip(fused, (0.2, 0.4), (16, k), strict=True):
        ri, rc = ops.query_ball_point(r, kk, xyz, centers, valid, impl="xla")
        want = ops.group_point(xyz, ri) - centers[:, :, None, :]
        assert bool(jnp.all(fgi == ri)), f"fused idx mismatch r={r}"
        assert bool(jnp.all(fgc == rc)), f"fused cnt mismatch r={r}"
        assert bool(jnp.all(fgx == want)), f"fused grouped mismatch r={r}"
    print("fused ball_group (2 scales, chunked+early-exit): idx/cnt/coords match")

    # --- rank-order extraction schedule (r4): exact same outputs, no
    # serial per-hit chain — must match the xla path on the real chip
    fused_r = ops.query_ball_group_multi(
        (0.2, 0.4), (16, k), xyz, centers, valid,
        impl="pallas", interpret=False, extract="rank",
    )
    for (fgi, fgc, fgx), (ri, rc, rx) in zip(fused_r, fused, strict=True):
        assert bool(jnp.all(fgi == ri)), "rank-extract idx mismatch"
        assert bool(jnp.all(fgc == rc)), "rank-extract cnt mismatch"
        assert bool(jnp.all(fgx == rx)), "rank-extract coords mismatch"
    print("ball_group extract='rank': matches serial schedule on-chip")

    # --- strided selection (r5 subsample-robust mode): the two-phase
    # targeted-extraction kernel must match the XLA systematic-sample
    # path on the real chip (radii big enough that striding engages)
    fused_s = ops.query_ball_group_multi(
        (0.5, 0.9), (16, k), xyz, centers, valid,
        impl="pallas", interpret=False, select="strided",
    )
    for (fgi, fgc, fgx), r, kk in zip(
        fused_s, (0.5, 0.9), (16, k), strict=True
    ):
        ri, rc = ops.query_ball_point(
            r, kk, xyz, centers, valid, impl="xla", select="strided"
        )
        want = ops.group_point(xyz, ri) - centers[:, :, None, :]
        assert bool(jnp.all(fgi == ri)), f"strided idx mismatch r={r}"
        assert bool(jnp.all(fgc == rc)), f"strided cnt mismatch r={r}"
        assert bool(jnp.all(fgx == want)), f"strided grouped mismatch r={r}"
    si, sc = ops.query_ball_point(
        0.5, 16, xyz, centers, valid, impl="pallas", interpret=False,
        select="strided",
    )
    assert bool(jnp.all(si == fused_s[0][0]))
    assert bool(jnp.all(sc == fused_s[0][1]))
    print("ball_group/ball_query select='strided': pallas==xla on-chip")

    # --- fused in-box RoI extraction kernel vs mask+top_k
    from gspn_tpu.ops.box_group import query_box_group

    bc = jnp.asarray(rng.uniform(-1, 1, (b, 64, 3)).astype(np.float32))
    be = jnp.asarray(rng.uniform(0.1, 0.6, (b, 64, 3)).astype(np.float32))
    boxes = jnp.concatenate([bc - be, bc + be], axis=-1)
    gi_p, gc_p, gl_p = query_box_group(boxes, 16, xyz, valid,
                                       impl="pallas", interpret=False)
    gi_x, gc_x, gl_x = query_box_group(boxes, 16, xyz, valid, impl="xla")
    assert bool(jnp.all(gi_p == gi_x)), "box_group idx mismatch"
    assert bool(jnp.all(gc_p == gc_x)), "box_group cnt mismatch"
    assert bool(jnp.all(gl_p == gl_x)), "box_group coords mismatch"
    print(f"box_group (64 RoIs, S=16): idx/cnt/coords pallas==xla, "
          f"mean cnt {float(jnp.mean(gc_p)):.1f}")
    ri_p, rc_p, rl_p = query_box_group(boxes, 16, xyz, valid,
                                       impl="pallas", interpret=False,
                                       extract="rank")
    assert bool(jnp.all(ri_p == gi_x)), "box_group rank idx mismatch"
    assert bool(jnp.all(rc_p == gc_x)), "box_group rank cnt mismatch"
    assert bool(jnp.all(rl_p == gl_x)), "box_group rank coords mismatch"
    print("box_group extract='rank': matches xla on-chip")
    si_p, sc_p, sl_p = query_box_group(boxes, 16, xyz, valid,
                                       impl="pallas", interpret=False,
                                       select="strided")
    si_x, sc_x, sl_x = query_box_group(boxes, 16, xyz, valid, impl="xla",
                                       select="strided")
    assert bool(jnp.all(si_p == si_x)), "box_group strided idx mismatch"
    assert bool(jnp.all(sc_p == sc_x)), "box_group strided cnt mismatch"
    assert bool(jnp.all(sl_p == sl_x)), "box_group strided coords mismatch"
    print("box_group select='strided': matches xla on-chip")

    # --- tiled-M three_nn (large source sets stay in VMEM)
    td, ti = ops.three_nn(xyz[:, :512], xyz, valid, impl="pallas", interpret=False)
    xd, xi = ops.three_nn(xyz[:, :512], xyz, valid, impl="xla")
    assert bool(jnp.all(ti == xi)), "tiled three_nn idx mismatch"
    assert bool(jnp.all(jnp.abs(td - xd) <= 1e-6 + 3e-7 * jnp.abs(xd)))
    print(f"tiled three_nn (M={n} sources): pallas==xla")

    # degenerate masks: < 3 valid sources must give distinct top_k-equal
    # indices on the REAL chip too (Mosaic accepts less than interpret)
    vdeg = jnp.zeros((b, n), bool).at[:, 1234].set(True)
    dd, di2 = ops.three_nn(xyz[:, :512], xyz, vdeg, impl="pallas", interpret=False)
    xd2, xi2d = ops.three_nn(xyz[:, :512], xyz, vdeg, impl="xla")
    assert bool(jnp.all(di2 == xi2d)), "degenerate-mask three_nn idx mismatch"
    print("three_nn degenerate mask (1 valid source): pallas==xla")

    # --- MXU sparse-matmul interpolation vs exact gather path
    feats = jax.random.normal(jax.random.PRNGKey(3), (b, n, 64), jnp.float32)
    w = ops.three_interpolate_weights(td)
    exact = ops.three_interpolate(feats, ti, w)
    fast = ops.three_interpolate_mm(feats, ti, w, interpret=False)
    err = jnp.max(jnp.abs(exact - fast))
    assert bool(err <= 2e-6 + 2e-6 * jnp.max(jnp.abs(exact))), f"mm err {err}"
    print(f"three_interpolate_mm (MXU): max |diff| {float(err):.2e}")

    # --- chamfer: pallas vs xla + grad flows on-device
    ya = xyz[:, :1024]
    yb = xyz[:, 1024:2048]
    d1p, i1p, d2p, i2p = ops.nn_distance(ya, yb, impl="pallas", interpret=False)
    d1x, i1x, d2x, i2x = ops.nn_distance(ya, yb, impl="xla")
    print(f"nn_distance: idx match {bool(jnp.all(i1p == i1x) and jnp.all(i2p == i2x))}")
    assert bool(jnp.all(i1p == i1x)) and bool(jnp.all(i2p == i2x))
    g = jax.grad(lambda a: ops.chamfer_loss(a, yb, impl="pallas"))(ya)
    assert bool(jnp.all(jnp.isfinite(g)))
    print(f"chamfer grad on-device: finite, norm={float(jnp.linalg.norm(g)):.4f}")

    # --- full grouped pipeline under one jit on the chip
    @jax.jit
    def pipeline(p, v):
        si = ops.farthest_point_sample(512, p, v, impl="pallas", interpret=False)
        cen = ops.gather_point(p, si)
        gi, cnt = ops.query_ball_point(0.4, 32, p, cen, v,
                                       impl="pallas", interpret=False)
        grouped = ops.group_point(p, gi) - cen[:, :, None, :]
        dist, idx = ops.three_nn(p, cen)
        w = ops.three_interpolate_weights(dist)
        feat = ops.three_interpolate(cen, idx, w)
        keep = ops.nms_3d_batched(
            jnp.concatenate([cen - 0.2, cen + 0.2], -1),
            jnp.linalg.norm(cen, axis=-1), 0.25)
        return grouped, cnt, feat, keep

    from gspn_tpu.utils.timing import time_fn

    dt = time_fn(pipeline, xyz, valid, iters=10)
    print(f"fused pipeline (fps+ball+group+3nn+interp+nms, B={b}, N={n}): "
          f"{dt*1e3:.2f} ms/iter, {b*n/dt/1e6:.1f} Mpts/s")

    # --- PointNet++ SA+FP stack on the chip (BASELINE config 2 shape)
    from gspn_tpu import nn as gnn

    sa = gnn.PointNetSAModule(npoint=1024, radius=0.2, nsample=32,
                              mlp=(64, 64, 128))
    key = jax.random.PRNGKey(0)
    sa_vars = sa.init(key, xyz[:1], None, None, train=False)

    @jax.jit
    def sa_fwd(v, p, msk):
        return sa.apply(v, p, None, msk, train=False)

    nx, feat, nv = sa_fwd(sa_vars, xyz, valid)
    dt = time_fn(sa_fwd, sa_vars, xyz, valid, iters=10)
    assert feat.shape == (b, 1024, 128) and bool(jnp.all(jnp.isfinite(feat)))
    print(f"SA module (N={n}->1024, K=32, mlp 64-64-128): {dt*1e3:.2f} ms/iter, "
          f"{b*n/dt/1e6:.1f} Mpts/s")

    # --- perf-path kernels on chip: three_nn, mask projection, NMS
    d_p, i_p3 = ops.three_nn(xyz, nx, impl="pallas", interpret=False)
    d_x, i_x3 = ops.three_nn(xyz, nx, impl="xla")
    assert bool(jnp.all(i_p3 == i_x3)), "three_nn pallas != xla"
    print("three_nn pallas==xla: True")
    sampled = xyz[:, None, :16, :].repeat(8, 1)
    logits = jnp.ones((b, 8, 16))
    mp = ops.nearest_sample_logit(xyz, sampled, logits, impl="pallas", interpret=False)
    mx = ops.nearest_sample_logit(xyz, sampled, logits, impl="xla")
    assert bool(jnp.all(jnp.abs(mp - mx) < 1e-6)), "mask projection mismatch"
    print("mask projection pallas==xla: True")
    # box-pruned variant: exact (vs dense) for every in-box point
    pbx = jnp.concatenate(
        [sampled.min(2) - 0.05, sampled.max(2) + 0.05], -1
    )  # (b, 8, 6)
    mb = ops.nearest_sample_logit_boxed(
        xyz, sampled, logits, pbx, impl="pallas", interpret=False,
        roi_block=8, tile_n=1024,
    )
    inbox = jnp.all(
        jnp.logical_and(
            xyz[:, None, :, :] >= pbx[..., None, 0:3],
            xyz[:, None, :, :] <= pbx[..., None, 3:6],
        ),
        axis=-1,
    )
    assert bool(jnp.any(inbox)), "boxed smoke: degenerate (no in-box points)"
    assert bool(
        jnp.all(jnp.where(inbox, mb == mp, True))  # vs PALLAS dense: bitwise
    ), "boxed mask projection mismatch inside boxes"
    print("mask projection boxed (pruned) == dense inside boxes: True")
    bx = jnp.concatenate([nx - 0.1, nx + 0.1], -1)
    sc = jnp.linalg.norm(nx, axis=-1)
    kp = ops.nms_3d_batched(bx, sc, 0.3, impl="pallas", interpret=False)
    kx = ops.nms_3d_batched(bx, sc, 0.3, impl="xla")
    assert bool(jnp.all(kp == kx)), "nms mismatch"
    print("nms pallas==xla: True")

    fp = gnn.PointNetFPModule(mlp=(128, 128))
    fp_vars = fp.init(key, xyz[:1], nx[:1], None, feat[:1], train=False)

    @jax.jit
    def fp_fwd(v, p, c, f):
        return fp.apply(v, p, c, None, f, train=False)

    up = fp_fwd(fp_vars, xyz, nx, feat)
    jax.block_until_ready(up)
    assert up.shape == (b, n, 128) and bool(jnp.all(jnp.isfinite(up)))
    print(f"FP module (1024->{n}): OK")
    print("TPU SMOKE: ALL OK")


if __name__ == "__main__":
    main()

"""Analytic FLOPs/bytes roofline model — the absolute yardstick for the
perf numbers (VERDICT r2 item #2).

Every hot op in this pipeline is statically shaped, so its minimum work is
*arithmetic*, not profiling: this module builds per-stage :class:`Cost`
(MXU FLOPs / VPU ops / minimum HBM bytes) from the pipeline config and
divides by chip peaks to get the time floor each stage cannot beat and the
roof it sits under. ``scripts/profile_roofline.py`` pairs these floors
with measured times; ``bench.py`` emits the resulting ``mfu``.

Chip peaks (TPU v5e, public numbers; VPU derived):

- MXU: 197 TFLOP/s bf16 (4 MXUs x 128x128 x 2 FLOP x ~1.5 GHz clock).
  Default-precision f32 matmuls run as single bf16 passes on this chip
  (see CLAUDE.md), so the same peak applies; HIGHEST-precision f32 is
  ~3x slower (3-pass decomposition).
- VPU: 8x128 lanes x 4 ALUs x ~1.5 GHz ~= 6.1e12 f32 elementwise op/s.
  Cross-lane reduces cost several passes; the model counts them as the
  documented per-formula op counts, so "fraction of VPU peak" for
  reduce-heavy kernels is an upper bound on achievable.
- HBM: 819 GB/s. Byte counts are fusion-optimal minimums (each tensor
  read/written once); XLA materializing an intermediate raises real
  traffic above the floor, never below.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Peaks:
    name: str
    mxu_flops: float  # bf16 / default-precision-f32 matmul FLOP/s
    vpu_ops: float  # f32 elementwise op/s
    hbm_bytes: float  # bytes/s


V5E = Peaks("v5e", 197e12, 6.1e12, 819e9)


@dataclasses.dataclass
class Cost:
    mxu_flops: float = 0.0
    vpu_ops: float = 0.0
    hbm_bytes: float = 0.0

    def __add__(self, o: "Cost") -> "Cost":
        return Cost(
            self.mxu_flops + o.mxu_flops,
            self.vpu_ops + o.vpu_ops,
            self.hbm_bytes + o.hbm_bytes,
        )

    def floors(self, peaks: Peaks = V5E) -> dict:
        """Per-roof time floors (seconds) and the binding roof."""
        t = {
            "mxu": self.mxu_flops / peaks.mxu_flops,
            "vpu": self.vpu_ops / peaks.vpu_ops,
            "hbm": self.hbm_bytes / peaks.hbm_bytes,
        }
        bound = max(t, key=t.get)
        return {**t, "floor": t[bound], "bound": bound}

    def report(self, measured_s: float, peaks: Peaks = V5E) -> dict:
        """Floors + achieved fractions for a measured time."""
        f = self.floors(peaks)
        return {
            **f,
            "measured": measured_s,
            "frac_of_roof": f["floor"] / measured_s if measured_s else 0.0,
            "mfu": (
                self.mxu_flops / (measured_s * peaks.mxu_flops)
                if measured_s
                else 0.0
            ),
        }


# ---------------------------------------------------------------------------
# Cost builders (shapes static; formulas documented inline)
# ---------------------------------------------------------------------------

_B = 4  # f32 bytes


def mlp_cost(rows: int, cin: int, widths, extra_in: int = 0) -> Cost:
    """Shared-MLP / FC stack applied to ``rows`` independent rows.

    MXU: 2*rows*sum(cin_i*cout_i). HBM floor: read input once + write the
    final output once (BN/bias/relu fuse into the matmuls; weights are
    negligible and VMEM-resident). VPU: ~4 ops/elem per layer output
    (bias + BN scale/shift + relu)."""
    c = Cost()
    ci = cin + extra_in
    for w in widths:
        c.mxu_flops += 2.0 * rows * ci * w
        c.vpu_ops += 4.0 * rows * w
        ci = w
    c.hbm_bytes += rows * (cin + extra_in + ci) * _B
    return c


def fps_cost(b: int, n: int, npoint: int) -> Cost:
    """Greedy FPS: npoint sequential steps, each one fused (B, N) VPU
    pass: one-hot coord extract (~8 ops/elem), distance (8), min (1),
    argmax (~2), deposit (~1) -> ~20 ops/elem/step."""
    return Cost(
        vpu_ops=20.0 * b * n * npoint,
        hbm_bytes=(b * n * 4 + b * npoint) * _B,
    )


def ball_group_cost(
    b: int,
    m: int,
    n: int,
    nsamples,
    nw: int = 128,
    scan_frac: float = 1.0,
    extract_infl: float = 2.0,
) -> Cost:
    """Fused multi-scale ball query+group (ops/ball_group.py).

    Scan: one shared distance pass over scanned points (~9 ops/elem,
    + ~3/scale for hit masks); ``scan_frac`` = fraction of N scanned
    before early exit. Extraction: per extracted hit, ~12 passes over a
    (TM, NW) window shared by TM rows -> ~12*NW ops per hit per row
    extracted in lockstep; ``extract_infl`` models windows whose worst
    row forces extra steps (measured ~2 on uniform scenes)."""
    scanned = n * scan_frac
    c = Cost(vpu_ops=(9.0 + 3.0 * len(nsamples)) * b * m * scanned)
    for k in nsamples:
        c.vpu_ops += 12.0 * nw * extract_infl * k * b * m
        c.hbm_bytes += b * m * k * 4 * _B  # idx + 3 local-coord planes
    c.hbm_bytes += b * n * 4 * _B + b * m * 4 * _B
    return c


def three_nn_cost(b: int, n: int, m: int) -> Cost:
    """Brute-force 3-NN: distance (8 ops) + running-top-3 maintenance
    (~12 ops) per (target, source) pair."""
    return Cost(
        vpu_ops=20.0 * b * n * m,
        hbm_bytes=(b * n * 3 + b * m * 3 + b * n * 6) * _B,
    )


def interpolate_mm_cost(b: int, n: int, m: int, c: int) -> Cost:
    """MXU sparse-matmul interpolation: W (N, Mpad) @ pts (Mpad, Cpad)
    per batch; W build is ~6 VPU ops/elem."""
    mpad = ((m + 127) // 128) * 128
    cpad = ((c + 127) // 128) * 128
    return Cost(
        mxu_flops=2.0 * b * n * mpad * cpad,
        vpu_ops=6.0 * b * n * mpad,
        hbm_bytes=b * (n * 3 * 2 + m * c + n * c) * _B,
    )


def gather_cost(rows: int, c: int) -> Cost:
    """Row gather (group_point / gather_point): HBM-bound; ~2 VPU
    ops/elem of address math."""
    return Cost(vpu_ops=2.0 * rows * c, hbm_bytes=2.0 * rows * c * _B)


def nms_cost(b: int, r: int, jacobi_steps: int = 16) -> Cost:
    """IoU matrix (B, R, R) ~20 ops/pair + argsort (~log2(r) passes) +
    Jacobi fixpoint sweeps (~4 ops/pair/step)."""
    return Cost(
        vpu_ops=b * r * r * (20.0 + 4.0 * jacobi_steps)
        + b * r * max(r.bit_length(), 1) * 4.0,
        hbm_bytes=b * r * 8.0 * _B,
    )


def mask_project_cost(b: int, r: int, n: int, s: int) -> Cost:
    """Per (roi, point): inside-box test (~12 ops) + nearest-of-S-samples
    scan (5 ops per sample pair)."""
    return Cost(
        vpu_ops=b * r * n * (12.0 + 5.0 * s),
        hbm_bytes=b * (r * n + n * 3 + r * s * 4) * _B,
    )


# ---------------------------------------------------------------------------
# Whole-pipeline model
# ---------------------------------------------------------------------------


def pipeline_cost(cfg, b: int, n: int) -> dict[str, Cost]:
    """Per-stage Cost for the fused instance-seg inference pipeline at
    batch ``b`` x ``n`` points (flagship datapath; cfg is a
    PipelineConfig). Returns {stage: Cost} plus key 'total'."""
    g, r = cfg.gspn, cfg.rpointnet
    s = cfg.num_seeds
    fdim = g.feature_dim
    stages: dict[str, Cost] = {}

    sa1_p = r.sa_layers[0].npoint
    stages["fps(shared seeds+sa1)"] = fps_cost(b, n, max(s, sa1_p))

    # GSPN: multi-scale context crops + per-scale encoder + CVAE + generator
    c = ball_group_cost(b, s, n, g.context_nsample)
    for k in g.context_nsample:
        c = c + mlp_cost(b * s * k, 3 + fdim, g.encoder_mlp)
        c = c + mlp_cost(b * s * k, 3 + fdim, g.center_mlp)
    rows = b * s
    c = c + mlp_cost(rows, len(g.context_nsample) * g.encoder_mlp[-1], g.center_fc + (3,))
    c = c + mlp_cost(rows, len(g.context_nsample) * g.encoder_mlp[-1], (g.cond_dim,))
    c = c + mlp_cost(rows, g.cond_dim + g.latent_dim, g.generator_fc + (g.num_gen_points * 3,))
    c = c + mlp_cost(rows, g.cond_dim, g.objectness_fc + (1,))
    stages["gspn forward"] = c

    stages["nms"] = nms_cost(b, s)

    # backbone SA stack
    xs_n = n
    cin = 3 + fdim
    for i, spec in enumerate(r.sa_layers):
        c = ball_group_cost(b, spec.npoint, xs_n, (spec.nsample,))
        if i > 0:
            c = c + gather_cost(b * spec.npoint * spec.nsample, cin - 3)
        c = c + mlp_cost(b * spec.npoint * spec.nsample, cin, spec.mlp)
        if i > 0:  # sa2+ re-run fps on the previous level's points
            c = c + fps_cost(b, xs_n, spec.npoint)
        stages[f"sa{i + 1}"] = c
        xs_n = spec.npoint
        cin = spec.mlp[-1] + 3
    # FP stack — mirrors the backbone exactly (models/rpointnet.py:142):
    # fp_mlps[0] runs FIRST at the DEEPEST target level (sa[nsa-1]'s
    # points, source = sa[nsa]'s); fp_mlps[-1] runs last at the N-point
    # level. Source channels chain: sa-last output, then each FP's
    # mlp[-1]; skip channels are the target level's SA output.
    nsa = len(r.sa_layers)
    lvl_n = [n] + [sp.npoint for sp in r.sa_layers]
    lvl_c = [3 + fdim] + [sp.mlp[-1] for sp in r.sa_layers]
    src_c = lvl_c[-1]
    for i, mlp in enumerate(r.fp_mlps):
        lvl = nsa - 1 - i  # target level (matches the model's fp{i+1})
        tgt, src = lvl_n[lvl], lvl_n[lvl + 1]
        c = three_nn_cost(b, tgt, src)
        c = c + interpolate_mm_cost(b, tgt, src, src_c)
        c = c + mlp_cost(b * tgt, src_c + lvl_c[lvl], mlp)
        stages[f"fp{i + 1}"] = c
        src_c = mlp[-1]

    # RoI align + heads + mask projection (per-point features = the LAST
    # FP's output width)
    feat_c = r.fp_mlps[-1][-1]
    rois = s
    c = gather_cost(b * rois * r.roi_samples, feat_c + 3)
    c = c + mlp_cost(b * rois * r.roi_samples, feat_c + 3, r.roi_mlp)
    pooled = r.roi_mlp[-1]
    c = c + mlp_cost(b * rois, pooled, r.cls_fc + (r.num_classes + 1,))
    c = c + mlp_cost(b * rois, pooled, r.box_fc + (6,))
    c = c + mlp_cost(b * rois * r.roi_samples, r.roi_mlp[-1], r.mask_mlp + (1,))
    stages["roi+heads"] = c
    stages["mask project"] = mask_project_cost(b, rois, n, r.roi_samples)

    total = Cost()
    for v in stages.values():
        total = total + v
    stages["total"] = total
    return stages


# ---------------------------------------------------------------------------
# Training-step model
# ---------------------------------------------------------------------------


def _with_grad(c: Cost) -> Cost:
    """Forward + backward for a parameterized (matmul-dominated) stage:
    dgrad + wgrad double the matmul FLOPs (3x total), activations are
    re-read and grads written (~3x the fusion-optimal HBM floor), and
    elementwise work roughly triples (recompute/chain-rule passes)."""
    return Cost(3.0 * c.mxu_flops, 3.0 * c.vpu_ops, 3.0 * c.hbm_bytes)


def _adam_cost(params: float) -> Cost:
    """Adam update: ~10 VPU ops/param; read params+m+v+grad, write
    params+m+v (~7 tensors)."""
    return Cost(vpu_ops=10.0 * params, hbm_bytes=7.0 * params * _B)


def _mlp_params(cin: int, widths) -> float:
    p, ci = 0.0, cin
    for w in widths:
        p += ci * w + 3.0 * w  # kernel + bias + BN scale/shift
        ci = w
    return p


def train_step_cost(cfg, b: int, n: int, gt_size: int = 256,
                    stage: int = 1) -> dict[str, Cost]:
    """Per-stage Cost for one jitted TRAIN step (train/steps.py) at
    batch ``b`` x ``n`` points. ``stage`` 1 = GSPN CVAE (context crops +
    recognition net + chamfer/KL losses + adam); 2 = R-PointNet with
    frozen-GSPN proposals (frozen forward is fwd-only; backbone + heads
    take the backward pass). Index-producing point ops (FPS, ball query
    structure, NMS) carry no gradient and stay fwd-only. The backward
    multipliers are the standard 3x-matmul approximation — floors, not
    exact counts; measured times sit above them."""
    g, r = cfg.gspn, cfg.rpointnet
    s = cfg.num_seeds
    fdim = g.feature_dim
    infer = pipeline_cost(cfg, b, n)
    stages: dict[str, Cost] = {}

    if stage == 1:
        stages["fps(seeds)"] = fps_cost(b, n, s)
        # context crops: structure fwd-only; the encoder/center/CVAE/
        # generator/objectness MLP work is inside infer's "gspn forward",
        # which also contains the (fwd-only) ball_group cost — separate
        # them so only the MLP share gets the backward multiplier.
        crops = ball_group_cost(b, s, n, g.context_nsample)
        mlps = infer["gspn forward"] + Cost(
            -crops.mxu_flops, -crops.vpu_ops, -crops.hbm_bytes
        )
        stages["context crops"] = crops
        stages["gspn mlps fwd+bwd"] = _with_grad(mlps)
        # recognition net: encodes the GT instance set (train only)
        stages["recognition net"] = _with_grad(
            mlp_cost(b * s * gt_size, 3, g.encoder_mlp)
        )
        # chamfer: (gen, gt) distance matrix both directions in one pass
        # (~20 ops/pair) + gather re-expression grads (~2x)
        stages["chamfer loss"] = Cost(
            vpu_ops=2.0 * 20.0 * b * s * g.num_gen_points * gt_size,
            hbm_bytes=b * s * (g.num_gen_points + gt_size) * 3 * 2 * _B,
        )
        params = (
            len(g.context_nsample)
            * (_mlp_params(3 + fdim, g.encoder_mlp)
               + _mlp_params(3 + fdim, g.center_mlp))
            + _mlp_params(len(g.context_nsample) * g.encoder_mlp[-1],
                          g.center_fc + (3,))
            + 2 * _mlp_params(len(g.context_nsample) * g.encoder_mlp[-1],
                              (g.cond_dim,))
            + _mlp_params(g.cond_dim + g.latent_dim,
                          g.generator_fc + (g.num_gen_points * 3,))
            + _mlp_params(g.cond_dim, g.objectness_fc + (1,))
        )
        stages["adam"] = _adam_cost(params)
    else:
        # frozen GSPN proposals: forward only
        stages["fps(shared)"] = infer["fps(shared seeds+sa1)"]
        stages["frozen gspn fwd"] = infer["gspn forward"]
        # backbone + heads: fwd + bwd
        for name in list(infer):
            if name.startswith(("sa", "fp")) or name == "roi+heads":
                stages[f"{name} fwd+bwd"] = _with_grad(infer[name])
        # fg/bg matching: IoU of (R rois x I instances) boxes
        stages["roi matching"] = Cost(vpu_ops=20.0 * b * (2 * s) * 32)
        params = 0.0
        cin = 3 + fdim
        for spec in r.sa_layers:
            params += _mlp_params(cin, spec.mlp)
            cin = spec.mlp[-1] + 3
        lvl_c = [3 + fdim] + [sp.mlp[-1] for sp in r.sa_layers]
        src_c = lvl_c[-1]
        for i, mlp in enumerate(r.fp_mlps):
            params += _mlp_params(src_c + lvl_c[len(r.sa_layers) - 1 - i], mlp)
            src_c = mlp[-1]
        params += _mlp_params(r.fp_mlps[-1][-1] + 3, r.roi_mlp)
        pooled = r.roi_mlp[-1]
        params += _mlp_params(pooled, r.cls_fc + (r.num_classes + 1,))
        params += _mlp_params(pooled, r.box_fc + (6,))
        params += _mlp_params(r.roi_mlp[-1], r.mask_mlp + (1,))
        stages["adam"] = _adam_cost(params)

    total = Cost()
    for v in stages.values():
        total = total + v
    stages["total"] = total
    return stages

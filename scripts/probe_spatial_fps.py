"""Probe: device-side Morton bucketing INSIDE the FPS op.

Question (round 4): segmented FPS's whole-scene 1.4x win was falsified as
a default because (a) segments on raw layout partition arbitrarily (AP
0.248 -> 0.151) and (b) Morton-sorting the DATA breaks first-K ball
grouping (AP collapse, STATUS mechanism note). A third option was never
measured: sort spatially *inside the FPS op only* — Morton codes +
stable co-sort on device, contiguous chains over the sorted view, map
selected indices back through the permutation — leaving the scene layout
raw for grouping. This probe prices that option's sort overhead on-chip,
standalone, before any plumbing is built.

Arms (interleaved same-window, median of rounds):
  exact      — farthest_point_sample(P, xyz, valid)
  seg8       — segments=8 contiguous on raw layout (current knob)
  spatial8   — codes + 6-operand lax.sort + seg8 contiguous + map back
  spatial8g  — codes + argsort + gather variant (same semantics)
  sortonly   — codes + 6-operand sort (no FPS), to isolate sort cost

    python scripts/probe_spatial_fps.py > /tmp/probe_spatial.txt 2>&1
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ROUNDS, ITERS = 6, 8


def main():
    from gspn_tpu import ops
    from gspn_tpu.ops.morton import morton_codes
    from gspn_tpu.utils.timing import time_fn

    def spatial_sort6(xyz, valid):
        codes = morton_codes(xyz, valid)
        b, n, _ = xyz.shape
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
        vf = (
            jnp.ones((b, n), jnp.float32)
            if valid is None
            else valid.astype(jnp.float32)
        )
        _, sx, sy, sz, sidx, svf = jax.lax.sort(
            (codes, xyz[..., 0], xyz[..., 1], xyz[..., 2], iota, vf),
            dimension=1,
            num_keys=1,
            is_stable=True,
        )
        sxyz = jnp.stack([sx, sy, sz], axis=-1)
        return sxyz, svf > 0.5, sidx

    def spatial_gather(xyz, valid):
        codes = morton_codes(xyz, valid)
        sidx = jnp.argsort(codes, axis=-1, stable=True).astype(jnp.int32)
        sxyz = jnp.take_along_axis(xyz, sidx[..., None], axis=1)
        svalid = (
            None
            if valid is None
            else jnp.take_along_axis(valid, sidx, axis=1)
        )
        return sxyz, svalid, sidx

    def make_arms(p, segs):
        def exact(xyz, valid):
            return ops.farthest_point_sample(p, xyz, valid)

        def seg(xyz, valid):
            return ops.farthest_point_sample(
                p, xyz, valid, segments=segs, segment_mode="contiguous"
            )

        def spatial(xyz, valid):
            sxyz, svalid, sidx = spatial_sort6(xyz, valid)
            gidx = ops.farthest_point_sample(
                p, sxyz, svalid, segments=segs, segment_mode="contiguous"
            )
            return jnp.take_along_axis(sidx, gidx, axis=1)

        def spatialg(xyz, valid):
            sxyz, svalid, sidx = spatial_gather(xyz, valid)
            gidx = ops.farthest_point_sample(
                p, sxyz, svalid, segments=segs, segment_mode="contiguous"
            )
            return jnp.take_along_axis(sidx, gidx, axis=1)

        def sortonly(xyz, valid):
            return spatial_sort6(xyz, valid)[2]

        return {
            "exact": exact,
            f"seg{segs}": seg,
            f"spatial{segs}": spatial,
            f"spatial{segs}g": spatialg,
            "sortonly": sortonly,
        }

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    for name, b, n, p, masked in (
        ("whole-scene", 1, 65536, 1024, True),
        ("flagship", 8, 8192, 1024, False),
    ):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(
            rng.standard_normal((b, n, 3)).astype(np.float32)
        )
        valid = None
        if masked:
            v = np.ones((b, n), bool)
            v[:, int(n * 0.9):] = False
            valid = jnp.asarray(v)
        arms = {
            k: jax.jit(fn) for k, fn in make_arms(p, 8).items()
        }
        # warm all arms first so compile never lands inside a timing
        for fn in arms.values():
            jax.tree_util.tree_map(
                lambda x: x, fn(xyz, valid)
            )
        samples = {k: [] for k in arms}
        for _ in range(ROUNDS):
            for k, fn in arms.items():
                samples[k].append(
                    time_fn(fn, xyz, valid, iters=ITERS, warmup=1)
                )
        print(f"\n== {name} B={b} N={n} P={p} masked={masked}")
        for k, v in samples.items():
            med = float(np.median(v)) * 1e3
            print(f"  {k:12s} {med:7.3f} ms  (all: "
                  + " ".join(f"{x*1e3:.2f}" for x in v) + ")",
                  flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.1f}s")

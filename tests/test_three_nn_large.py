"""Large-M three_nn paths (VERDICT round-1 item #8): the tiled-M Pallas
kernel and the lax.scan chunked XLA fallback must match the materialized
top_k reference exactly, including lowest-index tie-breaks and masking."""

import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu import ops
from gspn_tpu.ops.common import masked_sqdist
from gspn_tpu.ops.interpolate import (
    _three_nn_pallas_tiled,
    _three_nn_xla_chunked,
)


def _reference(xyz1, xyz2, valid2):
    import jax

    d2 = masked_sqdist(xyz1, xyz2, valid2)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


@pytest.mark.parametrize("masked", [False, True])
def test_tiled_kernel_matches_reference(rng, masked):
    b, n, m = 2, 100, 3000  # m spans two 2048-lane chunks
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    valid2 = jnp.asarray(rng.random((b, m)) > 0.3) if masked else None
    dist, idx = _three_nn_pallas_tiled(xyz1, xyz2, valid2, interpret=True)
    rdist, ridx = _reference(xyz1, xyz2, valid2)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    # distances to 1-ulp (XLA fuses the 3-term sum differently per shape)
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(rdist), rtol=3e-7, atol=1e-8
    )


def test_tiled_kernel_exact_ties(rng):
    """Duplicate points across chunk boundaries: lowest index must win."""
    b, n = 1, 8
    base = rng.uniform(-1, 1, (b, 2600, 3)).astype(np.float32)
    base[0, 2500] = base[0, 10]  # duplicate of an early point, later chunk
    base[0, 2599] = base[0, 10]
    xyz2 = jnp.asarray(base)
    xyz1 = jnp.asarray(base[:, 10:10 + n].copy())
    dist, idx = _three_nn_pallas_tiled(xyz1, xyz2, None, interpret=True)
    rdist, ridx = _reference(xyz1, xyz2, None)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    assert int(idx[0, 0, 0]) == 10  # the earliest duplicate


@pytest.mark.parametrize("masked", [False, True])
def test_xla_chunked_matches_reference(rng, masked):
    b, n, m = 2, 64, 5000
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    valid2 = jnp.asarray(rng.random((b, m)) > 0.3) if masked else None
    dist, idx = _three_nn_xla_chunked(xyz1, xyz2, valid2, chunk=1024)
    rdist, ridx = _reference(xyz1, xyz2, valid2)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(rdist), rtol=3e-7, atol=1e-8
    )


def test_three_nn_dispatch_large_m(rng):
    """Public op at M > 2048 (pallas tiled) and M > 16384 (xla chunked)
    agrees with the small-M reference path."""
    b, n, m = 1, 40, 2500
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    d1, i1 = ops.three_nn(xyz1, xyz2, impl="pallas")
    d2, i2 = _reference(xyz1, xyz2, None)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=3e-7, atol=1e-8
    )


@pytest.mark.parametrize("n_valid", [0, 1, 2])
def test_degenerate_few_valid_sources_all_paths(rng, n_valid):
    """Scenes with fewer than 3 valid sources must still yield DISTINCT
    indices matching the masked top_k reference (lowest-index ties at the
    invalid-source distance) in every implementation path. Regression for
    the in-chunk elimination sentinel colliding with the invalid value."""
    b, n, m = 1, 40, 2500  # m > one 2048 chunk -> exercises tiled + scan
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    v = np.zeros((b, m), bool)
    picks = [1234, 2101][: max(n_valid, 0)][:n_valid]
    for p in picks:
        v[:, p] = True
    valid2 = jnp.asarray(v)

    want_d, want_i = _reference(xyz1, xyz2, valid2)
    td, ti = _three_nn_pallas_tiled(xyz1, xyz2, valid2, interpret=True)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(td), np.asarray(want_d), rtol=1e-6)
    cd, ci = _three_nn_xla_chunked(xyz1, xyz2, valid2, chunk=1024)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(cd), np.asarray(want_d), rtol=1e-6)

    # single-shot kernel path (m <= 2048)
    from gspn_tpu.ops.interpolate import _three_nn_pallas

    m2 = 600
    xyz2s = xyz2[:, :m2]
    v2 = np.zeros((b, m2), bool)
    for p in [123, 401][:n_valid]:
        v2[:, p] = True
    v2 = jnp.asarray(v2)
    want_d, want_i = _reference(xyz1, xyz2s, v2)
    sd, si = _three_nn_pallas(xyz1, xyz2s, v2, interpret=True)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(want_d), rtol=1e-6)

"""Parity tests for the perf-path Pallas kernels (three_nn tiled top-3,
mask projection 1-NN) vs their XLA forms vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu import ops
from tests import oracles


def cloud(rng, b, n):
    return (rng.standard_normal((b, n, 3))).astype(np.float32)


@pytest.mark.parametrize("masked", [False, True])
def test_three_nn_pallas_matches_oracle(rng, masked):
    b, n, m = 2, 100, 48
    xyz1 = cloud(rng, b, n)
    xyz2 = cloud(rng, b, m)
    v = None
    if masked:
        v = np.zeros((b, m), bool)
        v[:, :30] = True
    d_p, i_p = ops.three_nn(
        jnp.asarray(xyz1), jnp.asarray(xyz2),
        None if v is None else jnp.asarray(v), impl="pallas",
    )
    d_x, i_x = ops.three_nn(
        jnp.asarray(xyz1), jnp.asarray(xyz2),
        None if v is None else jnp.asarray(v), impl="xla",
    )
    wdist, widx = oracles.knn_oracle(3, xyz2, xyz1, v)
    np.testing.assert_array_equal(np.asarray(i_p), widx)
    np.testing.assert_array_equal(np.asarray(i_x), widx)
    np.testing.assert_allclose(np.asarray(d_p), wdist, rtol=1e-6, atol=1e-6)


def test_nearest_sample_logit_parity(rng):
    b, n, r, s = 2, 120, 5, 8
    xyz = jnp.asarray(cloud(rng, b, n))
    sampled = jnp.asarray(rng.standard_normal((b, r, s, 3)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((b, r, s)).astype(np.float32))
    out_p = ops.nearest_sample_logit(xyz, sampled, logits, impl="pallas")
    out_x = ops.nearest_sample_logit(xyz, sampled, logits, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-6)
    # manual check one entry
    xn, sn, ln = map(np.asarray, (xyz, sampled, logits))
    d2 = np.sum((xn[0, 7][None] - sn[0, 2]) ** 2, -1)
    assert np.isclose(float(out_p[0, 2, 7]), ln[0, 2, np.argmin(d2)])


def test_nearest_sample_logit_sample_mask(rng):
    b, n, r, s = 1, 50, 2, 6
    xyz = jnp.asarray(cloud(rng, b, n))
    sampled = jnp.asarray(rng.standard_normal((b, r, s, 3)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((b, r, s)).astype(np.float32))
    sv = jnp.asarray(np.tile([True, True, True, False, False, False], (b, r, 1)))
    out_p = ops.nearest_sample_logit(xyz, sampled, logits, sv, impl="pallas")
    out_x = ops.nearest_sample_logit(xyz, sampled, logits, sv, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-6)
    # invalid samples never win
    xn, sn, ln = map(np.asarray, (xyz, sampled, logits))
    for ni in range(n):
        d2 = np.sum((xn[0, ni][None] - sn[0, 0, :3]) ** 2, -1)
        assert np.isclose(float(out_p[0, 0, ni]), ln[0, 0, np.argmin(d2)])

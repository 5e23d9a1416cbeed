"""Golden tests: every op vs its NumPy oracle, XLA and Pallas(interpret)
paths, masked and unmasked, plus gradient checks where autodiff replaces
the reference's hand-written CUDA gradients (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu import ops
from tests import oracles


def cloud(rng, b, n, scale=1.0):
    return (rng.standard_normal((b, n, 3)) * scale).astype(np.float32)


def mask(rng, b, n, frac=0.75):
    m = np.zeros((b, n), bool)
    for bi in range(b):
        k = max(1, int(n * (frac + 0.2 * rng.random())))
        m[bi, :k] = True
    return m


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("masked", [False, True])
def test_fps(rng, impl, masked):
    b, n, npoint = 3, 200, 33
    xyz = cloud(rng, b, n)
    v = mask(rng, b, n) if masked else None
    got = np.asarray(ops.farthest_point_sample(npoint, jnp.asarray(xyz), None if v is None else jnp.asarray(v), impl=impl))
    want = oracles.fps_oracle(npoint, xyz, v)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("masked", [False, True])
def test_ball_query(rng, impl, masked):
    b, n, m, k, radius = 2, 160, 37, 8, 0.8
    xyz1 = cloud(rng, b, n)
    xyz2 = xyz1[:, :m] + rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05
    v = mask(rng, b, n) if masked else None
    idx, cnt = ops.query_ball_point(
        radius, k, jnp.asarray(xyz1), jnp.asarray(xyz2),
        None if v is None else jnp.asarray(v), impl=impl,
    )
    widx, wcnt = oracles.ball_query_oracle(radius, k, xyz1, xyz2, v)
    np.testing.assert_array_equal(np.asarray(cnt), wcnt)
    np.testing.assert_array_equal(np.asarray(idx), widx)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("masked", [False, True])
def test_ball_query_multi(rng, impl, masked):
    b, n, m = 2, 160, 24
    radii, ks = (0.4, 0.8, 1.2), (4, 8, 16)
    xyz1 = cloud(rng, b, n)
    xyz2 = xyz1[:, :m]
    v = mask(rng, b, n) if masked else None
    results = ops.query_ball_point_multi(
        radii, ks, jnp.asarray(xyz1), jnp.asarray(xyz2),
        None if v is None else jnp.asarray(v), impl=impl,
    )
    for (idx, cnt), r, k in zip(results, radii, ks, strict=True):
        widx, wcnt = oracles.ball_query_oracle(r, k, xyz1, xyz2, v)
        np.testing.assert_array_equal(np.asarray(cnt), wcnt)
        np.testing.assert_array_equal(np.asarray(idx), widx)


def test_ball_query_empty_row(rng):
    # a query center far from everything -> zeros + count 0
    xyz1 = cloud(rng, 1, 50)
    xyz2 = np.full((1, 4, 3), 100.0, np.float32)
    for impl in ("xla", "pallas"):
        idx, cnt = ops.query_ball_point(0.5, 6, jnp.asarray(xyz1), jnp.asarray(xyz2), impl=impl)
        assert np.all(np.asarray(cnt) == 0)
        assert np.all(np.asarray(idx) == 0)


@pytest.mark.parametrize("masked", [False, True])
def test_knn(rng, masked):
    b, n, m, k = 2, 90, 17, 5
    xyz1 = cloud(rng, b, n)
    xyz2 = cloud(rng, b, m)
    v = mask(rng, b, n) if masked else None
    dist, idx = ops.knn_point(k, jnp.asarray(xyz1), jnp.asarray(xyz2), None if v is None else jnp.asarray(v))
    wdist, widx = oracles.knn_oracle(k, xyz1, xyz2, v)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-6, atol=1e-6)


def test_gather_group(rng):
    b, n, c, m, k = 2, 50, 7, 11, 4
    pts = rng.standard_normal((b, n, c)).astype(np.float32)
    idx1 = rng.integers(0, n, (b, m)).astype(np.int32)
    idx2 = rng.integers(0, n, (b, m, k)).astype(np.int32)
    g1 = np.asarray(ops.gather_point(jnp.asarray(pts), jnp.asarray(idx1)))
    g2 = np.asarray(ops.group_point(jnp.asarray(pts), jnp.asarray(idx2)))
    for bi in range(b):
        np.testing.assert_array_equal(g1[bi], pts[bi][idx1[bi]])
        np.testing.assert_array_equal(g2[bi], pts[bi][idx2[bi]])


def test_group_point_grad_is_scatter_add(rng):
    b, n, c, m, k = 1, 12, 3, 5, 4
    pts = rng.standard_normal((b, n, c)).astype(np.float32)
    idx = rng.integers(0, n, (b, m, k)).astype(np.int32)
    g = rng.standard_normal((b, m, k, c)).astype(np.float32)
    _, vjp = jax.vjp(lambda p: ops.group_point(p, jnp.asarray(idx)), jnp.asarray(pts))
    (dpts,) = vjp(jnp.asarray(g))
    want = np.zeros_like(pts)
    for mi in range(m):
        for ki in range(k):
            want[0, idx[0, mi, ki]] += g[0, mi, ki]
    np.testing.assert_allclose(np.asarray(dpts), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_three_nn(rng, masked):
    b, n, m = 2, 64, 24
    xyz1 = cloud(rng, b, n)  # targets
    xyz2 = cloud(rng, b, m)  # sources
    v = mask(rng, b, m) if masked else None
    dist, idx = ops.three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2), None if v is None else jnp.asarray(v))
    wdist, widx = oracles.knn_oracle(3, xyz2, xyz1, v)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-6, atol=1e-6)


def test_three_interpolate(rng):
    b, m, n, c = 2, 20, 30, 6
    pts = rng.standard_normal((b, m, c)).astype(np.float32)
    xyz1 = cloud(rng, b, n)
    xyz2 = cloud(rng, b, m)
    dist, idx = ops.three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2))
    w = ops.three_interpolate_weights(dist)
    out = np.asarray(ops.three_interpolate(jnp.asarray(pts), idx, w))
    wn = np.asarray(w)
    idxn = np.asarray(idx)
    want = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        for ni in range(n):
            for j in range(3):
                want[bi, ni] += wn[bi, ni, j] * pts[bi, idxn[bi, ni, j]]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, rtol=1e-5)


def test_three_interpolate_grad(rng):
    b, m, n, c = 1, 10, 8, 4
    pts = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
    xyz1 = jnp.asarray(cloud(rng, b, n))
    xyz2 = jnp.asarray(cloud(rng, b, m))
    dist, idx = ops.three_nn(xyz1, xyz2)
    w = ops.three_interpolate_weights(dist)

    def f(p):
        return jnp.sum(ops.three_interpolate(p, idx, w) ** 2)

    from jax.test_util import check_grads

    check_grads(f, (pts,), order=1, modes=["rev"], rtol=1e-3)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_nn_distance(rng, impl):
    b, n, m = 2, 120, 75
    xyz1 = cloud(rng, b, n)
    xyz2 = cloud(rng, b, m)
    d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(xyz1), jnp.asarray(xyz2), impl=impl)
    wd1, wi1, wd2, wi2 = oracles.nn_distance_oracle(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(i1), wi1)
    np.testing.assert_array_equal(np.asarray(i2), wi2)
    np.testing.assert_allclose(np.asarray(d1), wd1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-5, atol=1e-6)


def test_nn_distance_grad(rng):
    # chamfer is non-smooth where the argmin assignment switches, so finite
    # differences are invalid; check the exact analytic gradients instead
    # (these are what the reference's hand-written CUDA grad kernels compute)
    b, n, m = 1, 16, 12
    xyz1 = jnp.asarray(cloud(rng, b, n))
    xyz2 = jnp.asarray(cloud(rng, b, m))

    def f(a, c):
        d1, _, d2, _ = ops.nn_distance(a, c, impl="xla")
        return jnp.sum(d1) + jnp.sum(d2)

    ga, gc = jax.grad(f, argnums=(0, 1))(xyz1, xyz2)
    _, i1, _, i2 = ops.nn_distance(xyz1, xyz2, impl="xla")
    i1n, i2n = np.asarray(i1[0]), np.asarray(i2[0])
    a, c = np.asarray(xyz1[0]), np.asarray(xyz2[0])
    want_a = 2 * (a - c[i1n])  # from dist1
    want_c = -np.zeros_like(c)
    for j in range(m):  # from dist2: 2*(c[j] - a[i2[j]])
        want_c[j] = 2 * (c[j] - a[i2n[j]])
    for j in range(m):  # scatter into a from dist2
        want_a[i2n[j]] += 2 * (a[i2n[j]] - c[j])
    want_c2 = want_c.copy()
    for i in range(n):  # scatter into c from dist1
        want_c2[i1n[i]] += 2 * (c[i1n[i]] - a[i])
    np.testing.assert_allclose(np.asarray(ga[0]), want_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc[0]), want_c2, rtol=1e-5, atol=1e-6)


def test_prob_sample(rng):
    b, n, m = 3, 40, 25
    w = rng.random((b, n)).astype(np.float32)
    r = rng.random((b, m)).astype(np.float32)
    got = np.asarray(ops.prob_sample(jnp.asarray(w), jnp.asarray(r)))
    want = oracles.prob_sample_oracle(w, r)
    np.testing.assert_array_equal(got, want)


def test_prob_sample_distribution():
    key = jax.random.PRNGKey(0)
    w = jnp.asarray([[0.1, 0.0, 0.9]], jnp.float32)
    idx = np.asarray(ops.random_prob_sample(key, w, 4000))
    assert not np.any(idx == 1)
    frac2 = np.mean(idx == 2)
    assert 0.85 < frac2 < 0.95


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_nms(rng, impl):
    r = 40
    centers = rng.random((r, 3)).astype(np.float32) * 2
    ext = 0.3 + rng.random((r, 3)).astype(np.float32) * 0.5
    boxes = np.concatenate([centers - ext / 2, centers + ext / 2], -1)
    scores = rng.random(r).astype(np.float32)
    valid = rng.random(r) > 0.2
    for v in (None, valid):
        got = np.asarray(ops.nms_3d(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                                    None if v is None else jnp.asarray(v),
                                    impl=impl))
        want = oracles.nms_oracle(boxes, scores, 0.3, v)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_nms_tied_scores_stable(rng, impl):
    """The rank-matmul sort inside nms_3d_batched must be STABLE: tied
    scores keep input order (like the argsort it replaced), so the
    greedy result matches the sequential oracle exactly."""
    r = 30
    centers = rng.random((r, 3)).astype(np.float32) * 2
    ext = 0.3 + rng.random((r, 3)).astype(np.float32) * 0.5
    boxes = np.concatenate([centers - ext / 2, centers + ext / 2], -1)
    scores = rng.choice([0.2, 0.5, 0.5, 0.5, 0.9], size=r).astype(np.float32)
    valid = rng.random(r) > 0.2
    for v in (None, valid):
        got = np.asarray(
            ops.nms_3d(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                       None if v is None else jnp.asarray(v), impl=impl)
        )
        want = oracles.nms_oracle(boxes, scores, 0.3, v)
        np.testing.assert_array_equal(got, want)


def test_fps_permutation_covariance(rng):
    # FPS selects the same point SET under permutation when distances are
    # distinct (indices map through the permutation, except the seed)
    xyz = cloud(rng, 1, 64)
    idx = np.asarray(ops.farthest_point_sample(16, jnp.asarray(xyz), impl="xla"))[0]
    pts = xyz[0][idx]
    # translate the whole cloud: selection must be identical (translation inv)
    idx2 = np.asarray(
        ops.farthest_point_sample(16, jnp.asarray(xyz + 5.0), impl="xla")
    )[0]
    np.testing.assert_array_equal(idx, idx2)
    assert len(np.unique(idx)) == 16
    assert pts.shape == (16, 3)


def test_ops_jit_and_vmap(rng):
    # everything composes under jit
    xyz = jnp.asarray(cloud(rng, 2, 128))

    @jax.jit
    def pipeline(p):
        si = ops.farthest_point_sample(32, p, impl="xla")
        centers = ops.gather_point(p, si)
        gi, cnt = ops.query_ball_point(0.5, 8, p, centers, impl="xla")
        grouped = ops.group_point(p, gi)
        return grouped, cnt

    g, c = pipeline(xyz)
    assert g.shape == (2, 32, 8, 3)
    assert c.shape == (2, 32)


def test_three_interpolate_mm_matches_exact(rng):
    """MXU sparse-matmul interpolation == exact gather path (up to fp32
    summation order), values and both gradients."""
    b, m, n, c = 2, 150, 200, 40
    pts = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
    xyz1 = jnp.asarray(cloud(rng, b, n))
    xyz2 = jnp.asarray(cloud(rng, b, m))
    dist, idx = ops.three_nn(xyz1, xyz2)
    w = ops.three_interpolate_weights(dist)
    a = np.asarray(ops.three_interpolate(pts, idx, w))
    bb = np.asarray(ops.three_interpolate_mm(pts, idx, w))
    np.testing.assert_allclose(a, bb, rtol=2e-6, atol=2e-6)

    def fa(p, w):
        return jnp.sum(jnp.sin(ops.three_interpolate(p, idx, w)))

    def fb(p, w):
        return jnp.sum(jnp.sin(ops.three_interpolate_mm(p, idx, w)))

    ga = jax.grad(fa, argnums=(0, 1))(pts, w)
    gb = jax.grad(fb, argnums=(0, 1))(pts, w)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6
        )


def test_three_interpolate_mm_chunked_sources(rng):
    """Source count above the kernel's matmul chunk exercises the
    accumulation loop."""
    from gspn_tpu.ops import interpolate as interp_mod

    b, m, n, c = 1, interp_mod._IMC + 300, 64, 8
    pts = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
    xyz1 = jnp.asarray(cloud(rng, b, n))
    xyz2 = jnp.asarray(cloud(rng, b, m))
    dist, idx = ops.three_nn(xyz1, xyz2)
    w = ops.three_interpolate_weights(dist)
    a = np.asarray(ops.three_interpolate(pts, idx, w))
    bb = np.asarray(ops.three_interpolate_mm(pts, idx, w))
    np.testing.assert_allclose(a, bb, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("masked", [False, True])
def test_fps_prefix_consistency(rng, impl, masked):
    """Greedy FPS is prefix-consistent: fps(k) == fps(n)[:, :k]. The fused
    pipeline relies on this to serve proposal seeds and the backbone's
    first SA layer from ONE sampling pass."""
    b, n = 2, 300
    xyz = jnp.asarray(cloud(rng, b, n))
    valid = (
        jnp.asarray(rng.random((b, n)) > 0.2) if masked else None
    )
    big = np.asarray(ops.farthest_point_sample(64, xyz, valid, impl=impl))
    for k in (1, 7, 32, 64):
        small = np.asarray(
            ops.farthest_point_sample(k, xyz, valid, impl=impl)
        )
        np.testing.assert_array_equal(small, big[:, :k])

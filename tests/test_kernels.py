"""Kernel catalog: value checks against independent numpy formulas and
autodiff sanity (finite gradients everywhere, including the distance-matrix
diagonal)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from fvgp_tpu import kernels as K


def _np_dist(x1, x2):
    return np.sqrt(((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1))


def test_distance_matrix_matches_numpy(rng):
    x1 = rng.uniform(0, 5, (7, 3))
    x2 = rng.uniform(0, 5, (9, 3))
    d = np.asarray(K.get_distance_matrix(x1, x2))
    np.testing.assert_allclose(d, _np_dist(x1, x2), atol=1e-10)


def test_anisotropic_distance(rng):
    x1 = rng.uniform(0, 5, (6, 2))
    hps = np.array([2.0, 0.5])
    d = np.asarray(K.get_anisotropic_distance_matrix(x1, x1, hps))
    np.testing.assert_allclose(d, _np_dist(x1 / hps, x1 / hps), atol=1e-10)
    assert np.allclose(np.diag(d), 0.0)


def test_stationary_kernel_values():
    d = jnp.asarray([[0.0, 1.0], [2.0, 0.5]])
    np.testing.assert_allclose(np.asarray(K.squared_exponential_kernel(d, 2.0)),
                               np.exp(-np.asarray(d) ** 2 / 8.0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(K.exponential_kernel(d, 2.0)),
                               np.exp(-np.asarray(d) / 2.0), atol=1e-12)
    m32 = np.asarray(K.matern_kernel_diff1(d, 1.5))
    a = np.sqrt(3) * np.asarray(d) / 1.5
    np.testing.assert_allclose(m32, (1 + a) * np.exp(-a), atol=1e-12)
    m52 = np.asarray(K.matern_kernel_diff2(d, 1.5))
    b = np.sqrt(5) * np.asarray(d) / 1.5
    np.testing.assert_allclose(
        m52, (1 + b + 5 * np.asarray(d) ** 2 / (3 * 1.5 ** 2)) * np.exp(-b),
        atol=1e-12)


def test_robust_variants():
    d = jnp.asarray([[0.3, 1.2]])
    phi = 0.7
    np.testing.assert_allclose(
        np.asarray(K.squared_exponential_kernel_robust(d, phi)),
        np.exp(-np.asarray(d) ** 2 * phi ** 2), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(K.exponential_kernel_robust(d, phi)),
        np.exp(-np.asarray(d) * phi ** 2), atol=1e-12)
    a = np.sqrt(3) * np.asarray(d) * phi ** 2
    np.testing.assert_allclose(
        np.asarray(K.matern_kernel_diff1_robust(d, phi)),
        (1 + a) * np.exp(-a), atol=1e-12)


def test_periodic_and_sparse_kernels():
    d = jnp.asarray([[0.5, 1.0]])
    np.testing.assert_allclose(
        np.asarray(K.periodic_kernel(d, 1.3, 2.0)),
        np.exp(-(2 / 1.3 ** 2) * np.sin(np.pi * np.asarray(d) / 2.0) ** 2),
        atol=1e-12)
    s = np.asarray(K.sparse_kernel(jnp.asarray([[0.2, 0.9, 5.0]]), 1.0))
    assert np.all(np.isfinite(s))
    assert s[0, 2] <= s[0, 1] + 1e-9  # compact support clips at the radius


def test_wendland_compact_support(rng):
    x1 = rng.uniform(0, 10, (20, 2))
    hps = np.array([1.5, 1.0, 1.0])
    Kw = np.asarray(K.wendland_anisotropic(x1, x1, hps))
    d = _np_dist(x1 / hps[1:], x1 / hps[1:])
    assert np.all(Kw[d >= 1.0] == 0.0)
    np.testing.assert_allclose(np.diag(Kw), hps[0], atol=1e-12)
    # PSD check
    eig = np.linalg.eigvalsh(Kw)
    assert eig.min() > -1e-10


def test_default_matern_ard_matches_reference_formula(rng):
    x1 = rng.uniform(0, 5, (8, 3))
    x2 = rng.uniform(0, 5, (5, 3))
    hps = np.array([1.7, 0.8, 1.2, 2.0])
    ours = np.asarray(K.default_matern_ard(x1, x2, hps))
    # reference formula (gp_prior.py:363-386): hps[0]*matern32(aniso dist, 1)
    dm = np.zeros((8, 5))
    for i in range(3):
        dm += np.abs(np.subtract.outer(x1[:, i], x2[:, i]) / hps[1 + i]) ** 2
    dm = np.sqrt(dm)
    expected = hps[0] * (1 + np.sqrt(3) * dm) * np.exp(-np.sqrt(3) * dm)
    np.testing.assert_allclose(ours, expected, atol=1e-10)


@pytest.mark.slow
def test_kernel_gradients_finite_on_diagonal(rng):
    """d/dhps of every parametric kernel must be finite at distance 0."""
    x = jnp.asarray(rng.uniform(0, 5, (6, 2)))
    hps = jnp.asarray([1.0, 1.0, 1.0])
    for fn in (K.default_matern_ard, K.wendland_anisotropic):
        g = jax.jacfwd(lambda h: fn(x, x, h))(hps)
        assert bool(jnp.all(jnp.isfinite(g))), fn.__name__


def test_nonstat_kernel_and_gradient(rng):
    x1 = rng.uniform(0, 3, (5, 2))
    x0 = rng.uniform(0, 3, (4, 2))
    w = rng.uniform(0.5, 1.5, 4)
    out = np.asarray(K.non_stat_kernel(x1, x1, x0, w, 1.2))
    # rank-1 by construction
    assert np.linalg.matrix_rank(out, tol=1e-10) == 1
    g = np.asarray(K.non_stat_kernel_gradient(x1, x1, x0, w, 1.2))
    assert g.shape == (5, 5, 5)[0:1] + (5, 5) or g.shape == (len(w) + 1, 5, 5)
    # FD check of the w-gradient
    eps = 1e-6
    w2 = w.copy()
    w2[1] += eps
    fd = (np.asarray(K.non_stat_kernel(x1, x1, x0, w2, 1.2)) - out) / eps
    np.testing.assert_allclose(g[1], fd, atol=1e-5)


def test_wasserstein():
    # reference semantics (ref kernels.py:843): rows are UNNORMALIZED
    # measures, normalized by their sums before sorting
    a = np.array([0.0, 1.0, 2.0])
    b = np.array([1.0, 2.0, 3.0])
    an, bn = np.sort(a / a.sum()), np.sort(b / b.sum())
    expected = np.mean(np.abs(an - bn))
    assert abs(float(K.wasserstein_1d(a, b)) - expected) < 1e-12
    W = np.asarray(K.wasserstein_1d_outer_vec(np.stack([a, b]), np.stack([a, b])))
    assert W.shape == (2, 2)
    assert abs(W[0, 1] - expected) < 1e-7 and abs(W[0, 0]) < 1e-12


def test_bump_and_sle(rng):
    d = jnp.asarray([0.0, 0.5, 0.99, 1.0, 2.0])
    vals = np.asarray(K.bump(d, 1.0))
    assert vals[0] == 1.0  # ampl*exp(beta)*exp(-beta) at 0
    assert vals[3] == 0.0 and vals[4] == 0.0
    x = rng.uniform(0, 2, (6, 2))
    lm = rng.uniform(0, 2, (4, 2))
    # reference 4-hp signature [ampl, radius, beta, length_scale] with the
    # embedding basis at args['x_data'] (ref kernels.py:921-956)
    hps = np.array([1.0, 1.5, 1.0, 0.7])
    S = np.asarray(K.sle_kernel(x, x, hps, {"x_data": lm}))
    eig = np.linalg.eigvalsh(S)
    assert eig.min() > -1e-6
    # numpy oracle of the reference formula
    def np_bump(dd, r, beta):
        a = 1.0 - dd ** 2 / r ** 2
        out = np.zeros_like(dd)
        i = a > 0
        out[i] = np.exp(-beta / a[i] + beta)
        return out
    dmat = np.linalg.norm(x[:, None, :] - lm[None, :, :], axis=-1)
    phi = np_bump(dmat, hps[1], hps[2])
    D = np.linalg.norm(phi[:, None, :] - phi[None, :, :], axis=-1)
    np.testing.assert_allclose(S, hps[0] * np.exp(-D ** 2 / hps[3]), atol=1e-6)
    # landmarks key still accepted for an explicit landmark set
    S2 = np.asarray(K.sle_kernel(x, x, hps, {"landmarks": lm}))
    np.testing.assert_allclose(S, S2, atol=1e-12)


def test_dot_product_family():
    x1 = np.array([1.0, 2.0])
    x2 = np.array([0.5, -1.0])
    assert abs(float(K.polynomial_kernel(x1, x2, 2.0)) - (1 + x1 @ x2) ** 2) < 1e-12
    M = np.eye(2)
    assert abs(float(K.dot_product_kernel(x1, x2, 0.3, M)) - (0.3 + x1 @ x2)) < 1e-12
    assert abs(float(K.linear_kernel(2., 3., 1., 2., 0.5)) - (1 + 2 * 1.5 * 2.5)) < 1e-12


def test_sparse_wendland_kernel_names_and_values():
    """The reference's ``_sparse`` kernels return scipy COO blocks with only
    in-support entries (ref kernels.py:658-738); the parity aliases must
    produce identical values to the dense Wendland."""
    from scipy.sparse import issparse
    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 4, (30, 2))
    x2 = rng.uniform(0, 4, (20, 2))
    hps = np.array([1.2, 1.0, 1.5])
    s = K.wendland_anisotropic_gp2Scale_cpu_sparse(x1, x2, hps)
    assert issparse(s)
    dense = np.asarray(K.wendland_anisotropic(x1, x2, hps))
    np.testing.assert_allclose(s.toarray(), dense, atol=1e-12)
    assert s.nnz == np.count_nonzero(dense)
    assert K.wendland_anisotropic_gp2Scale_gpu_sparse is \
        K.wendland_anisotropic_gp2Scale_cpu_sparse


@pytest.mark.slow
def test_gp_accepts_a_sparse_returning_kernel():
    """A reference user may pass the ``_sparse`` kernel as kernel_function;
    the GP must densify its blocks and match the dense-kernel GP exactly —
    on the dense path and under gp2Scale (host tile loop)."""
    from fvgp_tpu import GP
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 5, (70, 2))
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 1.0, 1.0])
    xp = rng.uniform(0, 5, (9, 2))
    gp_d = GP(x, y, init_hyperparameters=hps,
              kernel_function=K.wendland_anisotropic)
    gp_s = GP(x, y, init_hyperparameters=hps,
              kernel_function=K.wendland_anisotropic_gp2Scale_cpu_sparse)
    np.testing.assert_allclose(gp_s.log_likelihood(), gp_d.log_likelihood(),
                               rtol=1e-8)
    np.testing.assert_allclose(gp_s.posterior_mean(xp)["m(x)"],
                               gp_d.posterior_mean(xp)["m(x)"], atol=1e-8)
    gp_s2 = GP(x, y, init_hyperparameters=hps, gp2Scale=True,
               gp2Scale_batch_size=32,
               kernel_function=K.wendland_anisotropic_gp2Scale_cpu_sparse)
    np.testing.assert_allclose(gp_s2.log_likelihood(), gp_d.log_likelihood(),
                               rtol=1e-6)

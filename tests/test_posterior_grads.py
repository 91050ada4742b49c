"""Finite-difference oracle tests for the posterior/prior gradient API
(parity target: /root/reference/fvgp/gp_posterior.py:184-226, :290-331,
:356-383, :418-423).

Each test compares the analytic (or semi-analytic) gradient returned by the
API against a central finite difference of the corresponding *value*
function, evaluated through the same public GP facade.
"""

import numpy as np
import pytest

from fvgp_tpu import GP


H = 1e-5


@pytest.fixture(scope="module")
def gp():
    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (25, 2))
    y = np.sin(3.0 * x[:, 0]) + np.cos(2.0 * x[:, 1])
    return GP(x, y,
              init_hyperparameters=np.array([1.0, 0.4, 0.6]),
              noise_variances=np.full(len(x), 1e-3))


@pytest.fixture(scope="module")
def x_pred(gp):
    # keep prediction points away from the data (Matérn kernels lose
    # differentiability at zero distance)
    rng = np.random.default_rng(11)
    return rng.uniform(1.2, 1.8, (5, 2))


def _central(fn, x_pred, d, h=H):
    x1 = np.array(x_pred)
    x2 = np.array(x_pred)
    x1[:, d] += h
    x2[:, d] -= h
    return (fn(x1) - fn(x2)) / (2.0 * h)


@pytest.mark.slow
def test_posterior_mean_grad_direction(gp, x_pred):
    for d in range(2):
        got = gp.posterior_mean_grad(x_pred, direction=d)["dm/dx"]
        want = _central(lambda xp: gp.posterior_mean(xp)["m(x)"], x_pred, d)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_posterior_mean_grad_all_directions(gp, x_pred):
    got = gp.posterior_mean_grad(x_pred)["dm/dx"]
    assert got.shape == (len(x_pred), 2)
    for d in range(2):
        want = _central(lambda xp: gp.posterior_mean(xp)["m(x)"], x_pred, d)
        np.testing.assert_allclose(got[:, d], want, rtol=1e-4, atol=1e-6)


def test_posterior_mean_grad_explicit_hyperparameters(gp, x_pred):
    hps = np.array([1.3, 0.5, 0.7])
    got = gp.posterior_mean_grad(x_pred, hyperparameters=hps, direction=0)["dm/dx"]
    want = _central(
        lambda xp: gp.posterior_mean(xp, hyperparameters=hps)["m(x)"], x_pred, 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_posterior_covariance_grad_variance(gp, x_pred):
    for d in range(2):
        res = gp.posterior_covariance_grad(x_pred, direction=d)
        want = _central(
            lambda xp: gp.posterior_covariance(xp)["v(x)"], x_pred, d)
        np.testing.assert_allclose(res["dv/dx"], want, rtol=5e-4, atol=1e-6)
        # the dv/dx of the ALL-directions call must agree with per-direction
        all_res = gp.posterior_covariance_grad(x_pred)
        np.testing.assert_allclose(all_res["dv/dx"][:, d], res["dv/dx"],
                                   rtol=1e-8, atol=1e-12)


def test_joint_gp_prior_grad_blocks(gp, x_pred):
    d = 1
    res = gp.joint_gp_prior_grad(x_pred, d)
    # cross-covariance block dk/dx against FD of joint_gp_prior's "k"
    want_k = _central(lambda xp: gp.joint_gp_prior(xp)["k"], x_pred, d)
    np.testing.assert_allclose(res["dk/dx"], want_k, rtol=1e-4, atol=1e-6)
    # prediction-prediction block d kappa/dx
    want_kk = _central(lambda xp: gp.joint_gp_prior(xp)["kappa"], x_pred, d)
    np.testing.assert_allclose(res["d kappa/dx"], want_kk, rtol=1e-4, atol=1e-6)
    # the assembled dS/dx must carry those blocks in place
    n = len(gp.x_data)
    np.testing.assert_allclose(res["dS/dx"][:n, n:], res["dk/dx"])
    np.testing.assert_allclose(res["dS/dx"][n:, n:], res["d kappa/dx"],
                               atol=1e-12)


def test_gp_entropy_grad(gp, x_pred):
    for d in range(2):
        got = gp.gp_entropy_grad(x_pred, d)
        want = _central(lambda xp: np.asarray(gp.gp_entropy(xp)), x_pred, d)
        np.testing.assert_allclose(got, float(want), rtol=5e-4, atol=1e-7)

"""Posterior edge branches: multi-task gradient reshapes, negative-variance
clipping, dense-K warning under the scale path, input rejection, and the
non-PD failure diagnostics (ref gp_posterior.py:184-331, :568-606;
ref gp_lin_alg.py:27-58)."""

import warnings

import numpy as np
import pytest

from fvgp_tpu import GP, fvGP

warnings.simplefilter("ignore")


@pytest.fixture(scope="module")
def mt_gp():
    rng = np.random.default_rng(9)
    x = rng.uniform(0, 6, (20, 2))
    y = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 1])])
    return fvGP(x, y, init_hyperparameters=np.ones(4))


def test_multitask_posterior_grads_reshape(mt_gp):
    xp = np.random.default_rng(1).uniform(0, 6, (3, 2))
    out = mt_gp.posterior_mean_grad(xp, direction=0)
    assert out["dm/dx"].shape == (3, 2)           # (V, No)
    out_all = mt_gp.posterior_mean_grad(xp)
    assert out_all["direction"] == "ALL"
    assert out_all["dm/dx"].shape == (3, 2, 2)    # (V, D, No)
    gv = mt_gp.posterior_covariance_grad(xp, direction=1)
    assert gv["dv/dx"].shape == (3, 2)
    assert gv["dS/dx"].shape == (3, 3, 2, 2)
    gva = mt_gp.posterior_covariance_grad(xp)
    assert gva["dv/dx"].shape == (3, 2, 2)


def test_singletask_grad_all_directions():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 6, (25, 2))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.ones(3))
    xp = rng.uniform(0, 6, (4, 2))
    out = gp.posterior_mean_grad(xp)
    assert out["dm/dx"].shape == (4, 2)
    # all-directions result agrees with per-direction calls
    for d in range(2):
        one = gp.posterior_mean_grad(xp, direction=d)["dm/dx"]
        np.testing.assert_allclose(out["dm/dx"][:, d], one, atol=1e-10)
    gva = gp.posterior_covariance_grad(xp)
    for d in range(2):
        one = gp.posterior_covariance_grad(xp, direction=d)["dv/dx"]
        np.testing.assert_allclose(gva["dv/dx"][:, d], one, atol=1e-10)


def test_negative_variance_clipped_with_warning(monkeypatch):
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 6, (20, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.ones(2))
    orig = gp.prior.compute_covariances

    def skewed(x1, x2, hps):
        out = np.asarray(orig(x1, x2, hps))
        if len(x1) == len(x2) and out.shape[0] == out.shape[1] \
                and len(x1) == 5:
            out = out - 0.01 * np.eye(len(x1))    # force v < 0 at x_pred
        return out

    monkeypatch.setattr(gp.prior, "compute_covariances", skewed)
    xp = rng.uniform(0, 6, (5, 1))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = gp.posterior_covariance(xp)
    assert any("Negative variances" in str(w.message) for w in rec)
    assert np.all(out["v(x)"] >= 0.0)             # clipped
    assert np.all(np.diag(out["S"]) >= 0.0)       # S diagonal synced


def test_non_pd_failure_diagnostics():
    from fvgp_tpu.ops.dense import NonPositiveDefiniteError
    rng = np.random.default_rng(4)
    x = np.repeat(rng.uniform(0, 1, (6, 1)), 3, axis=0)
    with pytest.raises(NonPositiveDefiniteError) as err:
        GP(x, np.sin(x[:, 0]) * 100,
           init_hyperparameters=np.array([1e4, 1.0]),
           noise_variances=np.full(len(x), 1e-4),
           args={"dtype": "float32"})
    msg = str(err.value)
    assert "duplicate" in msg and "noise" in msg   # remedies listed


def test_joint_prior_dense_warning_under_scale():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 40, (300, 2))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1., 2., 2.]),
            gp2Scale=True, args={"gp2Scale_block_size": 32})
    gp.log_likelihood()                            # commit block-sparse K
    xp = rng.uniform(0, 40, (3, 2))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = gp.joint_gp_prior(xp)
    assert any("dense in the number of data points" in str(w.message)
               for w in rec)
    n = len(x) + 3
    assert out["S"].shape == (n, n)


def test_posterior_input_rejection():
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 6, (15, 2))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.ones(3))
    with pytest.raises(AssertionError):
        gp.posterior_mean((1.0, 2.0))
    with pytest.raises(AssertionError):
        gp.posterior_mean(np.ones(3))              # 1-d
    with pytest.raises(AssertionError):
        gp.posterior_mean(np.ones((2, 2)), x_out=np.ones((2, 2)))
    with pytest.raises(AssertionError):
        gp.posterior_covariance(np.ones((2, 2)), x_out=(1, 2))


def test_cartesian_product_variants(mt_gp):
    cp = mt_gp.posterior.cartesian_product
    xl = [object(), object()]
    out = cp(xl, np.array([0.0, 1.0]))
    assert isinstance(out, list) and len(out) == 4
    assert out[0][0] is xl[0] and out[0][1] == 0.0
    arr = cp(np.zeros((2, 3)), np.array([5.0]))
    assert arr.shape == (2, 4) and np.all(arr[:, 3] == 5.0)
    with pytest.raises(AssertionError):
        cp(np.zeros((2, 3)), np.zeros((2, 2)))
    with pytest.raises(Exception):
        cp(42, np.array([0.0]))

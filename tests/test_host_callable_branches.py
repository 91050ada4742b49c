"""Host-callable (non-traceable) kernels/means and user gradient hooks.

The reference supports arbitrary numpy callables for kernel / prior mean /
noise with user-supplied or finite-difference gradients (ref
gp_prior.py:56-92, :388-461, gp_marginal_likelihood.py:224-309).  These
tests pin the branch matrix this build dispatches on:
{traceable, host} × {2-arg, 3-arg(args)} × {user grad, autodiff, FD}.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from fvgp_tpu import GP

warnings.simplefilter("ignore")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 8, (30, 1))
    y = np.sin(x[:, 0]) + 0.02 * rng.standard_normal(30)
    return x, y


HPS = np.array([1.2, 1.4])


def _np_sqexp(x1, x2, h):
    x1 = np.asarray(x1, np.float64)
    x2 = np.asarray(x2, np.float64)
    d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2 / h[1] ** 2).sum(-1)
    return h[0] * np.exp(-0.5 * d2)


def _jnp_sqexp(x1, x2, h):
    d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2 / h[1] ** 2).sum(-1)
    return h[0] * jnp.exp(-0.5 * d2)


def test_host_kernel_and_mean_posterior_grads(data):
    """Numpy kernel + numpy mean: posterior mean/covariance gradients come
    from the FD fallbacks and must match central differences of the
    posterior themselves."""
    x, y = data

    def np_mean(xx, h):
        return 0.3 * np.asarray(xx)[:, 0] ** 2

    gp = GP(x, y, init_hyperparameters=HPS, kernel_function=_np_sqexp,
            prior_mean_function=np_mean)
    assert not gp.prior.kernel_traceable
    assert not gp.prior.mean_traceable
    xp = np.array([[2.0], [5.5]])
    g = gp.posterior_mean_grad(xp, direction=0)["dm/dx"]
    eps = 1e-5
    m_hi = gp.posterior_mean(xp + eps)["m(x)"]
    m_lo = gp.posterior_mean(xp - eps)["m(x)"]
    np.testing.assert_allclose(g, (m_hi - m_lo) / (2 * eps),
                               rtol=1e-3, atol=1e-5)
    gv = gp.posterior_covariance_grad(xp, direction=0)["dv/dx"]
    v_hi = gp.posterior_covariance(xp + eps)["v(x)"]
    v_lo = gp.posterior_covariance(xp - eps)["v(x)"]
    np.testing.assert_allclose(gv, (v_hi - v_lo) / (2 * eps),
                               rtol=1e-3, atol=1e-5)


def test_three_arg_callables_with_args(data):
    """3-arg kernel/mean signatures receive the args dict (traceable and
    host variants) and match their 2-arg equivalents."""
    x, y = data

    def jnp_mean2(xx, h):
        return 0.1 * xx[:, 0]

    def jnp_mean3(xx, h, args):
        assert args.get("flag") == 7
        return 0.1 * xx[:, 0]

    def jnp_kern3(x1, x2, h, args):
        assert args.get("flag") == 7
        return _jnp_sqexp(x1, x2, h)

    gp2 = GP(x, y, init_hyperparameters=HPS, kernel_function=_jnp_sqexp,
             prior_mean_function=jnp_mean2)
    gp3 = GP(x, y, init_hyperparameters=HPS, kernel_function=jnp_kern3,
             prior_mean_function=jnp_mean3, args={"flag": 7})
    assert gp3.prior.kernel_traceable
    assert abs(gp2.log_likelihood() - gp3.log_likelihood()) < 1e-8

    def np_mean3(xx, h, args):
        assert args.get("flag") == 7
        return 0.1 * np.asarray(xx)[:, 0]

    def np_kern3(x1, x2, h, args):
        assert args.get("flag") == 7
        return _np_sqexp(x1, x2, h)

    gph = GP(x, y, init_hyperparameters=HPS, kernel_function=np_kern3,
             prior_mean_function=np_mean3, args={"flag": 7})
    assert not gph.prior.kernel_traceable
    assert abs(gph.log_likelihood() - gp2.log_likelihood()) < 1e-8
    # host-mean hp-gradient rides the FD fallback; self-test must agree
    fd, an = gph.test_log_likelihood_gradient(HPS, epsilon=1e-6)
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)


def test_user_kernel_grad_ram_economy_true(data):
    """User per-direction dk/dh (ram_economy=True, 4-arg) drives the
    analytic gradient; it must match the FD self-test."""
    x, y = data

    def dk_dh(x1, x2, h, direction):
        x1 = np.asarray(x1)
        x2 = np.asarray(x2)
        d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2 / h[1] ** 2).sum(-1)
        if direction == 0:
            return np.exp(-0.5 * d2)
        return h[0] * np.exp(-0.5 * d2) * d2 / h[1]

    gp = GP(x, y, init_hyperparameters=HPS, kernel_function=_np_sqexp,
            kernel_function_grad=dk_dh, ram_economy=True)
    fd, an = gp.test_log_likelihood_gradient(HPS, epsilon=1e-7)
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)


def test_user_kernel_grad_ram_economy_false(data):
    """User full-stack dk/dh (ram_economy=False, 3-arg returning (H,n,n))."""
    x, y = data

    def dk_dh_full(x1, x2, h):
        x1 = np.asarray(x1)
        x2 = np.asarray(x2)
        d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2 / h[1] ** 2).sum(-1)
        base = np.exp(-0.5 * d2)
        return np.stack([base, h[0] * base * d2 / h[1]])

    gp = GP(x, y, init_hyperparameters=HPS, kernel_function=_np_sqexp,
            kernel_function_grad=dk_dh_full, ram_economy=False)
    fd, an = gp.test_log_likelihood_gradient(HPS, epsilon=1e-7)
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)


def test_user_mean_grad(data):
    """User dm/dh hook (prior_mean_function_grad) feeds the analytic LML
    gradient."""
    x, y = data
    hps = np.array([1.2, 1.4, 0.5])

    def np_kern(x1, x2, h):
        return _np_sqexp(x1, x2, h[:2])

    def np_mean(xx, h):
        return h[2] * np.asarray(xx)[:, 0]

    def dm_dh(xx, h):
        xx = np.asarray(xx)
        return np.stack([np.zeros(len(xx)), np.zeros(len(xx)), xx[:, 0]])

    gp = GP(x, y, init_hyperparameters=hps, kernel_function=np_kern,
            prior_mean_function=np_mean, prior_mean_function_grad=dm_dh)
    fd, an = gp.test_log_likelihood_gradient(hps, epsilon=1e-7)
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)


def test_prior_validation_errors(data):
    x, y = data
    with pytest.raises(AssertionError):
        GP(x, y, init_hyperparameters=HPS, gp2Scale=True,
           gp2Scale_distribution="bogus")
    # non-Euclidean inputs (list of objects) demand a user kernel
    with pytest.raises(Exception):
        GP([object() for _ in range(4)], np.zeros(4),
           init_hyperparameters=HPS)


def test_lazy_prior_m_property(data):
    """Under gp2Scale the prior is lazy: accessing .m computes it on
    demand."""
    x, y = data
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 2.0, 2.0]),
            gp2Scale=True, args={"gp2Scale_block_size": 16})
    m = gp.prior.m
    assert np.asarray(m).shape == (len(x),)


def test_host_kernel_value_and_gradient_path(data):
    """A numpy (non-traceable) kernel routes log_likelihood_value_and_
    gradient through the shared-factorization host path: the value matches
    log_likelihood and the formula gradient matches central finite
    differences of the value (ref gp_marginal_likelihood.py:224-309)."""
    x, y = data
    gp = GP(x, y, init_hyperparameters=HPS, kernel_function=_np_sqexp)
    ml = gp.marginal_likelihood
    val, grad = ml.log_likelihood_value_and_gradient(HPS)
    assert val == pytest.approx(gp.log_likelihood(HPS), rel=1e-10)
    eps = 1e-5
    for i in range(len(HPS)):
        hp, hm = HPS.copy(), HPS.copy()
        hp[i] += eps
        hm[i] -= eps
        fd = (gp.log_likelihood(hp) - gp.log_likelihood(hm)) / (2 * eps)
        assert grad[i] == pytest.approx(fd, rel=2e-4, abs=1e-6)


def test_host_kernel_fd_hessian_matches_exact_traced(data):
    """The FD-of-gradient Hessian engine (host kernels, ref only has this)
    agrees with the EXACT jax.hessian of the traced path on the same
    model."""
    x, y = data
    gp_h = GP(x, y, init_hyperparameters=HPS, kernel_function=_np_sqexp)
    gp_t = GP(x, y, init_hyperparameters=HPS, kernel_function=_jnp_sqexp)
    Hh = gp_h.marginal_likelihood.neg_log_likelihood_hessian(HPS)
    Ht = gp_t.marginal_likelihood.neg_log_likelihood_hessian(HPS)
    assert Hh.shape == Ht.shape == (2, 2)
    np.testing.assert_allclose(Hh, Ht, rtol=5e-2, atol=5e-3)


def test_gradient_self_test_and_gp2scale_host_gradient_guard(data):
    """test_log_likelihood_gradient returns (FD, analytic) in agreement on
    the host path; gp2Scale with a non-traceable kernel refuses the
    gradient with the reference's guidance (train via MCMC/BO instead)."""
    x, y = data
    gp = GP(x, y, init_hyperparameters=HPS, kernel_function=_np_sqexp)
    fd, an = gp.marginal_likelihood.test_log_likelihood_gradient(HPS)
    np.testing.assert_allclose(fd, an, rtol=1e-3, atol=1e-4)

    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 30, (300, 2))
    ys = np.sin(xs[:, 0])

    def np_wendland_like(x1, x2, h):
        x1 = np.asarray(x1)
        x2 = np.asarray(x2)
        d = np.sqrt(((x1[:, None, :] / h[1:] - x2[None, :, :] / h[1:]) ** 2)
                    .sum(-1))
        return h[0] * np.clip(1 - d, 0, None) ** 2

    gp2 = GP(xs, ys, init_hyperparameters=np.array([1.0, 5.0, 5.0]),
             gp2Scale=True, kernel_function=np_wendland_like,
             args={"gp2Scale_block_size": 32})
    with pytest.raises(Exception, match="non-traceable"):
        gp2.marginal_likelihood.neg_log_likelihood_gradient(
            hyperparameters=np.array([1.0, 5.0, 5.0]))

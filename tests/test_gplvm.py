"""GPLVM latent-variable model (dev/-line equivalent)."""

import numpy as np
import pytest

from fvgp_tpu.models.gplvm import GPLVM


@pytest.mark.slow
def test_gplvm_recovers_1d_manifold(rng):
    """Observations on a smooth 1-d curve embedded in 5-d: the learned 1-d
    latent must order the points along the curve."""
    # open curve (half period): a full sin/cos period closes the loop and a
    # 1-d latent cannot order a closed manifold
    t = np.sort(rng.uniform(0, np.pi, 60))
    Y = np.stack([np.sin(t), np.cos(t), np.sin(2 * t), np.cos(2 * t),
                  0.3 * t], axis=1)
    Y += 0.01 * rng.standard_normal(Y.shape)
    m = GPLVM(Y, latent_dim=1)
    before = m.log_likelihood()
    m.train(max_iter=800)
    assert m.log_likelihood() > before
    z = m.latent_coordinates[:, 0]
    # latent order must correlate with the true parameter (up to sign)
    corr = abs(np.corrcoef(np.argsort(np.argsort(z)), np.arange(60))[0, 1])
    assert corr > 0.9
    # reconstruction error small at the training embedding (decoder
    # returns Y-space values, mean added back)
    rec = m.reconstruct()
    rel = np.linalg.norm(rec - Y) / np.linalg.norm(Y - Y.mean(axis=0))
    assert rel < 0.2


@pytest.mark.slow
def test_gplvm_predict_variance(rng):
    Y = rng.standard_normal((30, 4))
    m = GPLVM(Y, latent_dim=2)
    m.train(max_iter=100)
    v = m.predict_variance(m.latent_coordinates[:5])
    assert v.shape == (5,)
    assert np.all(v >= 0)
    far = m.predict_variance(np.full((1, 2), 50.0))
    assert far[0] > v.mean()      # far from data -> larger variance


@pytest.mark.slow
def test_gplvm_pickle_roundtrip():
    import pickle

    import numpy as np

    from fvgp_tpu import GPLVM

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, 30)
    y = np.stack([np.sin(t), np.cos(t), t / 3], axis=1)
    y += 0.01 * rng.standard_normal(y.shape)
    m = GPLVM(y, latent_dim=1)
    m.train(max_iter=30)
    m2 = pickle.loads(pickle.dumps(m))
    np.testing.assert_allclose(m2.log_likelihood(), m.log_likelihood(),
                               rtol=1e-10)
    np.testing.assert_allclose(m2.latent_coordinates, m.latent_coordinates)


# ---------------------------------------------------------------------------
# round-4 surface: train-method dispatch, bounds, posterior suite at new
# latents (parity target: the reference fork dev/gplvm.py:419, :735-1100)

def _curve_data(rng, n=40):
    t = np.sort(rng.uniform(0, np.pi, n))
    Y = np.stack([np.sin(t), np.cos(t), 0.3 * t], axis=1)
    return Y + 0.01 * rng.standard_normal(Y.shape)


@pytest.mark.slow
def test_gplvm_posterior_matches_exact_oracle(rng):
    """posterior_mean / posterior_covariance at new latents must equal the
    exact numpy GP built on the learned embedding."""
    Y = _curve_data(rng)
    m = GPLVM(Y, latent_dim=1)
    m.train(max_iter=150)

    X = m.latent_coordinates
    Xq = rng.standard_normal((7, 1))
    hps = m.hyperparameters
    noise = np.exp(m.log_noise)
    from fvgp_tpu.kernels import default_matern_ard
    K = np.asarray(default_matern_ard(X, X, hps)) + noise * np.eye(len(X))
    ks = np.asarray(default_matern_ard(X, Xq, hps))
    kss = np.asarray(default_matern_ard(Xq, Xq, hps))
    Yc = Y - Y.mean(axis=0)
    alpha = np.linalg.solve(K, Yc)
    mean_o = ks.T @ alpha + Y.mean(axis=0)
    S_o = kss - ks.T @ np.linalg.solve(K, ks)

    pm = m.posterior_mean(Xq)
    pc = m.posterior_covariance(Xq)
    np.testing.assert_allclose(pm["m(x)"], mean_o, atol=1e-8)
    np.testing.assert_allclose(pc["S"], S_o, atol=1e-8)
    np.testing.assert_allclose(pc["v(x)"], np.clip(np.diag(S_o), 0, None),
                               atol=1e-8)
    vo = m.posterior_covariance(Xq, variance_only=True)["v(x)"]
    np.testing.assert_allclose(vo, pc["v(x)"], atol=1e-8)
    # add_noise contract
    vn = m.posterior_covariance(Xq, add_noise=True)["v(x)"]
    np.testing.assert_allclose(vn, pc["v(x)"] + noise, atol=1e-10)


@pytest.mark.slow
def test_gplvm_posterior_grads_match_fd(rng):
    Y = _curve_data(rng, n=25)
    m = GPLVM(Y, latent_dim=1)
    m.train(max_iter=80)
    Xq = rng.standard_normal((4, 1))
    eps = 1e-6

    g = m.posterior_mean_grad(Xq, direction=0)["dm/dx"]
    up = m.posterior_mean(Xq + eps)["m(x)"]
    dn = m.posterior_mean(Xq - eps)["m(x)"]
    np.testing.assert_allclose(g, (up - dn) / (2 * eps), atol=1e-4)

    gv = m.posterior_covariance_grad(Xq, direction=0)["dv/dx"]
    vu = m.posterior_covariance(Xq + eps, variance_only=True)["v(x)"]
    vd = m.posterior_covariance(Xq - eps, variance_only=True)["v(x)"]
    np.testing.assert_allclose(gv, (vu - vd) / (2 * eps), atol=1e-4)


def test_gplvm_train_local_improves_and_respects_bounds(rng):
    Y = _curve_data(rng)
    m = GPLVM(Y, latent_dim=1)
    before = m.log_likelihood()
    bounds = np.array([[1e-2, 1e2], [1e-2, 1e2], [1e-4, 1.0]])
    m.train(method="local", hyperparameter_bounds=bounds, max_iter=150)
    assert m.log_likelihood() > before
    theta = m.get_hyperparameters()
    assert np.all(theta >= bounds[:, 0] - 1e-12)
    assert np.all(theta <= bounds[:, 1] + 1e-12)


def test_gplvm_train_mcmc_updates_info_and_commits_map(rng):
    Y = _curve_data(rng, n=20)
    m = GPLVM(Y, latent_dim=1)
    m.train(max_iter=50)                      # reasonable latents first
    bounds = np.array([[1e-2, 1e2], [1e-2, 1e2], [1e-4, 1.0]])
    theta = m.train(method="mcmc", hyperparameter_bounds=bounds,
                    max_iter=300)
    assert m.mcmc_info is not None
    assert len(m.mcmc_info["f(x)"]) > 0
    np.testing.assert_allclose(theta, m.get_hyperparameters())
    assert np.all(theta >= bounds[:, 0]) and np.all(theta <= bounds[:, 1])
    # the committed sample is the MAP of the trace
    f = np.asarray(m.mcmc_info["f(x)"])
    assert m.log_likelihood() >= f.max() - 1e-6


def test_gplvm_train_mcmc_sample_latent(rng):
    Y = _curve_data(rng, n=12)
    m = GPLVM(Y, latent_dim=1)
    X_before = m.latent_coordinates.copy()
    m.train(method="mcmc", max_iter=60, sample_latent=True)
    # latents were sampled and committed (MAP draw differs from the seed)
    assert m.latent_coordinates.shape == X_before.shape
    assert np.isfinite(m.log_likelihood())


def test_gplvm_train_callable_and_set_hyperparameters(rng):
    Y = _curve_data(rng, n=15)
    m = GPLVM(Y, latent_dim=1)

    def my_method(model):
        return np.array([2.0, 0.5, 1e-2])

    theta = m.train(method=my_method)
    np.testing.assert_allclose(theta, [2.0, 0.5, 1e-2])
    np.testing.assert_allclose(m.hyperparameters, [2.0, 0.5])
    np.testing.assert_allclose(np.exp(m.log_noise), 1e-2)

    import pytest
    with pytest.raises(AssertionError):
        m.set_hyperparameters(np.array([1.0, -1.0, 1e-2]))
    with pytest.raises(ValueError):
        m.train(method="nope")


@pytest.mark.slow
def test_gplvm_gradient_selftest_and_loglik_override(rng):
    Y = _curve_data(rng, n=18)
    m = GPLVM(Y, latent_dim=1)
    m.train(max_iter=60)
    analytic, fd = m.test_log_likelihood_gradient()
    np.testing.assert_allclose(analytic, fd, rtol=1e-4, atol=1e-5)
    # override evaluates without committing
    theta = m.get_hyperparameters()
    l0 = m.log_likelihood()
    l1 = m.log_likelihood(theta * 1.5)
    assert l0 != l1
    np.testing.assert_allclose(m.get_hyperparameters(), theta)


@pytest.mark.slow
def test_gplvm_info_theory_surface(rng):
    Y = _curve_data(rng, n=20)
    m = GPLVM(Y, latent_dim=1)
    m.train(max_iter=60)
    Xq = rng.standard_normal((3, 1))
    jp = m.joint_gp_prior(Xq)
    assert jp["S"].shape == (23, 23)
    # entropy equals the Gaussian formula on the same joint covariance
    _, ldet = np.linalg.slogdet(jp["S"])
    want = 23 / 2.0 + (23 / 2.0) * np.log(2 * np.pi) + 0.5 * ldet
    np.testing.assert_allclose(m.gp_entropy(Xq), want, rtol=1e-10)
    mi = m.gp_mutual_information(Xq)["mutual information"]
    assert mi > 0
    kl = m.gp_kl_div(Xq, np.zeros(3), np.eye(3))["kl-div"]
    assert kl >= 0


def test_gplvm_train_legacy_positional(rng):
    """The pre-dispatch signature train(max_iter[, learning_rate]) keeps
    working positionally (review finding: method-first dispatch must not
    break numeric positional callers)."""
    Y = rng.standard_normal((16, 3))
    m = GPLVM(Y, latent_dim=1)
    before = m.log_likelihood()
    z = m.train(30, 5e-3)
    assert z.shape == (16, 1)
    assert m.log_likelihood() >= before - 1e-9

"""GPm manifold GP (parity target: the reference's unreleased
dev/gpm.py:20 — the multi-output trace-form LML is its coherent core)."""

import warnings

import pytest
import numpy as np

from fvgp_tpu import GP, GPm

warnings.simplefilter("ignore")


def _manifold_data(n=80, d=4, seed=0):
    """y depends on a 1-D linear manifold of the 4-D input."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, (n, d))
    w = np.array([1.0, -0.5, 0.25, 0.0])
    t = x @ w
    y = np.stack([np.sin(t), np.cos(t)], axis=1)
    y += 0.01 * rng.standard_normal(y.shape)
    return x, y


def test_gpm_lml_matches_per_output_gps():
    """With the identity embedding, the trace-form multi-output LML equals
    the sum of per-output single-task GP LMLs sharing the kernel."""
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 5, (40, 2))
    y = rng.standard_normal((40, 3))
    hps = np.array([1.0, 1.5, 1.5])
    noise = 1e-2
    m = GPm(x, y, manifold_dim=2, init_hyperparameters=hps, noise=noise,
            train_embedding=False)
    # identity embedding for the oracle comparison
    import jax.numpy as jnp
    m.W = jnp.eye(2, dtype=m.W.dtype)
    lml = m.log_likelihood()
    total = 0.0
    for qq in range(3):
        gp = GP(x, y[:, qq] - y[:, qq].mean(), init_hyperparameters=hps,
                noise_variances=np.full(40, noise))
        # GPm centers per output and uses a zero prior mean
        gp.prior._default_mean = True
        total += float(gp.marginal_likelihood.log_likelihood(hps))
    np.testing.assert_allclose(lml, total, rtol=1e-8)


@pytest.mark.slow
def test_gpm_trains_and_predicts():
    x, y = _manifold_data()
    m = GPm(x, y, manifold_dim=1)
    lml0 = m.log_likelihood()
    m.train(max_iter=300, learning_rate=5e-2)
    assert m.log_likelihood() > lml0
    xp = x[:10]
    pm = m.posterior_mean(xp)
    pv = m.posterior_variance(xp)
    assert pm.shape == (10, 2) and pv.shape == (10,)
    # in-sample prediction recovers the (smooth) targets
    assert np.sqrt(np.mean((pm - y[:10]) ** 2)) < 0.15
    assert np.all(pv >= 0)
    # the learned 1-D manifold aligns with the generating direction
    w_true = np.array([1.0, -0.5, 0.25, 0.0])
    w_learned = np.asarray(m.W)[:, 0]
    cos = abs(w_true @ w_learned) / (np.linalg.norm(w_true)
                                     * np.linalg.norm(w_learned))
    assert cos > 0.9, cos


def test_gpm_frozen_embedding():
    x, y = _manifold_data(n=40)
    m = GPm(x, y, manifold_dim=2, train_embedding=False)
    W0 = np.asarray(m.W).copy()
    m.train(max_iter=50)
    np.testing.assert_array_equal(np.asarray(m.W), W0)


@pytest.mark.slow
def test_gpm_pickle_roundtrip():
    import pickle

    x, y = _manifold_data(n=40)
    m = GPm(x, y, manifold_dim=1)
    m.train(max_iter=30)
    m2 = pickle.loads(pickle.dumps(m))
    np.testing.assert_allclose(m2.log_likelihood(), m.log_likelihood(),
                               rtol=1e-10)
    np.testing.assert_allclose(m2.posterior_mean(x[:5]),
                               m.posterior_mean(x[:5]), rtol=1e-10)

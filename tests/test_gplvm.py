"""GPLVM latent-variable model (dev/-line equivalent)."""

import numpy as np

from fvgp_tpu.models.gplvm import GPLVM


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
    # reconstruction error small at the training embedding
    rec = m.reconstruct()
    rel = np.linalg.norm(rec - (Y - Y.mean(axis=0))) / np.linalg.norm(Y - Y.mean(axis=0))
    assert rel < 0.2


def test_gplvm_predict_variance(rng):
    Y = rng.standard_normal((30, 4))
    m = GPLVM(Y, latent_dim=2)
    m.train(max_iter=100)
    v = m.predict_variance(m.latent_coordinates[:5])
    assert v.shape == (5,)
    assert np.all(v >= 0)
    far = m.predict_variance(np.full((1, 2), 50.0))
    assert far[0] > v.mean()      # far from data -> larger variance


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

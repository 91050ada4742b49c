"""Structured (sparse-matrix) user noise: a noise callable may return a
scipy.sparse matrix or a BlockSparseMatrix, folded into K+V sparse-aware
(parity: ref gp_likelihood.py:89-110, gp_kv.py:640-669)."""

import warnings

import pytest
import numpy as np
import scipy.sparse as sps

from fvgp_tpu import GP
from fvgp_tpu.kernels import wendland_anisotropic
from fvgp_tpu.parallel.block_sparse import BlockSparseMatrix, from_scipy, merge
from fvgp_tpu.parallel.ordering import morton_order

warnings.simplefilter("ignore")


def _banded_noise(n, level=0.05, coupling=0.02):
    """SPD banded noise: tridiagonal with dominant diagonal."""
    main = np.full(n, level)
    off = np.full(n - 1, coupling)
    return sps.diags([off, main, off], [-1, 0, 1]).tocsr()


def _data(n=120, d=2, seed=0, span=10.0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, span, (n, d))
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(n)
    return x, y


def test_from_scipy_roundtrip():
    rng = np.random.default_rng(1)
    A = sps.random(40, 40, density=0.1, random_state=rng.integers(1 << 30))
    bsm = from_scipy(A, 16)
    np.testing.assert_allclose(np.asarray(bsm.to_dense()), A.toarray(),
                               atol=1e-14)


def test_merge_duplicates_sum():
    A = sps.random(30, 30, density=0.2, random_state=0)
    B = sps.random(30, 30, density=0.2, random_state=1)
    m = merge(from_scipy(A, 8), from_scipy(B, 8))
    np.testing.assert_allclose(np.asarray(m.to_dense()),
                               (A + B).toarray(), atol=1e-14)
    v = np.random.default_rng(2).standard_normal(30)
    np.testing.assert_allclose(np.asarray(m @ v), (A + B) @ v, atol=1e-12)


def test_merged_fingerprint_is_frobenius_of_represented_matrix():
    """merge() keeps duplicate (row, col) tiles; the drift fingerprint must
    still be the Frobenius norm of A+B (cross terms included)."""
    A = sps.random(30, 30, density=0.2, random_state=0)
    B = sps.random(30, 30, density=0.2, random_state=1)
    m = merge(from_scipy(A, 8), from_scipy(B, 8))
    tr, fro = m.trace_and_fro()
    dense = (A + B).toarray()
    np.testing.assert_allclose(float(tr), np.trace(dense), atol=1e-10)
    np.testing.assert_allclose(float(fro), np.linalg.norm(dense), atol=1e-10)


@pytest.mark.slow
def test_dense_gp_sparse_noise_matches_dense_oracle():
    """Sparse-matrix noise on the dense path == the same noise passed dense."""
    x, y = _data()
    n = len(x)
    Vs = _banded_noise(n)
    hps = np.array([1.0, 1.0, 1.0])

    gp_sparse = GP(x, y, init_hyperparameters=hps,
                   noise_function=lambda xx, h: _banded_noise(len(xx)))
    gp_dense = GP(x, y, init_hyperparameters=hps,
                  noise_function=lambda xx, h: _banded_noise(len(xx)).toarray())
    np.testing.assert_allclose(gp_sparse.log_likelihood(),
                               gp_dense.log_likelihood(), rtol=1e-10)
    xp = x[:7] + 0.1
    np.testing.assert_allclose(
        np.asarray(gp_sparse.posterior_mean(xp)["m(x)"]),
        np.asarray(gp_dense.posterior_mean(xp)["m(x)"]), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(gp_sparse.posterior_covariance(xp)["v(x)"]),
        np.asarray(gp_dense.posterior_covariance(xp)["v(x)"]), rtol=1e-8)
    # gradient engine (FD over the structured noise) agrees too
    np.testing.assert_allclose(gp_sparse.neg_log_likelihood_gradient(),
                               gp_dense.neg_log_likelihood_gradient(),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_gp2Scale_sparse_noise_matches_dense_oracle():
    """Banded scipy.sparse noise under gp2Scale: K+V merges the noise tiles
    into the block-sparse operator; LML and posterior match a dense GP with
    the same (densified) noise."""
    x, y = _data(n=300, span=25.0, seed=3)
    perm = morton_order(x)
    x, y = x[perm], y[perm]
    n = len(x)
    hps = np.array([1.0, 2.0, 2.0])

    def sparse_noise(xx, h):
        return _banded_noise(len(xx))

    gp2 = GP(x, y, init_hyperparameters=hps, gp2Scale=True,
             linalg_mode="sparseCGpre",
             kernel_function=wendland_anisotropic,
             noise_function=sparse_noise,
             args={"gp2Scale_block_size": 32, "gp2Scale_reorder": False,
                   "gp2Scale_lengthscales": lambda h: h[1:],
                   "sparse_cg_tol": 1e-12})
    gpd = GP(x, y, init_hyperparameters=hps,
             kernel_function=wendland_anisotropic,
             noise_function=lambda xx, h: _banded_noise(len(xx)).toarray())
    from fvgp_tpu.parallel.block_sparse import is_block_sparse
    assert is_block_sparse(gp2.kv.KV)
    # the merged block-sparse K+V equals the dense oracle's K+V exactly
    np.testing.assert_allclose(
        np.asarray(gp2.kv.KV.to_dense()),
        np.asarray(gpd.K) + _banded_noise(n).toarray(), atol=1e-12)
    # LML agrees to the stochastic-logdet estimator's noise floor
    np.testing.assert_allclose(gp2.log_likelihood(), gpd.log_likelihood(),
                               rtol=1e-3)
    xp = x[:5] + 0.05
    np.testing.assert_allclose(
        np.asarray(gp2.posterior_mean(xp)["m(x)"]),
        np.asarray(gpd.posterior_mean(xp)["m(x)"]), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(gp2.posterior_covariance(xp)["v(x)"]),
        np.asarray(gpd.posterior_covariance(xp)["v(x)"]), rtol=1e-5,
        atol=1e-8)


@pytest.mark.slow
def test_block_sparse_noise_object():
    """A noise callable may return a BlockSparseMatrix directly."""
    x, y = _data(n=64)
    hps = np.array([1.0, 1.0, 1.0])

    def bsm_noise(xx, h):
        return from_scipy(_banded_noise(len(xx)), 16)

    gp1 = GP(x, y, init_hyperparameters=hps, noise_function=bsm_noise)
    gp2 = GP(x, y, init_hyperparameters=hps,
             noise_function=lambda xx, h: _banded_noise(len(xx)).toarray())
    np.testing.assert_allclose(gp1.log_likelihood(), gp2.log_likelihood(),
                               rtol=1e-10)


@pytest.mark.slow
def test_add_noise_with_structured_noise():
    """Regression: posterior add_noise densifies structured noise instead
    of silently skipping it with a warning."""
    x, y = _data(n=80)
    hps = np.array([1.0, 1.0, 1.0])
    gp_s = GP(x, y, init_hyperparameters=hps,
              noise_function=lambda xx, h: _banded_noise(len(xx)))
    gp_d = GP(x, y, init_hyperparameters=hps,
              noise_function=lambda xx, h: _banded_noise(len(xx)).toarray())
    xp = x[:6] + 0.1
    vs = np.asarray(gp_s.posterior_covariance(xp, add_noise=True)["v(x)"])
    vd = np.asarray(gp_d.posterior_covariance(xp, add_noise=True)["v(x)"])
    np.testing.assert_allclose(vs, vd, rtol=1e-8)
    # the noise really was added
    v0 = np.asarray(gp_s.posterior_covariance(xp, add_noise=False)["v(x)"])
    assert np.all(vs > v0)


def test_noise_fd_gradient_densifies_structured_noise():
    """The FD noise-gradient engine densifies scipy-sparse / BlockSparse
    noise returns (gp_likelihood._densify both branches)."""
    import jax.numpy as jnp
    from scipy import sparse as sp

    from fvgp_tpu.models.gp_likelihood import GPlikelihood, _densify
    from fvgp_tpu.parallel.block_sparse import BlockSparseMatrix

    rng = np.random.default_rng(0)
    n = 8
    x = rng.uniform(0, 1, (n, 1))
    y = np.sin(x[:, 0])

    def sparse_noise(x_, hps, args=None):
        return sp.diags(np.full(len(x_), hps[0] * 1e-2)).tocsr()

    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]),
            noise_function=sparse_noise)
    g = gp.likelihood.calculate_V_grad(x, np.array([1.0, 1.0]), 0)
    np.testing.assert_allclose(np.diag(np.asarray(g)), 1e-2, atol=1e-5)

    # block-sparse densify branch
    t = np.eye(4) * 2.0
    A = BlockSparseMatrix(8, 8, 4, jnp.array([0, 1]), jnp.array([0, 1]),
                          jnp.stack([jnp.asarray(t)] * 2))
    np.testing.assert_allclose(np.asarray(_densify(A)), 2.0 * np.eye(8))
    np.testing.assert_allclose(
        np.asarray(_densify(sp.eye(5).tocsr())), np.eye(5))

"""Dense ops, Krylov solvers, SLQ, preconditioner — all against numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from fvgp_tpu.ops import dense as dops
from fvgp_tpu.ops import krylov, slq
from fvgp_tpu.ops.precond import build_block_jacobi
from fvgp_tpu.parallel.block_sparse import BlockSparseMatrix


def _spd(n, seed=0):
    r = np.random.default_rng(seed)
    A = r.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_cholesky_roundtrip():
    A = _spd(50)
    L = dops.cholesky_factor(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L @ L.T), A, atol=1e-8)
    b = np.random.default_rng(1).standard_normal((50, 3))
    x = np.asarray(dops.cholesky_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-8)
    ld = float(dops.cholesky_logdet(L))
    assert abs(ld - np.linalg.slogdet(A)[1]) < 1e-8


def test_non_pd_raises():
    A = -np.eye(5)
    with pytest.raises(dops.NonPositiveDefiniteError):
        dops.cholesky_factor(jnp.asarray(A))


def test_inverse_paths():
    A = _spd(30, 2)
    inv = np.asarray(dops.calculate_inv(jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), atol=1e-8)
    L = dops.cholesky_factor(jnp.asarray(A))
    inv2 = np.asarray(dops.inv_from_chol(L))
    np.testing.assert_allclose(inv2, np.linalg.inv(A), atol=1e-8)


def test_blocked_rank_n_update():
    """Appending data extends the factor via two triangular solves +
    a small Cholesky — must agree with refactorization to 1e-8."""
    n_old, n_new = 40, 7
    A = _spd(n_old + n_new, 3)
    L_old = dops.cholesky_factor(jnp.asarray(A[:n_old, :n_old]))
    L = np.asarray(dops.update_chol_factor(L_old, jnp.asarray(A)))
    L_ref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, L_ref, atol=1e-8)

    inv_old = np.linalg.inv(A[:n_old, :n_old])
    inv = np.asarray(dops.update_inv(jnp.asarray(inv_old), jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), atol=1e-7)

    ld_old = np.linalg.slogdet(A[:n_old, :n_old])[1]
    ld = float(dops.update_logdet(ld_old, jnp.asarray(inv_old), jnp.asarray(A)))
    assert abs(ld - np.linalg.slogdet(A)[1]) < 1e-7


def test_cg_dense():
    A = _spd(64, 4)
    b = np.random.default_rng(5).standard_normal((64, 2))
    x = np.asarray(krylov.cg(krylov.make_dense_matvec(jnp.asarray(A)),
                             jnp.asarray(b), tol=1e-10))
    np.testing.assert_allclose(A @ x, b, atol=1e-6)


@pytest.mark.slow
def test_cg_warm_start_and_precond():
    A = _spd(64, 6)
    b = np.random.default_rng(7).standard_normal(64)
    x_exact = np.linalg.solve(A, b)
    M = build_block_jacobi(jnp.asarray(A), args={"sparse_preconditioner_block_size": 16})
    x = np.asarray(krylov.cg(krylov.make_dense_matvec(jnp.asarray(A)),
                             jnp.asarray(b), M=M, tol=1e-10))
    np.testing.assert_allclose(x, x_exact, atol=1e-6)
    # warm start from the solution converges instantly and stays there
    x2 = np.asarray(krylov.cg(krylov.make_dense_matvec(jnp.asarray(A)),
                              jnp.asarray(b), x0=jnp.asarray(x_exact), tol=1e-10))
    np.testing.assert_allclose(x2, x_exact, atol=1e-6)


def test_minres_dense():
    A = _spd(48, 8)
    b = np.random.default_rng(9).standard_normal((48, 3))
    x = np.asarray(krylov.minres(krylov.make_dense_matvec(jnp.asarray(A)),
                                 jnp.asarray(b), tol=1e-12))
    np.testing.assert_allclose(A @ x, b, atol=1e-5)


def test_minres_indefinite():
    """MINRES must handle symmetric indefinite systems (unlike CG)."""
    r = np.random.default_rng(10)
    Q, _ = np.linalg.qr(r.standard_normal((30, 30)))
    eigs = np.concatenate([np.linspace(1, 5, 20), -np.linspace(1, 3, 10)])
    A = Q @ np.diag(eigs) @ Q.T
    b = r.standard_normal(30)
    x = np.asarray(krylov.minres(krylov.make_dense_matvec(jnp.asarray(A)),
                                 jnp.asarray(b), tol=1e-12, maxiter=300))
    np.testing.assert_allclose(A @ x, b, atol=1e-5)


def test_slq_logdet_accuracy():
    A = _spd(200, 11)
    info = {}
    ld = slq.slq_logdet(krylov.make_dense_matvec(jnp.asarray(A)), 200,
                        degree=30, min_num_samples=30, max_num_samples=400,
                        error_rtol=0.005, info_out=info)
    exact = np.linalg.slogdet(A)[1]
    assert abs(ld - exact) / abs(exact) < 0.02
    assert info["variance"] >= 0.0
    assert info["num_samples"] >= 30


def test_block_jacobi_on_block_sparse():
    B = 8
    A = _spd(24, 12)
    # build a dense-as-block-sparse matrix (3x3 grid, all tiles)
    rows, cols, tiles = [], [], []
    for i in range(3):
        for j in range(3):
            rows.append(i)
            cols.append(j)
            tiles.append(A[i * B:(i + 1) * B, j * B:(j + 1) * B])
    bsm = BlockSparseMatrix(24, 24, B, np.array(rows), np.array(cols),
                            np.stack(tiles))
    M = build_block_jacobi(bsm)
    x = np.random.default_rng(13).standard_normal(24)
    out = np.asarray(M(jnp.asarray(x)))
    expected = np.concatenate([
        np.linalg.solve(A[i * B:(i + 1) * B, i * B:(i + 1) * B],
                        x[i * B:(i + 1) * B]) for i in range(3)])
    np.testing.assert_allclose(out, expected, atol=1e-8)

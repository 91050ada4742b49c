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


def test_cg_zero_rhs_column_with_warm_start_converges_immediately():
    """A zero RHS column has solution 0 exactly; with a warm start it must
    not drag the block to maxiter (review finding: rnorm=|A x0| never
    reaches atol~0, costing 10*N matvecs at scale)."""
    rng = np.random.default_rng(0)
    n = 24
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    B = rng.standard_normal((n, 3))
    B[:, 1] = 0.0
    x0 = rng.standard_normal((n, 3))
    X, info = krylov.cg(krylov.dense_matvec, jnp.asarray(B),
                        x0=jnp.asarray(x0), tol=1e-10, maxiter=500,
                        operator=jnp.asarray(A), with_info=True)
    assert info["iterations"] < 60          # not maxiter
    np.testing.assert_allclose(np.asarray(X[:, 1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A @ X[:, 0]), B[:, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(A @ X[:, 2]), B[:, 2], atol=1e-7)


def test_minres_indefinite_preconditioner_poisons_not_silent():
    """An indefinite preconditioner must not return the warm start as
    'converged' (review finding); the columns come back NaN, loudly."""
    rng = np.random.default_rng(1)
    n = 12
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    Mbad = -np.eye(n)                       # definitely indefinite
    x = krylov.minres(krylov.dense_matvec, jnp.asarray(b),
                      M=krylov.dense_matvec, maxiter=50,
                      operator=jnp.asarray(A), m_operator=jnp.asarray(Mbad))
    assert np.all(np.isnan(np.asarray(x)))
    # zero RHS column: exact 0 solution, no NaN, quick exit
    B = np.stack([b, np.zeros(n)], axis=1)
    X = krylov.minres(krylov.dense_matvec, jnp.asarray(B), maxiter=200,
                      operator=jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(X[:, 1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A @ X[:, 0]), b, atol=1e-6)


def test_slq_probe_batch_capped_by_memory(monkeypatch):
    """The default probe batch is bounded independently of the requested
    sample count (review finding: batch=min_num_samples materialized a
    (batch, degree, n) basis -> OOM at large sample requests)."""
    seen = {}
    real = slq._probe_batch

    def spy(fn, data, key, n, degree, batch, dtype):
        seen.setdefault("batches", []).append(batch)
        return real(fn, data, key, n, degree, batch, dtype)

    monkeypatch.setattr(slq, "_probe_batch", spy)
    rng = np.random.default_rng(2)
    A = rng.standard_normal((30, 30))
    A = A @ A.T + 30 * np.eye(30)
    val = slq.slq_logdet(krylov.dense_matvec, 30, degree=12,
                         min_num_samples=600, max_num_samples=600,
                         error_rtol=0.0, operator=jnp.asarray(A))
    assert max(seen["batches"]) <= 256
    assert abs(val - np.linalg.slogdet(A)[1]) / abs(np.linalg.slogdet(A)[1]) < 0.05


def test_unknown_preconditioner_type_raises_everywhere():
    """A typo'd sparse_preconditioner_type raises from the operator
    dispatch itself, never a silent block-Jacobi fallback (review
    finding); one alias table serves both layers."""
    from fvgp_tpu.gp_lin_alg import normalize_sparse_preconditioner_type
    from fvgp_tpu.ops.precond import build_preconditioner_op, normalize_type

    rng = np.random.default_rng(3)
    A = rng.standard_normal((16, 16))
    A = A @ A.T + 16 * np.eye(16)
    with pytest.raises(Exception, match="Unknown sparse preconditioner"):
        build_preconditioner_op(jnp.asarray(A),
                                args={"sparse_preconditioner_type": "schwartz"})
    # case-insensitive canonicalization, shared by both layers
    assert normalize_type("AMG") == "amg"
    assert normalize_sparse_preconditioner_type("ICHOL0") == "schwarz"
    m_fn, m_data = build_preconditioner_op(
        jnp.asarray(A), args={"sparse_preconditioner_type": "AMG"})
    z = m_fn(m_data, jnp.asarray(rng.standard_normal((16, 2))))
    assert np.all(np.isfinite(np.asarray(z)))

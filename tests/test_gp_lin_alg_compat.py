"""The reference-name linear-algebra layer (``fvgp_tpu.gp_lin_alg``) must be
drop-in for code written against ``fvgp.gp_lin_alg``: same names, same call
signatures, numpy in/out, reference arg keys honored.  Oracles are exact
numpy/scipy."""

import numpy as np
import pytest
from scipy import sparse

import fvgp_tpu.gp_lin_alg as gla


def _spd(n, seed=0, jitter=1e-3):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T / n + jitter * np.eye(n)


def _sparse_spd(n, seed=1):
    rng = np.random.default_rng(seed)
    d = np.abs(rng.standard_normal(n)) + 1.0
    off = sparse.random(n, n, density=0.01, random_state=int(seed),
                        data_rvs=lambda k: 0.05 * rng.standard_normal(k))
    S = off + off.T + sparse.diags(d)
    return S.tocsr()


def test_cholesky_family_matches_numpy():
    A = _spd(40)
    L = gla.calculate_Chol_factor(A)
    np.testing.assert_allclose(L @ L.T, A, atol=1e-10)
    b = np.arange(40, dtype=float)
    x = gla.calculate_Chol_solve(L, b)
    assert x.shape == (40, 1)                       # 1-d rhs comes back 2-d
    np.testing.assert_allclose(A @ x[:, 0], b, atol=1e-8)
    assert gla.calculate_Chol_logdet(L) == pytest.approx(
        np.linalg.slogdet(A)[1], rel=1e-10)
    Ainv = gla.calculate_inv_from_chol(L)
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), atol=1e-8)


@pytest.mark.slow
def test_factor_update_family():
    big = _spd(30, seed=3)
    A, Bb, C = big[:22, :22], big[:22, 22:], big[22:, 22:]
    L = gla.calculate_Chol_factor(A)
    L2 = gla.update_Chol_factor(L, big)
    np.testing.assert_allclose(L2 @ L2.T, big, atol=1e-9)
    L3 = gla.cholesky_update_rank_n(L, Bb, C)
    np.testing.assert_allclose(L3, L2, atol=1e-9)
    ld = gla.update_logdet(gla.calculate_logdet(A), np.linalg.inv(A), big)
    assert ld == pytest.approx(np.linalg.slogdet(big)[1], rel=1e-9)
    inv2 = gla.update_inv(np.linalg.inv(A), big)
    np.testing.assert_allclose(inv2, np.linalg.inv(big), atol=1e-7)


def test_dense_general_family():
    A = _spd(25, seed=4)
    assert gla.calculate_logdet(A) == pytest.approx(
        np.linalg.slogdet(A)[1], rel=1e-10)
    np.testing.assert_allclose(gla.calculate_inv(A), np.linalg.inv(A),
                               atol=1e-8)
    b = np.ones(25)
    np.testing.assert_allclose(gla.solve(A, b)[:, 0],
                               np.linalg.solve(A, b), atol=1e-8)
    B = np.arange(50, dtype=float).reshape(25, 2)
    np.testing.assert_allclose(gla.matmul(A, B), A @ B)
    np.testing.assert_allclose(gla.matmul3(A, A, B), A @ A @ B, rtol=1e-10)
    assert not gla.is_sparse(A)
    S = sparse.diags(np.ones(200)).tocsr()       # 0.5% nonzero
    assert gla.is_sparse(S.toarray())
    assert gla.how_sparse_is(S) == pytest.approx(200 / float(200 * 200))


@pytest.mark.slow
def test_sparse_krylov_solvers_accept_scipy_matrices():
    S = _sparse_spd(150)
    b = np.sin(np.arange(150, dtype=float))
    x_ref = np.linalg.solve(S.toarray(), b)
    for solver in (gla.calculate_sparse_conj_grad,
                   gla.calculate_sparse_minres):
        x = solver(S, b, args={"sparse_cg_tol": 1e-12,
                               "sparse_minres_tol": 1e-12})
        assert x.shape == (150, 1)
        np.testing.assert_allclose(x[:, 0], x_ref, atol=1e-6)
    # warm start and multi-RHS accepted like the reference
    rhs = np.stack([b, 2 * b], axis=1)
    x2 = gla.calculate_sparse_conj_grad(S, rhs, x0=np.zeros_like(rhs),
                                        args={"sparse_cg_tol": 1e-12})
    np.testing.assert_allclose(x2[:, 1], 2 * x_ref, atol=1e-5)


@pytest.mark.slow
def test_sparse_preconditioner_types_and_cg_hookup():
    S = _sparse_spd(160, seed=7)
    b = np.cos(np.arange(160, dtype=float))
    x_ref = np.linalg.solve(S.toarray(), b)
    for ptype in ("block_jacobi", "ichol0", "ilu", "amg"):
        factor, M = gla.calculate_sparse_preconditioner(
            S, {"sparse_preconditioner_type": ptype,
                "gp2Scale_block_size": 32})
        x = gla.calculate_sparse_conj_grad(
            S, b, M=M, args={"sparse_cg_tol": 1e-12,
                             "gp2Scale_block_size": 32})
        np.testing.assert_allclose(x[:, 0], x_ref, atol=1e-6)
    assert gla.normalize_sparse_preconditioner_type("ichol0") == "schwarz"
    assert gla.normalize_sparse_preconditioner_type("jacobi") == "block_jacobi"
    with pytest.raises(Exception, match="Unknown sparse preconditioner"):
        gla.normalize_sparse_preconditioner_type("nonsense")


def test_sparse_direct_semantics():
    S = _sparse_spd(120, seed=9)
    b = np.arange(120, dtype=float)
    x = gla.calculate_sparse_solve(S, b)
    np.testing.assert_allclose(x[:, 0], np.linalg.solve(S.toarray(), b),
                               atol=1e-7)
    LU = gla.calculate_sparse_LU_factor(S)
    np.testing.assert_allclose(gla.calculate_LU_solve(LU, b)[:, 0],
                               np.linalg.solve(S.toarray(), b), atol=1e-7)
    assert gla.calculate_LU_logdet(LU) == pytest.approx(
        np.linalg.slogdet(S.toarray())[1], rel=1e-9)


@pytest.mark.slow
def test_random_logdet_contract():
    S = _sparse_spd(220, seed=11)
    info = {}
    ld = gla.calculate_random_logdet(
        S, args={"random_logdet_lanczos_degree": 30,
                 "random_logdet_min_num_samples": 40,
                 "random_logdet_error_rtol": 1e-3}, info_out=info)
    exact = np.linalg.slogdet(S.toarray())[1]
    assert abs(ld - exact) / abs(exact) < 0.05
    assert info["num_samples_used"] >= 40
    assert info["variance"] is None or info["variance"] >= 0.0


def test_rank_1_update_and_engine_aliases():
    A = _spd(30, seed=13)
    rng = np.random.default_rng(13)
    b = rng.standard_normal(30) * 0.05
    c = 2.0
    L = gla.calculate_Chol_factor(A)
    big = np.block([[A, b[:, None]], [b[None, :], np.array([[c]])]])
    for fn in (gla.cholesky_update_rank_1, gla.cholesky_update_rank_1_numpy,
               gla.cholesky_update_rank_1_torch,
               gla.cholesky_update_rank_1_cupy):
        L1 = fn(L, b, c)
        np.testing.assert_allclose(np.tril(L1) @ np.tril(L1).T, big,
                                   atol=1e-8)


def test_gpu_engine_stubs():
    assert gla.get_gpu_engine({"GPU_engine": "torch"}) is None
    msg = gla.gpu_engine_unavailable_reason("torch")
    assert "JAX" in msg or "XLA" in msg


def test_spai_reduces_residual_and_preconditions():
    S = _sparse_spd(150, seed=17)
    eye = sparse.identity(150, format="csr")
    M1 = gla.spai(S, 1)
    M8 = gla.spai(S, 8)
    r1 = sparse.linalg.norm(eye - S @ M1)
    r8 = sparse.linalg.norm(eye - S @ M8)
    assert r8 < r1 < sparse.linalg.norm(eye)
    assert sparse.issparse(M8)


def test_failure_guidance_and_mode_resolution():
    txt = gla.sparse_preconditioner_failure_guidance(
        {"sparse_preconditioner_type": "ichol"})
    assert "Schwarz" in txt or "schwarz" in txt.lower()
    mode, args = gla.resolve_gp2scale_linalg_mode("sparseCGpre_amg", {})
    assert mode == "sparseCGpre"
    assert args["sparse_preconditioner_type"] == "amg"
    # the error type is importable under its reference name
    assert issubclass(gla.NonPositiveDefiniteError, np.linalg.LinAlgError)


def test_mode_resolution_reference_contract():
    """Case-insensitive matching; conflicting explicit type raises
    (ref gp_lin_alg.py:474-505)."""
    mode, args = gla.resolve_gp2scale_linalg_mode("sparsecgpre_AMG", {})
    assert mode == "sparseCGpre" and args["sparse_preconditioner_type"] == "amg"
    with pytest.raises(ValueError, match="Conflicting"):
        gla.resolve_gp2scale_linalg_mode(
            "sparseCGpre_amg", {"sparse_preconditioner_type": "schwarz"})
    # non-conflicting explicit type (same after normalization) is fine
    mode, args = gla.resolve_gp2scale_linalg_mode(
        "sparseCGpre_ichol", {"sparse_preconditioner_type": "ic"})
    assert args["sparse_preconditioner_type"] == "schwarz"
    # guidance never raises, even on junk args
    assert isinstance(gla.sparse_preconditioner_failure_guidance("junk"), str)

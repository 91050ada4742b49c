"""The differentiable sparse LML (ops/sparse_lml): gradient correctness via
finite differences, bf16 solver option, sentinel handling."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from fvgp_tpu.kernels import wendland_anisotropic
from fvgp_tpu.ops import sparse_lml as SL
from fvgp_tpu.parallel.ordering import morton_order
from fvgp_tpu.parallel.sharded_cov import _candidate_pairs


def _setup(N=600, D=2, B=64, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 18, (N, D))
    x = x[morton_order(x)]
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 2.0, 2.0])
    rows, cols = _candidate_pairs(x, None, hps[1:], 1.0, B, symmetric=True)
    off = rows < cols
    rows_f = np.concatenate([rows, cols[off]]).astype(np.int32)
    cols_f = np.concatenate([cols, rows[off]]).astype(np.int32)
    nb = -(-N // B)
    xb, mask, y_pad, ypad_mask, noise_pad = SL.make_padded_inputs(
        x, y, np.full(N, 1e-2), B, dtype=jnp.float64)
    Z = jax.random.rademacher(jax.random.PRNGKey(0), (nb * B, 32),
                              jnp.float64) * ypad_mask[:, None]
    args = (jnp.asarray(rows_f), jnp.asarray(cols_f), xb, mask, y_pad,
            ypad_mask, noise_pad, Z)
    return x, y, hps, nb, B, args


@pytest.mark.slow
def test_implicit_cg_gradient_matches_fd():
    """The custom-VJP (implicit-function-theorem) gradient must agree with
    finite differences — this is the scale path's training signal."""
    x, y, hps, nb, B, args = _setup()
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=150,
                             slq_degree=25, solver="slq")
    f = jax.jit(lml)
    vg = jax.jit(jax.value_and_grad(lml))
    h = jnp.asarray(hps)
    v, g = vg(h, *args)
    eps = 1e-6
    fd = np.array([(float(f(h.at[i].add(eps), *args)) - float(v)) / eps
                   for i in range(len(hps))])
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-4)


@pytest.mark.slow
def test_sparse_lml_matches_dense_oracle():
    """Value agreement with the exact dense LML (tight CG, many probes)."""
    x, y, hps, nb, B, args = _setup(N=400)
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=200,
                             slq_degree=30)
    val = float(jax.jit(lml)(jnp.asarray(hps), *args))
    # dense oracle
    K = np.asarray(wendland_anisotropic(x, x, hps))
    KV = K + np.diag(np.full(len(x), 1e-2))
    m = y.mean()
    alpha = np.linalg.solve(KV, y - m)
    exact = -0.5 * ((y - m) @ alpha + np.linalg.slogdet(KV)[1]
                    + len(x) * np.log(2 * np.pi))
    assert abs(val - exact) / abs(exact) < 0.01


@pytest.mark.slow
def test_bf16_solver_close_to_f32():
    x, y, hps, nb, B, args = _setup()
    lml32 = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=100,
                               slq_degree=20)
    lml16 = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=100,
                               slq_degree=20, solver_dtype=jnp.bfloat16)
    h = jnp.asarray(hps)
    v32 = float(jax.jit(lml32)(h, *args))
    v16 = float(jax.jit(lml16)(h, *args))
    assert abs(v32 - v16) / abs(v32) < 5e-3


@pytest.mark.slow
def test_sentinel_tiles_are_noops():
    """Bucket-padding sentinels (index == nb, zero tiles) must not move the
    value — the 'dynamic sparsity under jit' contract."""
    x, y, hps, nb, B, args = _setup(N=300, B=32)
    rj, cj, *rest = args
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=120,
                             slq_degree=20)
    v1 = float(jax.jit(lml)(jnp.asarray(hps), rj, cj, *rest))
    pad = 17
    rj2 = jnp.concatenate([rj, jnp.full(pad, nb, jnp.int32)])
    cj2 = jnp.concatenate([cj, jnp.full(pad, nb, jnp.int32)])
    v2 = float(jax.jit(lml)(jnp.asarray(hps), rj2, cj2, *rest))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)


@pytest.mark.slow
def test_mbcg_matches_dense_oracle():
    """The fused mBCG solver's value must agree with the exact dense LML —
    its logdet quadrature is degree cg_iters, preconditioned, so it should
    be at least as accurate as the separate-SLQ path."""
    x, y, hps, nb, B, args = _setup(N=400)
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=100,
                             slq_degree=1, solver="mbcg")
    val = float(jax.jit(lml)(jnp.asarray(hps), *args))
    K = np.asarray(wendland_anisotropic(x, x, hps))
    KV = K + np.diag(np.full(len(x), 1e-2))
    m = y.mean()
    alpha = np.linalg.solve(KV, y - m)
    exact = -0.5 * ((y - m) @ alpha + np.linalg.slogdet(KV)[1]
                    + len(x) * np.log(2 * np.pi))
    assert abs(val - exact) / abs(exact) < 0.01


@pytest.mark.slow
def test_mbcg_gradient_matches_exact_dense():
    """mBCG's stochastic-trace backward (probe-solve reuse) must agree with
    the exact dense gradient within the probe-noise floor."""
    x, y, hps, nb, B, args = _setup(N=400)
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=150,
                             slq_degree=1, solver="mbcg")
    v, g = jax.jit(jax.value_and_grad(lml))(jnp.asarray(hps), *args)

    def dense_lml(h):
        K = np.asarray(wendland_anisotropic(x, x, h))
        KV = K + np.diag(np.full(len(x), 1e-2))
        m = y.mean()
        a = np.linalg.solve(KV, y - m)
        return -0.5 * ((y - m) @ a + np.linalg.slogdet(KV)[1]
                       + len(x) * np.log(2 * np.pi))

    eps = 1e-6
    fd = np.array([(dense_lml(hps + eps * np.eye(len(hps))[i])
                    - dense_lml(hps - eps * np.eye(len(hps))[i])) / (2 * eps)
                   for i in range(len(hps))])
    # 32 probes: the trace estimator's own noise bounds the agreement
    np.testing.assert_allclose(np.asarray(g), fd, rtol=0.05)
    assert np.isfinite(float(v))


@pytest.mark.slow
def test_mbcg_sentinel_tiles_are_noops():
    x, y, hps, nb, B, args = _setup(N=300, B=32)
    rj, cj, *rest = args
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=120,
                             slq_degree=1, solver="mbcg")
    v1 = float(jax.jit(lml)(jnp.asarray(hps), rj, cj, *rest))
    pad = 17
    rj2 = jnp.concatenate([rj, jnp.full(pad, nb, jnp.int32)])
    cj2 = jnp.concatenate([cj, jnp.full(pad, nb, jnp.int32)])
    v2 = float(jax.jit(lml)(jnp.asarray(hps), rj2, cj2, *rest))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)


def test_mbcg_variance_contract():
    """with_variance returns the per-probe quadrature variance."""
    x, y, hps, nb, B, args = _setup(N=300, B=32)
    lml = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=80,
                             slq_degree=1, solver="mbcg", with_variance=True)
    v, var = jax.jit(lml)(jnp.asarray(hps), *args)
    assert np.isfinite(float(v)) and float(var) >= 0.0


@pytest.mark.slow
def test_precond_width_improves_convergence():
    """Width-2 preconditioner blocks (adjacent Morton neighbors factored
    exactly) beat block-Jacobi at a fixed small CG budget on a strongly
    coupled problem, and agree at a large budget."""
    import jax

    from fvgp_tpu.kernels import wendland_anisotropic
    from fvgp_tpu.ops.dense import cholesky_factor, cholesky_logdet, cholesky_solve
    from fvgp_tpu.ops.sparse_lml import make_padded_inputs, make_sparse_lml
    from fvgp_tpu.parallel.sharded_cov import _candidate_pairs

    n, B = 512, 32
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, (n, 1)), axis=0)
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 6.0])          # long length scale: dense-ish K
    noise = np.full(n, 1e-4)

    rows, cols = _candidate_pairs(x, None, hps[1:], 1.0, B, symmetric=True)
    off = rows < cols
    rows_f = np.concatenate([rows, cols[off]]).astype(np.int32)
    cols_f = np.concatenate([cols, rows[off]]).astype(np.int32)
    nb = -(-n // B)
    xb, mask, y_pad, ypad_mask, noise_pad = make_padded_inputs(
        x, y, noise, B, dtype=jnp.float64)
    Z = jax.random.rademacher(jax.random.PRNGKey(0), (nb * B, 32),
                              dtype=jnp.float64) * ypad_mask[:, None]
    args = (jnp.asarray(hps, jnp.float64), jnp.asarray(rows_f),
            jnp.asarray(cols_f), xb, mask, y_pad, ypad_mask, noise_pad, Z)

    # exact oracle
    K = np.asarray(wendland_anisotropic(jnp.asarray(x), jnp.asarray(x),
                                        jnp.asarray(hps, jnp.float64)))
    KV = jnp.asarray(K + np.diag(noise))
    L = cholesky_factor(KV)
    ym = jnp.asarray(y - y.mean())
    exact = float(-0.5 * (ym @ cholesky_solve(L, ym) + cholesky_logdet(L)
                          + n * np.log(2 * np.pi)))

    def err(width, iters):
        lml = make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=iters,
                              solver="mbcg", precond_width=width)
        return abs(float(jax.jit(lml)(*args)) - exact)

    e1 = err(1, 12)
    e2 = err(2, 12)
    e4 = err(4, 12)
    assert e2 < e1, (e2, e1)
    assert e4 < e1, (e4, e1)
    # converged: all widths agree with the oracle to SLQ noise
    assert err(2, 200) < abs(exact) * 5e-3


@pytest.mark.slow
def test_precond_width_slq_solver():
    """Regression: the slq solver's preconditioner apply must handle
    width-w Minv shapes (it hard-coded the width-1 reshape)."""
    import jax

    from fvgp_tpu.kernels import wendland_anisotropic
    from fvgp_tpu.ops.sparse_lml import make_padded_inputs, make_sparse_lml
    from fvgp_tpu.parallel.sharded_cov import _candidate_pairs

    n, B = 256, 32
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 10, (n, 1)), axis=0)
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 4.0])
    rows, cols = _candidate_pairs(x, None, hps[1:], 1.0, B, symmetric=True)
    off = rows < cols
    rows_f = np.concatenate([rows, cols[off]]).astype(np.int32)
    cols_f = np.concatenate([cols, rows[off]]).astype(np.int32)
    nb = -(-n // B)
    xb, mask, y_pad, ypad_mask, noise_pad = make_padded_inputs(
        x, y, np.full(n, 1e-3), B, dtype=jnp.float64)
    Z = jax.random.rademacher(jax.random.PRNGKey(0), (nb * B, 16),
                              dtype=jnp.float64) * ypad_mask[:, None]
    args = (jnp.asarray(hps, jnp.float64), jnp.asarray(rows_f),
            jnp.asarray(cols_f), xb, mask, y_pad, ypad_mask, noise_pad, Z)
    v1 = float(jax.jit(make_sparse_lml(
        wendland_anisotropic, nb, B, cg_iters=100, solver="slq",
        precond_width=1))(*args))
    v2 = float(jax.jit(make_sparse_lml(
        wendland_anisotropic, nb, B, cg_iters=100, solver="slq",
        precond_width=2))(*args))
    np.testing.assert_allclose(v2, v1, rtol=1e-6)


def test_default_solver_is_mbcg():
    """The public op's default must equal the production path (VERDICT r2
    weak #6): a new caller gets the fused mBCG solver, and the GP facade's
    sparse path resolves to the same default."""
    import inspect
    sig = inspect.signature(SL.make_sparse_lml)
    assert sig.parameters["solver"].default == "mbcg"
    # the facade default (gp_marginal_likelihood._sparse_lml_eval)
    import fvgp_tpu.models.gp_marginal_likelihood as gml
    src = inspect.getsource(gml.GPMarginalLikelihood._sparse_lml_eval)
    assert '"gp2Scale_solver", "mbcg"' in src


@pytest.mark.slow
def test_precond_width_engages_on_indivisible_block_counts():
    """gp2Scale_precond_width used to fall back silently whenever the block
    count was not divisible by the width (at N=1M, B=128 the flagship nb =
    7813 is prime — the documented arg never engaged).  The facade now pads
    the blocking to a multiple of n_dev * width, so the width factor builds
    without a fallback warning and the estimator stays consistent."""
    import warnings as _w
    from fvgp_tpu import GP
    rng = np.random.default_rng(3)
    N = 700                                     # 11 blocks of 64: indivisible
    x = rng.uniform(0, 12, (N, 2))
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 1.5, 1.5])

    def value(width):
        gp = GP(x, y, init_hyperparameters=hps.copy(),
                noise_variances=np.full(N, 1e-2), gp2Scale=True,
                args={"gp2Scale_block_size": 64, "sparse_cg_maxiter": 200,
                      "gp2Scale_precond_width": width,
                      "random_logdet_fixed_probes": 64})
        v, _ = gp.marginal_likelihood.log_likelihood_value_and_gradient(hps)
        return float(v)

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        v1, v2, v3 = value(1), value(2), value(3)
    assert not any("falling back to width-1" in str(r.message) for r in rec)
    # same solve, same probes; only the quadrature path differs — the
    # estimates must agree to probe-noise level
    assert abs(v2 - v1) / abs(v1) < 5e-3
    assert abs(v3 - v1) / abs(v1) < 5e-3


@pytest.mark.slow
def test_early_exit_matches_full_run():
    """cg_iters is a MAX: the while_loop exits at the cg_tol floor, and the
    result must match a tight-tolerance (full-length) run to well within
    the estimator's own accuracy.  The per-column freeze floor stays TIGHT
    even when the exit tolerance is loose — probe columns must keep
    iterating to the global exit so their Lanczos quadrature degree equals
    the exit iteration (per-column freezing at the loose floor measurably
    biased the logdet: dlml 2.8e-6 -> 1.2e-4 at the N=50k bench)."""
    x, y, hps, nb, B, args = _setup(N=500)
    h = jnp.asarray(hps)
    tight = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=200,
                               slq_degree=20, solver="mbcg", cg_tol=1e-8)
    loose = SL.make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=200,
                               slq_degree=20, solver="mbcg", cg_tol=1e-3)
    v_t, g_t = jax.jit(jax.value_and_grad(tight, has_aux=False))(h, *args)
    v_l, g_l = jax.jit(jax.value_and_grad(loose, has_aux=False))(h, *args)
    assert abs(float(v_l) - float(v_t)) / abs(float(v_t)) < 1e-4
    np.testing.assert_allclose(np.asarray(g_l), np.asarray(g_t), rtol=2e-2)


@pytest.mark.slow
def test_sparse_cg_tol_threads_through_facade():
    """The public args key sparse_cg_tol reaches the traced sparse LML."""
    from fvgp_tpu import GP
    rng = np.random.default_rng(5)
    N = 500
    x = rng.uniform(0, 10, (N, 2))
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 1.5, 1.5])

    def value(tol_args):
        gp = GP(x, y, init_hyperparameters=hps.copy(),
                noise_variances=np.full(N, 1e-2), gp2Scale=True,
                args={"gp2Scale_block_size": 64, "sparse_cg_maxiter": 200,
                      "random_logdet_fixed_probes": 32, **tol_args})
        v, g = gp.marginal_likelihood.log_likelihood_value_and_gradient(hps)
        return float(v), np.asarray(g)

    v_def, g_def = value({})
    v_loose, g_loose = value({"sparse_cg_tol": 1e-3})
    assert np.isfinite(v_loose) and np.all(np.isfinite(g_loose))
    assert abs(v_loose - v_def) / abs(v_def) < 1e-4


# ---------------------------------------------------------------------------
# wide-solve streaming SpMM (_spmv_scan) — the N~1M committed-solve matvec
# ---------------------------------------------------------------------------

def _block_schedule(nb, B, seed=0):
    """Row-sorted tridiagonal block schedule + dense oracle."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for r in range(nb):
        for c in (r - 1, r, r + 1):
            if 0 <= c < nb:
                rows.append(r)
                cols.append(c)
    rows = np.array(rows, np.int32)
    cols = np.array(cols, np.int32)
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    tiles = rng.standard_normal((len(rows), B, B))
    A = np.zeros((nb * B, nb * B))
    for t, (r, c) in enumerate(zip(rows, cols)):
        A[r * B:(r + 1) * B, c * B:(c + 1) * B] = tiles[t]
    return rows, cols, tiles, A


def test_spmv_scan_matches_dense_and_drops_sentinels():
    """_spmv_scan (the tile-streaming SpMM wide committed solves run at
    N~1M, where the flat per-tile product would be tens of GB) matches the
    dense product, and sentinel tiles (row == nb) contribute NOTHING even
    when they carry non-zero values."""
    nb, B = 6, 8
    rows, cols, tiles, A = _block_schedule(nb, B)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((nb * B, 5))
    out = np.asarray(SL._spmv_scan(jnp.asarray(rows), jnp.asarray(cols),
                                   jnp.asarray(tiles), jnp.asarray(X),
                                   nb, B))
    np.testing.assert_allclose(out, A @ X, rtol=1e-12, atol=1e-12)
    # sentinel padding: unclamped row/col == nb with POISON tile values
    pad = 2
    rows_p = np.concatenate([rows, np.full(pad, nb, np.int32)])
    cols_p = np.concatenate([cols, np.full(pad, nb, np.int32)])
    tiles_p = np.concatenate([tiles, np.full((pad, B, B), 1e6)])
    out_p = np.asarray(SL._spmv_scan(jnp.asarray(rows_p),
                                     jnp.asarray(cols_p),
                                     jnp.asarray(tiles_p), jnp.asarray(X),
                                     nb, B))
    np.testing.assert_allclose(out_p, A @ X, rtol=1e-12, atol=1e-12)


def test_spmv_scan_mv_dtype_cast():
    """mv_dtype=float32 streams the tiles and X through f32 (the bf16/f32
    solver regime) while returning X's dtype, to f32 accuracy."""
    nb, B = 4, 8
    rows, cols, tiles, A = _block_schedule(nb, B, seed=3)
    X = np.random.default_rng(2).standard_normal((nb * B, 3))
    out = np.asarray(SL._spmv_scan(jnp.asarray(rows), jnp.asarray(cols),
                                   jnp.asarray(tiles), jnp.asarray(X),
                                   nb, B, mv_dtype=jnp.float32))
    assert out.dtype == X.dtype
    np.testing.assert_allclose(out, A @ X, rtol=1e-5, atol=1e-5)


def test_committed_solver_wide_rhs_takes_scan_branch(monkeypatch):
    """Above the flat-SpMM byte budget the committed solve streams tiles
    through _spmv_scan; forcing the budget to zero must not change the
    solution."""
    import warnings as _w

    from fvgp_tpu import GP

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 30, (400, 2))
    y = np.sin(x[:, 0])
    kw = dict(init_hyperparameters=np.array([1.0, 1.5, 1.5]),
              gp2Scale=True, linalg_mode="sparseCG",
              args={"gp2Scale_block_size": 32, "sparse_cg_tol": 1e-10})
    rhs = rng.standard_normal((400, 6))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        gp_flat = GP(x, y, **kw)
        X_flat = np.asarray(gp_flat.kv.solve(rhs))
        monkeypatch.setattr(SL, "_SPMV_FLAT_BUDGET", 0)
        gp_scan = GP(x, y, **kw)
        X_scan = np.asarray(gp_scan.kv.solve(rhs))
    np.testing.assert_allclose(X_scan, X_flat, rtol=1e-8, atol=1e-10)


def test_mesh_spmv_divisibility_guards(eight_devices):
    """The row-partitioned / halo SpMM factories reject a block count that
    does not divide over the mesh, with actionable padding guidance."""
    from fvgp_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        SL._spmv_for(nb=9, B=8, mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        SL._spmv_for(nb=9, B=8, mesh=mesh, halo_S=4)

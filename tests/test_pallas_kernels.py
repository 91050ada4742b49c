"""Pallas kernels vs their XLA formulations (interpret mode on CPU)."""

import jax.numpy as jnp
import pytest
import numpy as np

from fvgp_tpu.kernels import default_matern_ard, wendland_anisotropic
from fvgp_tpu.ops.pallas_kernels import block_spmv, dense_covariance
from fvgp_tpu.parallel.block_sparse import BlockSparseMatrix


@pytest.mark.slow
def test_dense_covariance_matern(rng):
    x1 = rng.uniform(0, 5, (70, 3))
    x2 = rng.uniform(0, 5, (50, 3))
    hps = np.array([1.3, 0.8, 1.1, 2.0])
    K = np.asarray(dense_covariance(x1, x2, hps, kind="matern32", tile=32))
    K_ref = np.asarray(default_matern_ard(x1, x2, hps))
    np.testing.assert_allclose(K, K_ref, atol=1e-10)


def test_dense_covariance_wendland(rng):
    x1 = rng.uniform(0, 8, (60, 2))
    hps = np.array([0.7, 1.5, 1.5])
    K = np.asarray(dense_covariance(x1, x1, hps, kind="wendland", tile=32))
    K_ref = np.asarray(wendland_anisotropic(x1, x1, hps))
    np.testing.assert_allclose(K, K_ref, atol=1e-10)


def test_block_spmv_matches_dense(rng):
    B, nb = 16, 5
    n = nb * B - 7          # ragged logical size
    # row-major sorted tile list with gaps (rows 0,1,3 present; 2,4 absent)
    entries = [(0, 0), (0, 1), (1, 1), (1, 3), (3, 0), (3, 3)]
    tiles = rng.standard_normal((len(entries), B, B))
    rows = np.array([e[0] for e in entries], np.int32)
    cols = np.array([e[1] for e in entries], np.int32)
    bsm = BlockSparseMatrix(n, n, B, rows, cols, tiles)
    dense = np.asarray(bsm.to_dense())
    X = rng.standard_normal((n, 4))
    out = np.asarray(block_spmv(rows, cols, jnp.asarray(bsm.tiles), X, nb, B))
    np.testing.assert_allclose(out, dense @ X, atol=1e-10)


def test_block_spmv_with_sentinels(rng):
    """Sentinel-padded tile lists (rows == nb, zero tiles) must be no-ops."""
    B, nb = 8, 3
    n = nb * B
    entries = [(0, 0), (1, 1), (2, 2)]
    tiles = rng.standard_normal((3, B, B))
    rows = np.concatenate([[e[0] for e in entries], [nb, nb]]).astype(np.int32)
    cols = np.concatenate([[e[1] for e in entries], [nb, nb]]).astype(np.int32)
    tiles_p = np.concatenate([tiles, np.zeros((2, B, B))])
    bsm = BlockSparseMatrix(n, n, B, rows, cols, tiles_p)
    dense = np.asarray(bsm.to_dense())
    X = rng.standard_normal(n)
    out = np.asarray(block_spmv(rows, cols, jnp.asarray(tiles_p), X, nb, B))
    np.testing.assert_allclose(out, dense @ X, atol=1e-10)


@pytest.mark.slow
def test_chunked_spmm_matches_xla(rng):
    """The production VMEM-resident SpMM (interpret mode on CPU) matches
    the XLA segment-sum formulation, including sentinel tiles."""
    import jax

    from fvgp_tpu.ops.pallas_kernels import chunked_spmm, chunked_spmm_fits
    from fvgp_tpu.ops.sparse_lml import _spmv

    T, B, nb, k = 128, 16, 12, 5
    assert chunked_spmm_fits(T, nb, B, k, 4)
    rows = rng.integers(0, nb, T).astype(np.int32)
    cols = rng.integers(0, nb, T).astype(np.int32)
    tiles = rng.standard_normal((T, B, B))
    # sentinel contract: clamped indices with zero tiles
    tiles[-8:] = 0.0
    rows[-8:] = nb - 1
    cols[-8:] = nb - 1
    X = rng.standard_normal((nb * B, k))
    rows_j = jnp.asarray(rows); cols_j = jnp.asarray(cols)
    tiles_j = jnp.asarray(tiles, jnp.float32)
    X_j = jnp.asarray(X, jnp.float32)
    ref = np.asarray(_spmv(rows_j, cols_j, tiles_j, X_j, nb, B))
    got = np.asarray(chunked_spmm(rows_j, cols_j, tiles_j, X_j, nb, B))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # gradients: custom VJP vs XLA autodiff
    def loss_pallas(t, x):
        return jnp.sum(chunked_spmm(rows_j, cols_j, t, x, nb, B) ** 2)

    def loss_xla(t, x):
        return jnp.sum(_spmv(rows_j, cols_j, t, x, nb, B) ** 2)

    gp_t, gp_x = jax.grad(loss_pallas, argnums=(0, 1))(tiles_j, X_j)
    gx_t, gx_x = jax.grad(loss_xla, argnums=(0, 1))(tiles_j, X_j)
    np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gx_t),
                               atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gx_x),
                               atol=1e-3, rtol=1e-5)


def test_chunked_spmm_fits_bounds():
    from fvgp_tpu.ops.pallas_kernels import chunked_spmm_fits
    # bench shapes fit; the N=1M LML shapes do not (X too large for VMEM)
    assert chunked_spmm_fits(4096, 196, 256, 17, 2)
    assert not chunked_spmm_fits(219648, 7813, 128, 17, 2)
    # unpadded tile counts fall back
    assert not chunked_spmm_fits(100, 16, 64, 4, 4)


def test_chunked_spmm_fits_accounts_for_lane_padding():
    """VMEM windows pad the minor dim to 128 lanes: a k=1 matvec at the
    N=1M blocking (nb=7813) is a 512MB window and must be REJECTED (it
    used to pass on logical bytes and VMEM-OOM the posterior path), while
    the N=50k bench shapes (nb=196, k=17) must still be accepted."""
    from fvgp_tpu.ops.pallas_kernels import chunked_spmm_fits
    # N=1M posterior matvec: nb=7813, k=1 -> 2*7813*128*128*4 = 1 GB
    assert not chunked_spmm_fits(T=7813 - 7813 % 64, nb=7813, B=128, k=1,
                                 tile_itemsize=2)
    # N=50k bench: nb=196, k=17 (lane-padded to 128) ~ 26 MB -> fits
    assert chunked_spmm_fits(T=4096, nb=196, B=256, k=17, tile_itemsize=2)
    # tile-count divisibility still enforced
    assert not chunked_spmm_fits(T=100, nb=196, B=256, k=17)


# ---------------------------------------------------------------------------
# row-aligned fused SpMM (the committed-state wide-solve path)

def test_row_aligned_schedule_contract():
    from fvgp_tpu.ops.pallas_kernels import row_aligned_schedule

    rng = np.random.default_rng(0)
    nb, C = 9, 4
    pairs = sorted({(int(rng.integers(0, nb)), int(rng.integers(0, nb)))
                    for _ in range(30)})
    rows = np.array([p[0] for p in pairs], np.int32)
    cols = np.array([p[1] for p in pairs], np.int32)
    rows_p, cols_p, rowsc, n_chunks = row_aligned_schedule(
        rows, cols, nb, C=C, chunk_bucket=4)
    assert len(rows_p) == len(cols_p) == n_chunks * C
    # every real tile present exactly once
    live = cols_p < nb
    assert sorted(zip(rows_p[live].tolist(),
                      cols_p[live].tolist())) == pairs
    # alignment: every non-sentinel chunk covers exactly one row
    for s in range(n_chunks):
        rr = rows_p[s * C:(s + 1) * C]
        if rowsc[s] < nb:
            assert np.all(rr == rowsc[s])
        else:
            assert np.all(cols_p[s * C:(s + 1) * C] == nb)
    # sentinel chunks trail
    real = rowsc < nb
    assert not np.any(real[np.argmax(~real):]) or real.all()


def test_fused_spmv_scan_matches_dense():
    import jax.numpy as jnp

    from fvgp_tpu.ops.pallas_kernels import row_aligned_schedule
    from fvgp_tpu.ops.sparse_lml import _spmv_scan_fused

    rng = np.random.default_rng(1)
    nb, B, C = 6, 8, 4
    pairs = sorted({(int(rng.integers(0, nb)), int(rng.integers(0, nb)))
                    for _ in range(18)})
    rows = np.array([p[0] for p in pairs], np.int32)
    cols = np.array([p[1] for p in pairs], np.int32)
    rows_p, cols_p, rowsc, _ = row_aligned_schedule(rows, cols, nb, C=C,
                                                    chunk_bucket=4)
    tiles = np.zeros((len(rows_p), B, B), np.float32)
    A = np.zeros((nb * B, nb * B), np.float32)
    for t, (r, c) in enumerate(zip(rows_p, cols_p)):
        if c < nb:
            blk = rng.standard_normal((B, B)).astype(np.float32)
            tiles[t] = blk
            A[r * B:(r + 1) * B, c * B:(c + 1) * B] += blk
    X = rng.standard_normal((nb * B, 5)).astype(np.float32)
    out = np.asarray(_spmv_scan_fused(jnp.asarray(rowsc), jnp.asarray(cols_p),
                                      jnp.asarray(tiles), jnp.asarray(X),
                                      nb, B, C=C))
    np.testing.assert_allclose(out, A @ X, atol=1e-4)


@pytest.mark.slow
def test_fused_committed_solver_end_to_end_f32():
    """dtype=float32 engages the fused row-aligned path on CPU (interpret
    kernel); posteriors must match the dense oracle to f32 tolerance."""
    import warnings

    from fvgp_tpu import GP
    from fvgp_tpu.kernels import wendland_anisotropic

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 16, (1200, 3))
    y = np.sin(x[:, 0]) + 0.03 * rng.standard_normal(1200)
    hps = np.array([1.0, 2.0, 2.0, 2.0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gp = GP(x, y, init_hyperparameters=hps,
                noise_variances=np.full(1200, 1e-2),
                gp2Scale=True, linalg_mode="sparseCGpre",
                args={"gp2Scale_block_size": 64, "dtype": "float32",
                      "gp2Scale_posterior_budget": int(1.6e7)})
    xp = rng.uniform(0, 16, (30, 3))
    pv = gp.posterior_covariance(xp, variance_only=True)["v(x)"]
    pm = gp.posterior_mean(xp)["m(x)"]
    ctx = gp.kv._fast_solver_ctx
    assert ctx["rows"].shape != ctx["cols"].shape     # rowsc engaged
    K = np.asarray(wendland_anisotropic(x, x, hps)) + np.eye(1200) * 1e-2
    ks = np.asarray(wendland_anisotropic(x, xp, hps))
    kk = np.asarray(wendland_anisotropic(xp, xp, hps))
    mo = y.mean() + ks.T @ np.linalg.solve(K, y - y.mean())
    vo = np.diag(kk - ks.T @ np.linalg.solve(K, ks))
    np.testing.assert_allclose(pm, mo, atol=5e-4)
    np.testing.assert_allclose(pv, vo, atol=5e-4)

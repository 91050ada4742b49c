"""Native C++ host runtime vs numpy fallback — identical results required."""

import numpy as np
import pytest

from fvgp_tpu import native


def _numpy_morton(x):
    from fvgp_tpu.parallel.ordering import spread_bits
    x = np.asarray(x, dtype=np.float64)
    n, d = x.shape
    use = min(d, 8)
    lo = x.min(axis=0)
    span = np.maximum(x.max(axis=0) - lo, 1e-300)
    q = ((x[:, :use] - lo[:use]) / span[:use] * 65535.0).astype(np.uint64)
    code = np.zeros(n, dtype=np.uint64)
    for dim in range(use):
        code |= spread_bits(q[:, dim], use) << np.uint64(dim)
    return code


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_builds(lib):
    assert native.get_lib() is not None


def test_morton_codes_match_numpy(lib, rng):
    for d in (1, 2, 3, 5):
        x = rng.uniform(-3, 7, (500, d))
        np.testing.assert_array_equal(native.morton_codes(x), _numpy_morton(x))


def test_block_bounds_match_numpy(lib, rng):
    x = rng.uniform(0, 10, (337, 3))       # ragged last block
    lo, hi = native.block_bounds(x, 64)
    nb = -(-337 // 64)
    xp = np.full((nb * 64, 3), np.nan)
    xp[:337] = x
    xb = xp.reshape(nb, 64, 3)
    np.testing.assert_allclose(lo, np.nanmin(xb, axis=1), atol=0)
    np.testing.assert_allclose(hi, np.nanmax(xb, axis=1), atol=0)


def test_candidate_pairs_match_numpy(lib, rng):
    x = rng.uniform(0, 50, (800, 2))
    lo, hi = native.block_bounds(x, 64)
    r_n, c_n = native.candidate_pairs(lo, hi, 1.5)
    gap = np.maximum(lo[None, :, :] - hi[:, None, :],
                     lo[:, None, :] - hi[None, :, :])
    gap = np.maximum(gap, 0.0)
    keep = np.triu(np.sum(gap ** 2, axis=-1) <= 1.5 ** 2)
    rows, cols = np.nonzero(keep)
    np.testing.assert_array_equal(r_n, rows.astype(np.int32))
    np.testing.assert_array_equal(c_n, cols.astype(np.int32))


def test_structure_discovery_uses_native(lib, rng):
    """The sharded-cov structure path gives identical pairs through the
    native and numpy branches."""
    import fvgp_tpu.native as nat
    from fvgp_tpu.parallel.sharded_cov import _candidate_pairs
    x = rng.uniform(0, 60, (2000, 2))
    ls = np.array([1.5, 1.5])
    r1, c1 = _candidate_pairs(x, None, ls, 1.0, 128, True)
    saved = nat._LIB
    try:
        nat._LIB = None          # force the numpy fallback
        r2, c2 = _candidate_pairs(x, None, ls, 1.0, 128, True)
    finally:
        nat._LIB = saved
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)


def test_tile_live_native_matches_numpy():
    import fvgp_tpu.native as N
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 25, (1500, 3))
    B = 64
    nb = -(-len(x) // B)
    rows = np.repeat(np.arange(nb), nb).astype(np.int32)
    cols = np.tile(np.arange(nb), nb).astype(np.int32)
    got = N.tile_live(x, rows, cols, B, 1.0)
    # numpy oracle
    r2 = 1.0
    want = np.zeros(len(rows), bool)
    for t in range(len(rows)):
        a = x[rows[t] * B:(rows[t] + 1) * B]
        b = x[cols[t] * B:(cols[t] + 1) * B]
        d2 = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        want[t] = bool(np.any(d2 < r2))
    np.testing.assert_array_equal(got, want)
    # sentinels dead
    s = N.tile_live(x, np.array([nb], np.int32), np.array([0], np.int32),
                    B, 1.0)
    assert not s[0]


def test_tile_live_agrees_with_kernel_maxabs():
    """Geometric liveness == (max|wendland| > 0) for the compactly
    supported kernel family (the production filter contract)."""
    import jax.numpy as jnp
    import fvgp_tpu.native as N
    from fvgp_tpu.kernels import wendland_anisotropic
    from fvgp_tpu.ops.sparse_lml import make_padded_inputs, tile_maxabs
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 40, (800, 2))
    B = 32
    nb = -(-len(x) // B)
    hps = np.array([1.0, 1.3, 0.8])
    rows = np.repeat(np.arange(nb), nb).astype(np.int32)
    cols = np.tile(np.arange(nb), nb).astype(np.int32)
    geo = N.tile_live(x / hps[1:], rows, cols, B, 1.0)
    xb, mask, *_ = make_padded_inputs(x, np.zeros(len(x)),
                                      np.full(len(x), 1e-2), B,
                                      dtype=jnp.float64)
    mx = np.asarray(tile_maxabs(wendland_anisotropic, xb, mask,
                                jnp.asarray(rows), jnp.asarray(cols),
                                jnp.asarray(hps)))
    np.testing.assert_array_equal(geo, mx > 0)


@pytest.mark.slow
def test_gp2scale_end_to_end_without_native_toolchain(monkeypatch, rng):
    """Simulated missing C++ toolchain (ref tests monkeypatch missing
    ilupp/imate/torch, tests/test_fvgp.py:1431,:1480,:4878): with
    ``get_lib() -> None`` the whole gp2Scale path must run on the numpy
    fallbacks and agree with the dense kernel."""
    import jax.numpy as jnp
    import warnings
    from fvgp_tpu import GP
    from fvgp_tpu.kernels import wendland_anisotropic

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    assert native.get_lib() is None

    warnings.simplefilter("ignore")
    x = rng.uniform(0, 30, (400, 2))
    y = np.sin(x[:, 0])
    hps = np.array([1.0, 1.5, 1.5])
    gp = GP(x, y, init_hyperparameters=hps, gp2Scale=True,
            args={"gp2Scale_block_size": 64})
    Kd = np.asarray(gp.K.to_dense())
    xd = np.asarray(gp.x_data)
    np.testing.assert_allclose(
        Kd, np.asarray(wendland_anisotropic(xd, xd, hps)), atol=1e-12)
    assert np.isfinite(gp.log_likelihood())


def test_pallas_spmm_disabled_env_fallback(monkeypatch, rng):
    """FVGP_TPU_PALLAS_SPMM=0 must route the SpMM to the XLA formulation
    with identical results (the missing-accelerator-kernel analogue)."""
    import jax.numpy as jnp
    from fvgp_tpu.parallel.block_sparse import BlockSparseMatrix

    monkeypatch.setenv("FVGP_TPU_PALLAS_SPMM", "0")
    B = 16
    tiles = rng.standard_normal((4, B, B))
    rows = np.array([0, 0, 1, 1])
    cols = np.array([0, 1, 0, 1])
    bsm = BlockSparseMatrix(2 * B, 2 * B, B, rows, cols, tiles)
    X = rng.standard_normal((2 * B, 3))
    np.testing.assert_allclose(np.asarray(bsm.matmat(jnp.asarray(X))),
                               np.asarray(bsm.to_dense()) @ X, atol=1e-10)

"""GPkv policy/alias branches and GP facade parity surfaces.

Targets the mode auto-selection table, fingerprint/drift edges,
preconditioner reuse gates, and the facade's API-parity no-ops
(ref gp_kv.py:138-188, :216-337; ref gp.py:934-949, :2126-2134).
"""

import warnings

import numpy as np
import pytest

from fvgp_tpu import GP
from fvgp_tpu.models.gp_kv import GPkv, resolve_linalg_mode

warnings.simplefilter("ignore")


@pytest.fixture(scope="module")
def gp_small():
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 8, (30, 2))
    y = np.sin(x[:, 0])
    return GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]))


def test_resolve_linalg_mode_aliases():
    mode, args = resolve_linalg_mode("sparseCGpre_amg", {"k": 1})
    assert mode == "sparseCGpre"
    assert args["sparse_preconditioner_type"] == "amg"
    assert args["k"] == 1
    mode, args = resolve_linalg_mode("sparseMINRESpre_schwarz", None)
    assert mode == "sparseMINRESpre"
    assert args["sparse_preconditioner_type"] == "schwarz"
    with pytest.raises(Exception):
        resolve_linalg_mode("sparseCGpre_bogus", {})
    # non-string modes (custom [factor, solve, logdet] triples) pass through
    triple = [lambda a: a, lambda a, b: b, lambda a: 0.0]
    mode, args = resolve_linalg_mode(triple, {"z": 2})
    assert mode is triple and args == {"z": 2}
    mode, _ = resolve_linalg_mode("Chol", {})
    assert mode == "Chol"


def test_auto_mode_table(gp_small):
    kv = gp_small.kv
    # pinned mode always wins
    old = kv.linalg_mode
    try:
        kv.linalg_mode = "sparseMINRES"
        assert kv._auto_mode(10_000, 10_000) == "sparseMINRES"
    finally:
        kv.linalg_mode = old
    assert kv._auto_mode(10_000, 1_000) == "sparseLU"        # tiny fill
    assert kv._auto_mode(1_500, 1_500 * 1_500) == "Chol"     # small dense
    assert kv._auto_mode(100_000, 10_000_000) == "sparseCGpre"


def test_fingerprint_dense_and_drift(gp_small):
    kv = gp_small.kv
    A = np.eye(5) * 2.0
    fp = GPkv.matrix_fingerprint(A)
    assert fp[0] == (5, 5) and fp[2] == pytest.approx(10.0)
    assert GPkv.matrix_fingerprint(None) is None
    assert GPkv._fingerprint_drift(None, fp) == np.inf
    assert GPkv._fingerprint_drift(fp, None) == np.inf
    fp2 = GPkv.matrix_fingerprint(np.eye(6))
    assert GPkv._fingerprint_drift(fp, fp2) == np.inf        # shape change
    fp3 = GPkv.matrix_fingerprint(A * 1.01)
    assert 0.0 < GPkv._fingerprint_drift(fp, fp3) < 0.1


def test_preconditioner_build_failure_falls_back(monkeypatch):
    """A failing preconditioner build warns and solves unpreconditioned
    (ref gp_kv.py:339-353)."""
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 40, (300, 2))
    y = np.sin(x[:, 0])
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 2.0, 2.0]),
            linalg_mode="sparseCGpre",
            args={"gp2Scale_block_size": 32})
    import fvgp_tpu.models.gp_kv as kvmod

    def boom(KV, args=None):
        raise RuntimeError("synthetic preconditioner failure")

    monkeypatch.setattr(kvmod, "build_preconditioner_op", boom)
    gp.kv._reset_sparse_preconditioner()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        lml = gp.log_likelihood()
    assert np.isfinite(lml)
    assert any("Failed to build preconditioner" in str(w.message)
               for w in rec)
    assert "synthetic preconditioner failure" in \
        (gp.kv.Last_preconditioner_error or "")


def test_preconditioner_reuse_gates(gp_small):
    kv = gp_small.kv
    KV = np.asarray(gp_small.K) + np.diag(np.asarray(gp_small.V))
    assert not kv._can_reuse_sparse_preconditioner(KV, mode="Chol")
    kv._reset_sparse_preconditioner()
    assert not kv._can_reuse_sparse_preconditioner(KV, mode="sparseCGpre")


def test_facade_parity_surfaces(gp_small):
    gp = gp_small
    assert gp.dask_client is None
    assert gp.initialize_gp2Scale_dask_client(dask_client="x") == "x"
    pdf = gp.get_prior_pdf()
    assert pdf["prior covariance (K)"].shape == (30, 30)
    np.testing.assert_allclose(np.asarray(gp.m), np.asarray(gp.prior.m))
    np.testing.assert_allclose(np.asarray(gp.V), np.asarray(gp.likelihood.V))
    assert gp.noise_variances is None
    with pytest.raises(AssertionError):
        gp.log_likelihood(hyperparameters=[1.0, 2.0, 3.0])
    with pytest.raises(AssertionError):
        gp.test_log_likelihood_gradient(np.ones((3, 1)))


def test_init_hyperparameters_required_for_custom_kernel():
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 8, (10, 2))
    y = np.sin(x[:, 0])
    with pytest.raises(Exception):
        GP(x, y, kernel_function=lambda a, b, h: np.eye(len(a)))


def test_default_bounds_guards():
    rng = np.random.default_rng(6)
    # non-Euclidean: default bounds impossible
    xs = [("a", i) for i in range(8)]
    y = np.arange(8.0)

    def obj_kernel(x1, x2, h):
        return np.array([[h[0] * np.exp(-abs(a[1] - b[1]) / h[1])
                          for b in x2] for a in x1])

    gp = GP(xs, y, init_hyperparameters=np.array([1.0, 1.0]),
            kernel_function=obj_kernel)
    with pytest.raises(Exception):
        gp.train(method="local", max_iter=2)
    # Euclidean with a non-default hp count: default bounds impossible
    x = rng.uniform(0, 8, (12, 2))
    gp2 = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1.0, 1.0]),
             kernel_function=lambda a, b, h: np.asarray(
                 h[0] * np.exp(-np.sum((np.asarray(a)[:, None]
                                        - np.asarray(b)[None]) ** 2, -1)
                               / h[1])))
    with pytest.raises(Exception):
        gp2.train(method="local", max_iter=2)


def test_gp2Scale_async_guard():
    rng = np.random.default_rng(8)
    x = rng.uniform(0, 40, (200, 2))
    y = np.sin(x[:, 0])
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 2.0, 2.0]),
            gp2Scale=True, args={"gp2Scale_block_size": 32})
    bounds = np.array([[0.5, 2.0], [1.0, 4.0], [1.0, 4.0]])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gp.train(method="mcmc", hyperparameter_bounds=bounds, max_iter=20,
                 asynchronous=True)
    assert any("asynchronous" in str(w.message) for w in rec)
    assert np.all(np.isfinite(gp.hyperparameters))


def test_update_kv_rank_n_branches_all_dense_modes(monkeypatch):
    """update_gp_data(append=True) exercises the blocked rank-n trailing
    update of the factor (Chol/CholInv) and the explicit inverse (Inv);
    with measured noise the old block is unchanged, so the blocked update
    must ENGAGE and match a fresh build exactly; custom
    [factor, solve, logdet] modes refactor on update (ref gp_kv.py:462-508)."""
    import fvgp_tpu.models.gp_kv as gpkv_mod

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (40, 2))
    y = np.sin(3 * x[:, 0]) + 0.1 * x[:, 1]
    x2 = rng.uniform(0, 1, (10, 2))
    y2 = np.sin(3 * x2[:, 0]) + 0.1 * x2[:, 1]
    nv, nv2 = np.full(40, 1e-4), np.full(10, 1e-4)
    hps = np.array([1.0, 1.0, 1.0])

    calls = {"chol": 0, "inv": 0}
    real_up_chol = gpkv_mod.dops.update_chol_factor
    real_up_inv = gpkv_mod.dops.update_inv
    monkeypatch.setattr(gpkv_mod.dops, "update_chol_factor",
                        lambda *a: (calls.__setitem__("chol", calls["chol"] + 1),
                                    real_up_chol(*a))[1])
    monkeypatch.setattr(gpkv_mod.dops, "update_inv",
                        lambda *a: (calls.__setitem__("inv", calls["inv"] + 1),
                                    real_up_inv(*a))[1])

    # invariant: the rank-n updated state answers EXACTLY like a fresh
    # build on the combined data (measured noise -> old block unchanged)
    fresh = GP(np.vstack([x, x2]), np.concatenate([y, y2]),
               init_hyperparameters=hps, linalg_mode="Chol",
               noise_variances=np.concatenate([nv, nv2]))
    want = fresh.log_likelihood()
    for mode in ("Chol", "CholInv", "Inv"):
        gp = GP(x, y, init_hyperparameters=hps, linalg_mode=mode,
                noise_variances=nv)
        gp.update_gp_data(x2, y2, noise_variances_new=nv2,
                          append=True, rank_n_update=True)
        assert abs(gp.log_likelihood() - want) < 1e-7, mode
        v = gp.posterior_covariance(x2[:3], variance_only=True)["v(x)"]
        assert np.all(v >= -1e-10), mode
        # overwrite with the same size takes the same-size refresh branch
        gp.update_gp_data(np.vstack([x, x2]), np.concatenate([y, y2]),
                          noise_variances_new=np.concatenate([nv, nv2]),
                          append=False)
        assert abs(gp.log_likelihood() - want) < 1e-7, mode
    assert calls["chol"] == 2 and calls["inv"] == 1   # blocked paths engaged

    # custom [factor, solve, logdet]: update_KV refactors via mode[0]
    fcalls = {"factor": 0}

    def f_factor(KV):
        fcalls["factor"] += 1
        return np.asarray(KV)

    gp = GP(x, y, init_hyperparameters=hps, noise_variances=nv,
            linalg_mode=[f_factor,
                         lambda o, b: np.linalg.solve(o, np.asarray(b)),
                         lambda o: np.linalg.slogdet(o)[1]])
    n_before = fcalls["factor"]
    gp.update_gp_data(x2, y2, noise_variances_new=nv2,
                      append=True, rank_n_update=True)
    assert fcalls["factor"] > n_before
    assert abs(gp.log_likelihood() - want) < 1e-7


def test_update_kv_default_noise_drift_falls_back_to_refactor():
    """With DEFAULT noise, appending moves (0.01·mean|y|)² on the OLD
    diagonal too — the rank-n path must detect the drifted top-left block
    and refactor instead of extending the stale factor (which silently
    corrupted logdet by ~0.1 LML on a 40+10 append)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (40, 2))
    y = np.sin(3 * x[:, 0]) + 0.1 * x[:, 1]
    x2 = rng.uniform(0, 1, (10, 2))
    y2 = np.sin(3 * x2[:, 0]) + 0.1 * x2[:, 1]
    hps = np.array([1.0, 1.0, 1.0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fresh = GP(np.vstack([x, x2]), np.concatenate([y, y2]),
                   init_hyperparameters=hps, linalg_mode="Chol")
        want = fresh.log_likelihood()
        for mode in ("Chol", "Inv"):
            gp = GP(x, y, init_hyperparameters=hps, linalg_mode=mode)
            gp.update_gp_data(x2, y2, append=True, rank_n_update=True)
            assert abs(gp.log_likelihood() - want) < 1e-7, mode

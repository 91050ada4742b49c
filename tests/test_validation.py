"""Error-path and argument-validation contracts.

Mirrors the reference's validation test categories
(ref tests/test_fvgp.py:3492-3612 data/prior rejections, :3692-3945
training/property validation, :4002-4060 KV mode/format rejections,
:4209-4280 MCMC argument validation, :4116-4170 posterior warnings) —
the checks that keep user mistakes loud instead of silently wrong.
"""
import warnings

import numpy as np
import pytest

from fvgp_tpu import GP, fvGP
from fvgp_tpu.models.gp_kv import GPkv
from fvgp_tpu.models.gp_mcmc import gpMCMC


def _small(n=12, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = np.sin(x[:, 0] * 3.0) + 0.1 * rng.standard_normal(n)
    return x, y


# ----------------------------------------------------------------------
# GP facade constructor validation (ref gp.py argument checks)
# ----------------------------------------------------------------------
def test_gp_rejects_matrix_noise_variances_argument():
    x, y = _small()
    with pytest.raises(AssertionError, match="noise_variances"):
        GP(x, y, noise_variances=[0.1] * len(y))        # list, not ndarray


def test_gp_rejects_non_array_init_hyperparameters():
    x, y = _small()
    with pytest.raises(AssertionError, match="init_hyperparameters"):
        GP(x, y, init_hyperparameters=[1.0, 1.0, 1.0])


def test_gp_rejects_non_string_compute_device():
    x, y = _small()
    with pytest.raises(AssertionError, match="compute_device"):
        GP(x, y, compute_device=3)


def test_gp_rejects_non_callable_functions():
    x, y = _small()
    for kw in ("kernel_function", "noise_function", "prior_mean_function",
               "kernel_function_grad", "noise_function_grad",
               "prior_mean_function_grad"):
        with pytest.raises(AssertionError, match=kw):
            GP(x, y, **{kw: "not callable"})


def test_gp_rejects_mismatched_data_lengths():
    x, y = _small()
    with pytest.raises(AssertionError, match="same lengths"):
        GP(x, y[:-1])


def test_gp_custom_kernel_requires_init_hyperparameters():
    x, y = _small()
    k = lambda x1, x2, hps: np.exp(-np.sum((x1[:, None] - x2[None]) ** 2, -1)
                                   / hps[0])
    with pytest.raises(Exception, match="initial hyperparameters"):
        GP(x, y, kernel_function=k)


def test_gp_default_kernel_warns_and_initializes_ones():
    x, y = _small()
    with pytest.warns(UserWarning, match="vector of ones"):
        gp = GP(x, y)
    np.testing.assert_array_equal(gp.hyperparameters,
                                  np.ones(x.shape[1] + 1))


def test_gp_deprecated_get_hyperparameters_warns():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    with pytest.warns(DeprecationWarning, match="deprecated"):
        hps = gp.get_hyperparameters()
    np.testing.assert_array_equal(hps, gp.hyperparameters)


def test_set_hyperparameters_rejects_wrong_format():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    with pytest.raises(AssertionError, match="hyperparameters"):
        gp.set_hyperparameters([1.0, 1.0, 1.0])


# ----------------------------------------------------------------------
# update_gp_data validation (ref gp.py:591-641)
# ----------------------------------------------------------------------
def test_update_gp_data_rejects_bad_formats():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    x2, y2 = _small(6, seed=1)
    with pytest.raises(AssertionError, match="x_new"):
        gp.update_gp_data("not data", y2)
    with pytest.raises(AssertionError, match="x_data_new"):
        gp.update_gp_data(list(x2), y2)          # list → non-Euclidean path
    with pytest.raises(AssertionError, match="y_new"):
        gp.update_gp_data(x2, list(y2))
    with pytest.raises(AssertionError, match="noise_variances_new"):
        gp.update_gp_data(x2, y2, noise_variances_new=[0.1] * 6)
    with pytest.raises(AssertionError, match="same lengths"):
        gp.update_gp_data(x2, y2[:-1])


def test_update_gp_data_warns_on_rank_n_without_append():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    x2, y2 = _small(6, seed=1)
    with pytest.warns(UserWarning, match="rank_n_update"):
        gp.update_gp_data(x2, y2, append=False, rank_n_update=True)
    assert len(gp.y_data) == 6


def test_update_rejects_noise_mix():
    # measured-noise GP updated without noise (and vice versa) must raise
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3),
            noise_variances=np.full(len(y), 0.01))
    x2, y2 = _small(6, seed=1)
    with pytest.raises(Exception):
        gp.update_gp_data(x2, y2, append=True)      # missing noise
    gp2 = GP(x, y, init_hyperparameters=np.ones(3))
    with pytest.raises(Exception):
        gp2.update_gp_data(x2, y2, noise_variances_new=np.full(6, 0.01),
                           append=True)             # unexpected noise


# ----------------------------------------------------------------------
# GPdata shape/NaN validation (ref gp_data.py:26-78)
# ----------------------------------------------------------------------
def test_gp_data_rejects_bad_shapes():
    x, y = _small()
    with pytest.raises(AssertionError, match="x_data"):
        GP("not data", y)
    with pytest.raises(AssertionError, match="y_data"):
        GP(x, y.reshape(3, 4, 1))
    with pytest.raises(AssertionError, match="2-d"):
        GP(x[:, 0], y)                              # 1-d Euclidean x
    with pytest.raises(AssertionError, match="different lengths"):
        GP(x, y, noise_variances=np.full(len(y) - 1, 0.1))


def test_gp_data_rejects_nans():
    x, y = _small()
    y = y.copy()
    y[3] = np.nan
    with pytest.raises(Exception, match="NaN"):
        GP(x, y)


# ----------------------------------------------------------------------
# GPprior validation (ref gp_prior.py argument/arity checks)
# ----------------------------------------------------------------------
def test_prior_rejects_non_euclidean_without_kernel():
    x = [("a", 1), ("b", 2), ("c", 3)]
    y = np.array([0.1, 0.2, 0.3])
    with pytest.raises(Exception, match="non-Euclidean"):
        GP(x, y, init_hyperparameters=np.ones(2))


def test_prior_rejects_unsupported_kernel_arity():
    x, y = _small()
    k5 = lambda a, b, c, d, e: None
    with pytest.raises(Exception, match="kernel function signature"):
        GP(x, y, init_hyperparameters=np.ones(2), kernel_function=k5)


def test_prior_rejects_matrix_mean():
    x, y = _small()
    mean_matrix = lambda xx, hps: np.ones((len(xx), 2))
    with pytest.raises(Exception, match="non-1-d|mean"):
        GP(x, y, init_hyperparameters=np.ones(3),
           prior_mean_function=mean_matrix)


def test_prior_rejects_bad_gp2scale_distribution():
    x, y = _small(64)
    with pytest.raises(AssertionError, match="blockwise|rowwise"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            GP(x, y, init_hyperparameters=np.ones(3), gp2Scale=True,
               gp2Scale_distribution="columnwise")


# ----------------------------------------------------------------------
# training validation (ref gp.py train guards; gp_training.py)
# ----------------------------------------------------------------------
def test_train_rejects_unknown_method():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    bounds = np.array([[0.5, 2.0]] * 3)
    with pytest.raises(Exception):
        gp.train(hyperparameter_bounds=bounds, method="not-a-method",
                 max_iter=3)


def test_train_local_requires_gradient_for_user_objective():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    bounds = np.array([[0.5, 2.0]] * 3)
    with pytest.raises(Exception, match="gradient"):
        gp.train(hyperparameter_bounds=bounds, method="local",
                 objective_function=lambda h, gpobj: 0.0)


def test_train_default_bounds_refuse_custom_functions():
    x, y = _small()
    k = lambda x1, x2, hps: np.exp(
        -np.sum((x1[:, None] - x2[None]) ** 2, -1) / hps[0]) * hps[1]
    gp = GP(x, y, init_hyperparameters=np.ones(2), kernel_function=k)
    with pytest.raises(Exception, match="custom hyperparameter_bounds"):
        gp.train(max_iter=3)


def test_train_async_unsupported_method_warns_and_runs_sync():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    bounds = np.array([[0.5, 2.0]] * 3)
    with pytest.warns(UserWarning, match="[Aa]synchronous"):
        res = gp.train(hyperparameter_bounds=bounds, method="local",
                       asynchronous=True, max_iter=3)
    assert res is None or not hasattr(res, "get_latest")


def test_train_mcmc_warns_when_user_objective_supplied():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    bounds = np.array([[0.5, 2.0]] * 3)
    with pytest.warns(UserWarning, match="MCMC"):
        gp.train(hyperparameter_bounds=bounds, method="mcmc", max_iter=30,
                 objective_function=lambda h, gpobj: 0.0)


def test_stop_training_warns_when_nothing_runs():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    with pytest.warns(UserWarning, match="[Nn]o asynchronous"):
        gp.stop_training(None)


def test_out_of_bounds_init_hyperparameters_warn_and_redraw():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    bounds = np.array([[0.5, 2.0]] * 3)
    with pytest.warns(UserWarning, match="out of bounds"):
        gp.train(hyperparameter_bounds=bounds, method="local",
                 init_hyperparameters=np.array([9.0, 1.0, 1.0]), max_iter=3)
    assert np.all(gp.hyperparameters >= bounds[:, 0] - 1e-9)


# ----------------------------------------------------------------------
# GPkv mode / format rejections (ref gp_kv mode checks, addKV formats)
# ----------------------------------------------------------------------
def test_kv_rejects_unknown_mode():
    x, y = _small()
    with pytest.raises(Exception, match="No Mode|Unknown"):
        GP(x, y, init_hyperparameters=np.ones(3), linalg_mode="QR")


def test_kv_rejects_unknown_preconditioner_alias():
    x, y = _small()
    with pytest.raises(Exception, match="preconditioner"):
        GP(x, y, init_hyperparameters=np.ones(3),
           linalg_mode="sparseCGpre_magic")


def test_addkv_format_combinations():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6))
    K = A @ A.T + 6 * np.eye(6)
    v = np.full(6, 0.5)
    # dense + vector == dense + diag(vector)
    out_v = np.asarray(GPkv.addKV(K, v))
    np.testing.assert_allclose(out_v, K + np.diag(v), rtol=1e-6)
    # dense + dense
    out_m = np.asarray(GPkv.addKV(K, np.diag(v)))
    np.testing.assert_allclose(out_m, out_v, rtol=1e-6)
    # dense + scipy.sparse
    from scipy.sparse import diags
    out_s = np.asarray(GPkv.addKV(K, diags(v)))
    np.testing.assert_allclose(out_s, out_v, rtol=1e-6)


def test_addkv_rejects_bad_formats():
    K_rect = np.ones((4, 6))
    with pytest.raises(AssertionError, match="square"):
        GPkv.addKV(K_rect, np.ones(4))
    K = np.eye(4)
    with pytest.raises(Exception, match="K\\+V|format"):
        GPkv.addKV(K, np.ones((4, 4, 4)))


def test_addkv_block_sparse_requires_diagonal_vector():
    from fvgp_tpu.parallel.block_sparse import BlockSparseMatrix
    import jax.numpy as jnp
    B = 4
    tiles = jnp.stack([jnp.eye(B), jnp.eye(B)])
    bsm = BlockSparseMatrix(8, 8, B, np.array([0, 1]), np.array([0, 1]),
                            tiles)
    with pytest.raises(AssertionError, match="1-d"):
        GPkv.addKV(bsm, np.ones((8, 8)))
    out = GPkv.addKV(bsm, np.full(8, 0.25))
    np.testing.assert_allclose(np.asarray(out.to_dense()),
                               1.25 * np.eye(8), rtol=1e-6)


# ----------------------------------------------------------------------
# gpMCMC argument validation (ref gp_mcmc.py:96-181 contract)
# ----------------------------------------------------------------------
def test_mcmc_requires_bounds_or_prior():
    with pytest.raises(AssertionError, match="bounds|prior"):
        gpMCMC(lambda h, a: 0.0)


def test_mcmc_default_proposal_requires_bounds():
    with pytest.raises(AssertionError, match="bounds"):
        gpMCMC(lambda h, a: 0.0, prior_function=lambda t, b, a: 0.0,
               proposal_distributions="normal")


def test_mcmc_rejects_non_1d_x0():
    bounds = np.array([[0.0, 1.0], [0.0, 1.0]])
    mc = gpMCMC(lambda h, a: -np.sum(h ** 2), bounds=bounds)
    with pytest.raises(AssertionError, match="x0"):
        mc.run_mcmc(x0=np.ones((2, 2)), n_updates=5)


def test_mcmc_rejects_invalid_break_condition():
    bounds = np.array([[0.0, 1.0]])
    mc = gpMCMC(lambda h, a: -np.sum(h ** 2), bounds=bounds)
    with pytest.raises(Exception, match="break condition"):
        mc.run_mcmc(x0=np.array([0.5]), n_updates=5,
                    break_condition="whenever")


def test_mcmc_raises_on_nan_likelihood():
    bounds = np.array([[0.0, 1.0]])
    mc = gpMCMC(lambda h, a: np.nan, bounds=bounds)
    with pytest.raises(Exception, match="NaN"):
        mc.run_mcmc(x0=np.array([0.5]), n_updates=5)


def test_mcmc_accepts_hugely_favourable_proposal():
    # log-lik jump of +1e6 must not overflow the accept ratio
    bounds = np.array([[0.0, 1.0]])
    calls = {"n": 0}

    def loglik(h, a):
        calls["n"] += 1
        return 1e6 if calls["n"] > 1 else -1e6
    mc = gpMCMC(loglik, bounds=bounds)
    out = mc.run_mcmc(x0=np.array([0.5]), n_updates=5)
    assert np.isfinite(out["f(x)"]).all()


def _neg_sq_loglik(h, a):
    return -float(np.sum(h ** 2))


def test_mcmc_pickles_with_trace():
    import pickle
    bounds = np.array([[0.0, 1.0]])
    mc = gpMCMC(_neg_sq_loglik, bounds=bounds)
    mc.run_mcmc(x0=np.array([0.5]), n_updates=8)
    mc2 = pickle.loads(pickle.dumps(mc))
    assert mc2.mcmc_info["max f(x)"] == mc.mcmc_info["max f(x)"]


# ----------------------------------------------------------------------
# posterior warnings / shape contracts (ref gp_posterior edge paths)
# ----------------------------------------------------------------------
def test_posterior_rejects_bad_x_pred():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    with pytest.raises(AssertionError, match="x_pred"):
        gp.posterior_mean(x[0])                     # 1-d
    with pytest.raises(AssertionError, match="columns"):
        gp.posterior_mean(np.ones((3, 5)))          # wrong width


def test_kl_div_warns_on_negative_result():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    # force a negative intermediate by perturbing covariances
    mu = np.zeros(3)
    S = np.eye(3)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        val = gp.posterior.kl_div(mu, mu + 0.1, S, S * 0.5)
    assert val >= 0.0


def test_add_noise_warns_on_unusable_noise_format():
    x, y = _small()
    gp = GP(x, y, init_hyperparameters=np.ones(3),
            noise_function=lambda xx, hps: np.full(len(xx), 0.01))
    # a noise result outside the vector/matrix contract must warn, not crash
    gp.likelihood.calculate_V = lambda xx, hps: np.ones((3, 3, 3))
    with pytest.warns(UserWarning, match="[Nn]oise"):
        v, S = gp.posterior.add_noise(x[:3], np.ones(3), np.eye(3))
    np.testing.assert_array_equal(S, np.eye(3))


def test_multi_column_y_posterior_rejects_x_out():
    x, _ = _small()
    y2 = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 0])])
    gp = GP(x, y2, init_hyperparameters=np.ones(3))
    with pytest.raises(Exception, match="x_out"):
        gp.posterior_mean(x[:3], x_out=np.array([0, 1]))


def test_multi_column_y_posterior_mean_is_a_matrix():
    x, _ = _small()
    y2 = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 0])])
    gp = GP(x, y2, init_hyperparameters=np.ones(3))
    m = gp.posterior_mean(x[:5])["m(x)"]
    assert m.shape == (5, 2)


# ----------------------------------------------------------------------
# fvGP format rejections (ref fvgp.py validation)
# ----------------------------------------------------------------------
def test_fvgp_rejects_single_column_y():
    x, y = _small()
    with pytest.raises(Exception):
        fvGP(x, y)                                   # 1-d y on fvGP


@pytest.mark.slow
def test_fvgp_rejects_bad_update_formats():
    x, _ = _small()
    y2 = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 0])])
    gp = fvGP(x, y2, init_hyperparameters=np.ones(4))
    x2, _ = _small(4, seed=1)
    with pytest.raises(Exception):
        gp.update_gp_data(x2, np.ones(4), append=True)   # 1-d y_new
    # the fused internal data is unchanged (12 points x 2 tasks)
    assert len(gp.y_data) == y2.size


def test_proposal_distribution_public_normal_proposal():
    """normal_proposal_dist is public API (ref gp_mcmc.py:320): a direct
    call must draw a finite vector around the current position."""
    from fvgp_tpu import ProposalDistribution
    pd = ProposalDistribution(indices=[0, 1])
    np.random.seed(0)
    step = pd.normal_proposal_dist(np.array([1.0, -2.0]), None, pd)
    assert step.shape == (2,)
    assert np.all(np.isfinite(step))

"""Narrow branch/edge suites per module — data-format rejection, config
dtype plumbing, custom proposal/adapt callables, plan-builder guards.

The reference dedicates a large test section to exactly these branches
(ref tests/test_fvgp.py:3483 onward); this file is its per-module analogue.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from fvgp_tpu import GP, fvGP
from fvgp_tpu import config

warnings.simplefilter("ignore")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 8, (25, 2))
    y = np.sin(x[:, 0])
    return x, y


HPS3 = np.array([1.0, 1.0, 1.0])


# ---------------------------------------------------------------------------
# config dtype plumbing
# ---------------------------------------------------------------------------

def test_config_dtype_controls():
    base = config.linalg_dtype(None)
    try:
        config.set_linalg_dtype("float32")
        assert config.linalg_dtype(None) == jnp.dtype(jnp.float32)
    finally:
        config.set_linalg_dtype(None)
    assert config.linalg_dtype(None) == base
    assert config.linalg_dtype({"dtype": "float32"}) == jnp.dtype(jnp.float32)
    assert config.kernel_compute_dtype({"kernel_dtype": "bfloat16"}) \
        == jnp.dtype(jnp.bfloat16)
    assert config.kernel_compute_dtype({}) == config.linalg_dtype({})
    out = config.to_numpy(jnp.ones(3, jnp.float32))
    assert out.dtype == np.float64


# ---------------------------------------------------------------------------
# GPdata / GP constructor format rejection
# ---------------------------------------------------------------------------

def test_gp_data_format_rejection(data):
    x, y = data
    with pytest.raises(AssertionError):
        GP((1, 2, 3), np.zeros(3), init_hyperparameters=HPS3)
    with pytest.raises(AssertionError):
        GP(x, np.zeros((25, 2, 2)), init_hyperparameters=HPS3)
    with pytest.raises(AssertionError):
        GP(x, y, init_hyperparameters=HPS3,
           noise_variances=np.full((25, 1), 0.01))
    with pytest.raises(AssertionError):
        GP(x, y, init_hyperparameters=HPS3,
           noise_variances=np.full(7, 0.01))
    with pytest.raises(AssertionError):
        GP(x, y[:10], init_hyperparameters=HPS3)
    with pytest.raises(AssertionError):
        GP(x, y, init_hyperparameters=HPS3,
           noise_variances=np.full(25, -1.0))
    with pytest.raises(Exception):
        GP(x, y, init_hyperparameters=HPS3,
           noise_variances=np.full(25, 0.01),
           noise_function=lambda xx, h: np.full(len(xx), 0.01))


def test_gp_update_format_rejection(data):
    x, y = data
    gp = GP(x, y, init_hyperparameters=HPS3)
    with pytest.raises(AssertionError):
        gp.update_gp_data((1, 2), np.zeros(2))
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:3], [0.0, 0.0, 0.0])
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:3], np.zeros(3),
                          noise_variances_new=np.zeros((3, 1)))
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:3].ravel(), np.zeros(6))


# ---------------------------------------------------------------------------
# fvGP multi-task format rejection + pickling
# ---------------------------------------------------------------------------

def test_fvgp_format_rejection(data):
    x, _ = data
    y2 = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 0])])
    with pytest.raises(ValueError):
        fvGP(x, np.sin(x[:, 0]), init_hyperparameters=np.ones(4))
    with pytest.raises(AssertionError):
        fvGP(x, y2[:10], init_hyperparameters=np.ones(4))
    gp = fvGP(x, y2, init_hyperparameters=np.ones(4))
    with pytest.raises(AssertionError):
        gp.update_gp_data((1,), y2[:1])
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:2], [1.0, 2.0])
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:2], y2[:3])
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:2], y2[:2], append=True,
                          noise_variances_new=[0.1, 0.1])
    with pytest.raises(AssertionError):
        gp.update_gp_data(x[:2], y2[:2], append=False,
                          noise_variances_new=np.full((2, 3), 0.1))


def test_fvgp_pickle_roundtrip(data):
    import pickle
    x, _ = data
    y2 = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 0])])
    gp = fvGP(x, y2, init_hyperparameters=np.ones(4))
    clone = pickle.loads(pickle.dumps(gp))
    assert clone.output_num == 2
    xp = x[:4]
    np.testing.assert_allclose(clone.posterior_mean(xp)["m(x)"],
                               gp.posterior_mean(xp)["m(x)"], atol=1e-10)


# ---------------------------------------------------------------------------
# noise-model branches (gp_likelihood)
# ---------------------------------------------------------------------------

def test_noise_three_arg_and_user_grads(data):
    x, y = data

    def noise3(xx, h, args):
        assert args["lvl"] == 0.04
        return np.full(len(xx), args["lvl"])

    gph = GP(x, y, init_hyperparameters=HPS3, noise_function=noise3,
             args={"lvl": 0.04})
    gp2 = GP(x, y, init_hyperparameters=HPS3,
             noise_function=lambda xx, h: np.full(len(xx), 0.04))
    assert abs(gph.log_likelihood() - gp2.log_likelihood()) < 1e-8

    # hyperparameter-dependent noise, user gradient, both ram-economy modes
    hps4 = np.array([1.0, 1.0, 1.0, 0.05])

    def kern(x1, x2, h):
        x1, x2 = np.asarray(x1), np.asarray(x2)
        d2 = (((x1[:, None, :] - x2[None, :, :]) / h[1:3]) ** 2).sum(-1)
        return h[0] * np.exp(-0.5 * d2)

    def noise_h(xx, h):
        return np.full(len(xx), h[3] ** 2)

    def dn_dh_dir(xx, h, direction):
        out = np.zeros(len(xx))
        if direction == 3:
            out[:] = 2 * h[3]
        return out

    def dn_dh_full(xx, h):
        out = np.zeros((4, len(xx)))
        out[3, :] = 2 * h[3]
        return out

    for economy, grad in ((True, dn_dh_dir), (False, dn_dh_full)):
        gp = GP(x, y, init_hyperparameters=hps4, kernel_function=kern,
                noise_function=noise_h, noise_function_grad=grad,
                ram_economy=economy)
        fd, an = gp.test_log_likelihood_gradient(hps4, epsilon=1e-7)
        np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)

    # no user grad: FD fallback for the host noise callable
    gp_fd = GP(x, y, init_hyperparameters=hps4, kernel_function=kern,
               noise_function=noise_h)
    fd, an = gp_fd.test_log_likelihood_gradient(hps4, epsilon=1e-7)
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# mesh / partition guard rails
# ---------------------------------------------------------------------------

def test_mesh_and_partition_guards(monkeypatch):
    from fvgp_tpu.parallel import mesh as pmesh
    from fvgp_tpu.parallel.partition import (halo_plan, halo_plan_hier,
                                             partition_schedule)

    monkeypatch.setenv("FVGP_TPU_ASSUME_SLICES", "3")
    with pytest.raises(ValueError):
        pmesh.make_mesh(8)              # 3 does not divide 8
    monkeypatch.delenv("FVGP_TPU_ASSUME_SLICES")
    with pytest.raises(ValueError):
        pmesh.make_mesh_2d(3, 3)        # 9 devices from 8
    rows = np.array([0, 1, 2, 3], np.int32)
    cols = np.array([0, 1, 2, 3], np.int32)
    with pytest.raises(ValueError):
        partition_schedule(rows, cols, 8, 4, pad_to=0)
    rows_p, cols_p, _, _ = partition_schedule(rows, cols, 8, 4)
    with pytest.raises(ValueError):
        halo_plan(rows_p, cols_p, 7, 4)
    with pytest.raises(ValueError):
        halo_plan_hier(rows_p, cols_p, 7, 2, 2)
    with pytest.raises(ValueError):
        halo_plan_hier(rows_p, cols_p, 8, 1, 4)


# ---------------------------------------------------------------------------
# MCMC proposal/adapt wiring branches
# ---------------------------------------------------------------------------

def test_mcmc_custom_proposal_and_adapt(capsys):
    from fvgp_tpu.models.gp_mcmc import ProposalDistribution, gpMCMC

    def log_like(h, args):
        return -0.5 * float(np.sum((h - 1.0) ** 2))

    def prior(h, bounds, args):
        return 0.0 if np.all((h > -5) & (h < 5)) else -np.inf

    rng = np.random.default_rng(0)

    def custom_prop(x_block, hps, obj):
        return x_block + 0.3 * rng.standard_normal(len(x_block))

    calls = {"n": 0}

    def custom_adapt(step, sampler):
        calls["n"] += 1

    pd = ProposalDistribution(indices=[0, 1], proposal_dist=custom_prop,
                              adapt_callable=custom_adapt)
    mc = gpMCMC(log_like, prior_function=prior, proposal_distributions=[pd])
    out = mc.run_mcmc(x0=np.zeros(2), n_updates=300)
    assert np.isfinite(np.asarray(out["f(x)"])).all()
    assert calls["n"] > 0

    # string adapt other than "normal" is rejected
    with pytest.raises(Exception):
        ProposalDistribution(indices=[0, 1], proposal_dist=custom_prop,
                             adapt_callable="bogus")
    # no proposal at all is rejected
    with pytest.raises(Exception):
        ProposalDistribution(indices=[0, 1], proposal_dist=None)
    # "normal" without init_prop_Sigma warns but works
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        pdn = ProposalDistribution(indices=[0, 1])
        assert any("init_prop_Sigma" in str(w.message) for w in rec)
    mc2 = gpMCMC(log_like, prior_function=prior,
                 proposal_distributions=[pdn])
    out2 = mc2.run_mcmc(x0=np.zeros(2), n_updates=1500, info=True,
                        break_condition="default")
    assert np.isfinite(np.asarray(out2["f(x)"])).all()
    assert "iterations" in capsys.readouterr().out
    # invalid break-condition input is rejected
    with pytest.raises(Exception):
        mc2.run_mcmc(x0=np.zeros(2), n_updates=10, break_condition="bogus")
    with pytest.raises(AssertionError):
        mc2.run_mcmc(x0=[0.0, 0.0], n_updates=10)
    # bounds-free "normal" default is rejected; gpMCMC demands a prior source
    with pytest.raises(AssertionError):
        gpMCMC(log_like)
    with pytest.raises(AssertionError):
        gpMCMC(log_like, prior_function=prior)   # "normal" needs bounds


def test_kernel_dtype_arg_governs_dense_assembly():
    """args['kernel_dtype'] evaluates the dense kernel sweep in the
    requested dtype (cast back to the linalg dtype for the factorization);
    the LML moves only at that dtype's noise floor."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (30, 2))
    y = np.sin(3 * x[:, 0])
    hps = np.array([1.0, 1.0, 1.0])
    gp64 = GP(x, y, init_hyperparameters=hps)
    gp32 = GP(x, y, init_hyperparameters=hps,
              args={"kernel_dtype": "float32"})
    K32 = np.asarray(gp32.prior.K)
    K64 = np.asarray(gp64.prior.K)
    # values agree to f32 resolution but NOT to f64 (the cast engaged)
    assert np.abs(K32 - K64).max() < 1e-5
    assert np.abs(K32 - K64).max() > 0.0
    assert abs(gp32.log_likelihood() - gp64.log_likelihood()) < 1e-3

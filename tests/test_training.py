"""Training methods: every method must improve the LML and round-trip
through the facade; async methods must honor the polling contract
(ref tests/test_fvgp.py:429-527, :1295-1330)."""

import time
import warnings

import numpy as np
import pytest

from fvgp_tpu import GP, gpMCMC, ProposalDistribution

warnings.simplefilter("ignore")

BOUNDS = np.array([[0.01, 10.0], [0.1, 20.0], [0.1, 20.0]])


@pytest.fixture
def gp(small_data):
    x, y = small_data
    return GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]))


def test_train_local_improves_lml(gp):
    before = gp.log_likelihood()
    hps = gp.train(method="local", hyperparameter_bounds=BOUNDS, max_iter=100)
    assert gp.log_likelihood() > before
    np.testing.assert_array_equal(hps, gp.hyperparameters)


def test_train_global(gp):
    before = gp.log_likelihood()
    gp.train(method="global", hyperparameter_bounds=BOUNDS, pop_size=5,
             max_iter=15)
    assert gp.log_likelihood() > before


@pytest.mark.slow
def test_train_hgdl_multistart(gp):
    before = gp.log_likelihood()
    gp.train(method="hgdl", hyperparameter_bounds=BOUNDS, pop_size=4,
             max_iter=60)
    assert gp.log_likelihood() > before


def test_train_mcmc_sets_info(gp):
    gp.train(method="mcmc", hyperparameter_bounds=BOUNDS, max_iter=400)
    info = gp.mcmc_info
    assert "median(x)" in info and "MAP" in info and "x" in info
    assert info["x"].shape[1] == 3


def test_train_mcmc_parallel_chains(gp):
    """n_chains > 1 runs the vectorized sampler: one batched device call
    per step, chain traces pooled into mcmc_info."""
    gp.train(method="mcmc", hyperparameter_bounds=BOUNDS, max_iter=300,
             mcmc_args={"n_chains": 4})
    info = gp.mcmc_info
    assert info["n_chains"] == 4
    assert info["x_chains"].shape[1] == 4
    assert info["median(x)"].shape == (3,)
    # chains should find a better LML than the start
    assert info["max f(x)"] > -1e6


def test_train_adam(gp):
    before = gp.log_likelihood()
    gp.train(method="adam", hyperparameter_bounds=BOUNDS, max_iter=60)
    assert gp.log_likelihood() > before


@pytest.mark.slow
def test_train_bo_sets_info(gp):
    gp.train(method="bo", hyperparameter_bounds=BOUNDS, max_iter=14,
             bo_args={"n_init": 8, "patience": 4})
    info = gp.bo_info
    for key in ("x", "f(x)", "trace x", "trace f(x)", "n_evaluations",
                "ei history", "surrogate hyperparameters",
                "ard length scales", "sensitivity",
                "log-transformed dimensions", "stopping reason", "surrogate"):
        assert key in info, key
    assert info["n_evaluations"] <= 14


def test_train_user_callable(gp):
    target = np.array([0.5, 1.5, 2.5])

    def method(trainer):
        return target

    gp.train(method=method, hyperparameter_bounds=BOUNDS)
    np.testing.assert_array_equal(gp.hyperparameters, target)


def test_train_custom_objective(gp):
    """A user objective is minimized (ref gp.py:780-795)."""
    target = np.array([1.0, 2.0, 3.0])

    def obj(hps):
        return float(np.sum((hps - target) ** 2))

    def grad(hps):
        return 2.0 * (hps - target)

    gp.train(method="local", objective_function=obj,
             objective_function_gradient=grad,
             objective_function_hessian=lambda h: 2 * np.eye(3),
             hyperparameter_bounds=BOUNDS, max_iter=200, tolerance=1e-10)
    np.testing.assert_allclose(gp.hyperparameters, target, atol=1e-4)


@pytest.mark.parametrize("method", ["mcmc", "adam", "hgdl", "bo"])
@pytest.mark.slow
def test_async_training_polling(gp, method):
    """asynchronous=True returns a proxy with get_latest()/stop(); pulling
    hyperparameters into the GP mid-run must work (ref gp_actor)."""
    kwargs = {}
    if method == "bo":
        kwargs["bo_args"] = {"n_init": 5, "patience": 3}
    opt = gp.train(method=method, hyperparameter_bounds=BOUNDS,
                   max_iter=150 if method != "bo" else 10, pop_size=4,
                   asynchronous=True, **kwargs)
    deadline = time.time() + 60
    while time.time() < deadline:
        latest = opt.get_latest()
        if latest:
            break
        time.sleep(0.25)
    assert latest, f"async {method} never published a result"
    hps = gp.update_hyperparameters(opt)
    assert hps.shape == (3,)
    gp.stop_training(opt)
    gp.kill_client(opt)


def test_gpmcmc_standalone():
    """gpMCMC samples a known Gaussian (ref tests/test_fvgp.py:1247)."""
    target_mean = np.array([1.0, -2.0])

    def loglik(x, args):
        return -0.5 * np.sum((x - target_mean) ** 2 / 0.25)

    bounds = np.array([[-5.0, 5.0], [-5.0, 5.0]])
    mc = gpMCMC(loglik, bounds=bounds)
    info = mc.run_mcmc(x0=np.zeros(2), n_updates=3000)
    np.testing.assert_allclose(info["max x"], target_mean, atol=0.5)
    assert len(info["f(x)"]) > 100


def test_run_mcmc_vectorized_samples_gaussian_and_breaks():
    """The batched-proposal vectorized sampler (one Cholesky-based (C, H)
    draw per step, no per-chain host loop) still samples a known Gaussian,
    and the O(window) default break fires instead of running all steps."""
    from fvgp_tpu.models.gp_mcmc import run_mcmc_vectorized
    target = np.array([1.0, -2.0])

    def batch_loglik(X):
        return -0.5 * np.sum((X - target) ** 2 / 0.25, axis=1)

    bounds = np.array([[-5.0, 5.0], [-5.0, 5.0]])
    x0s = np.zeros((8, 2))
    info = run_mcmc_vectorized(batch_loglik, bounds, x0s, n_updates=4000,
                               break_condition="default", seed=3)
    assert info["n_chains"] == 8
    np.testing.assert_allclose(info["max x"], target, atol=0.5)
    np.testing.assert_allclose(info["mean(x)"], target, atol=0.6)
    # the stationarity break must fire well before the step budget
    assert info["x_chains"].shape[0] < 4000


def test_run_mcmc_vectorized_step_cost_flat_in_run_length():
    """Per-step host cost may not grow with the trace length (the old
    default break converted the full trace every step past 1000 — the
    run was quadratic in its own length)."""
    import time as _time
    from fvgp_tpu.models.gp_mcmc import run_mcmc_vectorized
    bounds = np.array([[-5.0, 5.0]] * 2)
    x0s = np.zeros((4, 2))
    rngs = {"calls": 0}

    def batch_loglik(X):
        rngs["calls"] += 1
        # noisy likelihood: the stationarity break never fires
        return np.random.standard_normal(len(X)) * 10.0

    t0 = _time.time()
    run_mcmc_vectorized(batch_loglik, bounds, x0s, n_updates=1500,
                        break_condition="default", seed=0)
    t_short = (_time.time() - t0) / 1500
    t0 = _time.time()
    run_mcmc_vectorized(batch_loglik, bounds, x0s, n_updates=6000,
                        break_condition="default", seed=0)
    t_long = (_time.time() - t0) / 6000
    # quadratic behavior made the 4x-longer run ~3-4x more expensive per
    # step; allow generous CI noise
    assert t_long < 3.0 * t_short + 1e-4


def test_gpmcmc_custom_proposal_blocks():
    """Per-block proposal distributions update disjoint index sets."""
    np.random.seed(123)   # the sampler draws from global numpy randomness

    def loglik(x, args):
        return -0.5 * np.sum(x ** 2)

    bounds = np.array([[-3.0, 3.0]] * 3)
    props = [ProposalDistribution(np.array([0, 1]),
                                  init_prop_Sigma=np.eye(2) * 0.25),
             ProposalDistribution(np.array([2]),
                                  init_prop_Sigma=np.eye(1) * 0.25)]
    mc = gpMCMC(loglik, bounds=bounds, proposal_distributions=props)
    info = mc.run_mcmc(x0=np.ones(3), n_updates=2500)
    assert abs(info["median(x)"]).max() < 1.5


def test_sequential_linalg_state_gate(gp):
    """Warm starts / precond reuse are forced off for non-mcmc methods and
    restored afterwards (ref gp_kv.py:30-85)."""
    from fvgp_tpu.models.gp_kv import sequential_linalg_state
    args = {"sparse_krylov_warm_start": True,
            "sparse_preconditioner_refresh_interval": 50}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        with sequential_linalg_state(args, "global"):
            assert args["sparse_krylov_warm_start"] is False
            assert args["sparse_preconditioner_refresh_interval"] == 1
        assert args["sparse_krylov_warm_start"] is True
        assert args["sparse_preconditioner_refresh_interval"] == 50
    assert any("disables sequential" in str(w.message) for w in rec)
    with sequential_linalg_state(args, "mcmc"):
        assert args["sparse_krylov_warm_start"] is True  # mcmc keeps it


def test_out_of_bounds_init_redrawn(gp):
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gp.train(method="local", hyperparameter_bounds=BOUNDS,
                 init_hyperparameters=np.array([100.0, 100.0, 100.0]),
                 max_iter=5)
    assert any("out of bounds" in str(w.message) for w in rec)


@pytest.mark.slow
def test_constraints_honored_global_and_hgdl(gp):
    """The reference forwards scipy-style constraints to DE and HGDL
    (ref gp_training.py:66-77, :131-138); here DE applies Deb's
    feasibility rules and the hgdl polish switches to SLSQP."""
    from scipy.optimize import NonlinearConstraint
    # constrain the signal variance below 0.5 — the unconstrained optimum
    # violates this on the fixture
    con = NonlinearConstraint(lambda h: h[0], 0.01, 0.5)
    hps_g = gp.train(method="global", hyperparameter_bounds=BOUNDS,
                     constraints=(con,), max_iter=15, pop_size=4)
    assert hps_g[0] <= 0.5 + 1e-8
    hps_h = gp.train(method="hgdl", hyperparameter_bounds=BOUNDS,
                     constraints=(con,), max_iter=30, pop_size=4)
    assert hps_h[0] <= 0.5 + 1e-6
    # dict-style constraints work too (ineq convention: fun >= 0)
    dcon = {"type": "ineq", "fun": lambda h: 0.5 - h[0]}
    hps_d = gp.train(method="global", hyperparameter_bounds=BOUNDS,
                     constraints=(dcon,), max_iter=10, pop_size=4)
    assert hps_d[0] <= 0.5 + 1e-8


def test_async_stop_before_first_optimum_terminates(gp):
    """stop() issued immediately must not strand the poller: the actor
    publishes the failure and is_done() flips (a raise in the daemon
    thread previously left is_done() False forever)."""
    opt = gp.train(method="hgdl", hyperparameter_bounds=BOUNDS,
                   max_iter=200, pop_size=4, asynchronous=True)
    gp.stop_training(opt)
    for _ in range(100):
        if opt.actor.is_done():
            break
        time.sleep(0.1)
    assert opt.actor.is_done()


def test_adam_chain_respects_small_max_iter(small_data):
    """max_iter < adam_chain_steps must not overshoot the step budget."""
    from fvgp_tpu.models.gp_training import GPtraining
    x, y = small_data
    gp2 = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]),
             args={"adam_chain_steps": 8})
    seen = []

    def fake_chain(theta, m, v, t, k, bounds):
        seen.append(k)
        return theta + 1e-6, m, v, np.zeros(k)

    gp2.trainer.train(
        objective_function=lambda h: 0.0,
        objective_function_gradient=lambda h: np.zeros(3),
        hyperparameter_bounds=BOUNDS,
        init_hyperparameters=np.array([1.0, 1.0, 1.0]),
        method="adam", max_iter=3, adam_chain_runner=fake_chain)
    assert sum(seen) <= 3


# ---------------------------------------------------------------------------
# training-layer narrow branches (dispatcher guards, async result parsing)
# ---------------------------------------------------------------------------

def test_train_start_outside_bounds():
    """Facade: out-of-bounds init is re-drawn with a warning (the reference
    contract); the trainer layer itself rejects it outright."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 8, (20, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([5.0, 5.0]))
    bounds = np.array([[0.1, 1.0], [0.1, 1.0]])   # excludes the start
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gp.train(method="local", hyperparameter_bounds=bounds, max_iter=3,
                 init_hyperparameters=np.array([5.0, 5.0]))
    assert any("out of bounds" in str(w.message) for w in rec)
    assert np.all(gp.hyperparameters >= bounds[:, 0] - 1e-12)
    assert np.all(gp.hyperparameters <= bounds[:, 1] + 1e-12)
    with pytest.raises(Exception):
        gp.trainer.train(
            objective_function=lambda h: 0.0,
            objective_function_gradient=lambda h: np.zeros(2),
            objective_function_hessian=lambda h: np.eye(2),
            hyperparameter_bounds=bounds,
            init_hyperparameters=np.array([5.0, 5.0]),
            method="local", pop_size=4, tolerance=1e-3, max_iter=2,
            mcmc_prior=None, mcmc_prop_distrs="normal", mcmc_args=None,
            bo_args=None, local_optimizer="L-BFGS-B",
            global_optimizer="genetic", constraints=(), info=False)


def test_update_hyperparameters_result_parsing():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 8, (15, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1.0, 1.0]))
    cur = gp.hyperparameters.copy()

    class Fake:
        def __init__(self, out):
            self.out = out

        def get_latest(self):
            if isinstance(self.out, Exception):
                raise self.out
            return self.out

    # raising poll: keep current
    np.testing.assert_array_equal(
        gp.update_hyperparameters(Fake(RuntimeError("down"))), cur)
    # empty optima: warn + keep current
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = gp.update_hyperparameters(Fake([]))
    np.testing.assert_array_equal(out, cur)
    assert any("empty optima" in str(w.message) for w in rec)
    target = np.array([2.0, 3.0])
    np.testing.assert_array_equal(
        gp.update_hyperparameters(Fake([{"x": target, "f(x)": 0.0}])), target)
    np.testing.assert_array_equal(
        gp.update_hyperparameters(Fake({"median(x)": target})), target)
    np.testing.assert_array_equal(
        gp.update_hyperparameters(Fake({"x": target})), target)
    with pytest.raises(Exception):
        gp.update_hyperparameters(Fake({"bogus": 1}))
    with pytest.raises(Exception):
        gp.update_hyperparameters(Fake("nonsense"))
    with pytest.raises(AssertionError):
        gp.update_hyperparameters(Fake({"x": np.ones((2, 2))}))


def test_stop_training_without_async_warns():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 8, (15, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1.0, 1.0]))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gp.stop_training(object())
    assert any("No asynchronous training" in str(w.message) for w in rec)


def test_async_method_guard():
    """Facade: async with an unsupported method warns and falls back to a
    synchronous run; the trainer layer rejects it outright."""
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 8, (15, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1.0, 1.0]))
    bounds = np.array([[0.5, 2.0], [0.5, 2.0]])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = gp.train(method="local", asynchronous=True,
                       hyperparameter_bounds=bounds, max_iter=3)
    assert any("not supported" in str(w.message) for w in rec)
    assert isinstance(out, np.ndarray)            # sync result, not an actor
    with pytest.raises(AssertionError):
        gp.trainer.train_async(
            objective_function=lambda h: 0.0,
            objective_function_gradient=lambda h: np.zeros(2),
            objective_function_hessian=lambda h: np.eye(2),
            hyperparameter_bounds=bounds,
            init_hyperparameters=np.array([1.0, 1.0]),
            method="local", pop_size=4, tolerance=1e-3, max_iter=2,
            mcmc_prior=None, mcmc_prop_distrs="normal", mcmc_args=None,
            bo_args=None, local_optimizer="L-BFGS-B",
            global_optimizer="genetic", constraints=(), info=False)


def test_global_with_eq_and_ineq_constraints():
    """DE with mixed constraint types takes the penalty path for both
    conventions (ineq fun >= 0; eq fun == 0)."""
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 8, (20, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1.0, 1.0]))
    bounds = np.array([[0.3, 3.0], [0.3, 3.0]])
    cons = ({"type": "ineq", "fun": lambda h: h[0] - 0.4},
            {"type": "eq", "fun": lambda h: 0.0 * h[1]})
    gp.train(method="global", hyperparameter_bounds=bounds, max_iter=4,
             pop_size=8, constraints=cons)
    assert np.all(gp.hyperparameters >= bounds[:, 0] - 1e-9)
    assert gp.hyperparameters[0] >= 0.4 - 1e-6


def test_mcmc_prior_override_and_in_bounds_guard():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 8, (20, 1))
    gp = GP(x, np.sin(x[:, 0]), init_hyperparameters=np.array([1.0, 1.0]))
    bounds = np.array([[0.5, 2.0], [0.5, 2.0]])
    seen = {"n": 0}

    def my_prior(theta, prior_bounds, args):
        seen["n"] += 1
        inside = np.all((theta >= prior_bounds[:, 0])
                        & (theta <= prior_bounds[:, 1]))
        return 0.0 if inside else -np.inf

    gp.train(method="mcmc", hyperparameter_bounds=bounds, max_iter=40,
             mcmc_prior=my_prior)
    assert seen["n"] > 0
    assert np.all(gp.hyperparameters >= bounds[:, 0] - 1e-12)
    from fvgp_tpu.models.gp_training import GPtraining
    with pytest.raises(AssertionError):
        GPtraining._in_bounds(np.ones(2), [[0, 1], [0, 1]])


def test_proposal_factors_degrade_on_indefinite_covariance():
    """_proposal_factors survives PSD-singular/indefinite adapted
    covariances (review finding: a LinAlgError here killed the whole
    multi-chain run; multivariate_normal degraded gracefully)."""
    from fvgp_tpu.models.gp_mcmc import _proposal_factors

    # a mildly indefinite chain is rescued by the jitter ladder, silently
    A = np.stack([np.eye(3), np.diag([1e6, 0.0, -1.0])])
    F = _proposal_factors(A)
    assert np.all(np.isfinite(F))
    got = F @ np.transpose(F, (0, 2, 1))
    np.testing.assert_allclose(got[1][0, 0], 1e6, rtol=1e-3)

    # a negative eigenvalue beyond the ladder's 1e-4·trace ceiling takes
    # the eigenvalue-clipped fallback with a warning instead of raising
    A = np.stack([np.eye(3), np.diag([1e6, 0.0, -200.0])])
    with pytest.warns(UserWarning, match="not positive definite"):
        F = _proposal_factors(A)
    got = F @ np.transpose(F, (0, 2, 1))
    np.testing.assert_allclose(got[0], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(got[1], np.diag([1e6, 0.0, 0.0]), atol=1e-6)
    assert np.all(np.isfinite(F))

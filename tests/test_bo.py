"""Behavioral contract tests for the BO hyperparameter trainer
(reference anchors: /root/reference/fvgp/gp_bo.py and the BO sections of
/root/reference/tests/test_fvgp.py — budget respect, non-finite
objectives, early stopping, log-scale transforms, noise plumbing,
sensitivity reporting, scale-free convergence)."""

import numpy as np
import pytest

from fvgp_tpu.models.gp_bo import (_SearchSpace, bayesian_optimize,
                                   default_initial_design_size)

BOUNDS2 = np.array([[-2.0, 2.0], [-2.0, 2.0]])
X0 = np.array([0.5, -0.5])


def quad(theta):
    return float(np.sum((theta - 0.3) ** 2))


@pytest.mark.slow
def test_bo_respects_evaluation_budget():
    budget = 9
    calls = []

    def obj(theta):
        calls.append(1)
        return quad(theta)

    theta, info = bayesian_optimize(obj, BOUNDS2, X0, max_iter=budget,
                                    bo_args={"n_init": 4, "patience": 0})
    assert len(calls) <= budget
    assert info["n_evaluations"] == len(calls)
    assert theta.shape == (2,)


@pytest.mark.slow
def test_bo_non_finite_evaluations_do_not_poison_the_run():
    def obj(theta):
        # a diverged solve / failed factorization shows up as nan/inf
        if theta[0] > 0.8:
            return np.nan
        return quad(theta)

    theta, info = bayesian_optimize(obj, BOUNDS2, X0, max_iter=10,
                                    bo_args={"n_init": 5})
    assert np.all(np.isfinite(theta))
    assert np.isfinite(info["f(x)"])
    # the stand-in penalty must never be recommended over a real value
    assert info["f(x)"] < 1e100


@pytest.mark.slow
def test_bo_objective_that_is_never_finite_still_returns():
    theta, info = bayesian_optimize(lambda t: np.inf, BOUNDS2, X0,
                                    max_iter=6, bo_args={"n_init": 3})
    assert np.all(np.isfinite(theta))
    assert info["n_evaluations"] <= 6


@pytest.mark.slow
def test_bo_stops_when_asked_between_iterations():
    seen = []

    def obj(theta):
        seen.append(1)
        return quad(theta)

    theta, info = bayesian_optimize(
        obj, BOUNDS2, X0, max_iter=50,
        bo_args={"n_init": 3}, early_stop=lambda: len(seen) >= 5)
    assert info["stopped early"]
    assert len(seen) <= 6          # at most one in-flight eval after the ask
    assert np.all(np.isfinite(theta))


def test_bo_stop_during_the_initial_design():
    theta, info = bayesian_optimize(
        quad, BOUNDS2, X0, max_iter=40,
        bo_args={"n_init": 10}, early_stop=lambda: True)
    assert info["stopped early"]
    assert info["n_evaluations"] == 0


@pytest.mark.slow
def test_bo_ei_tolerance_short_circuits():
    _, info = bayesian_optimize(
        quad, BOUNDS2, X0, max_iter=30,
        bo_args={"n_init": 6, "ei_tolerance": 1e12})
    assert info["stopping reason"] == "ei_tolerance"
    assert info["n_evaluations"] == 6      # design only, no BO evals


@pytest.mark.slow
def test_bo_warm_starts_from_the_initial_hyperparameters():
    first = {}

    def obj(theta):
        first.setdefault("theta", np.array(theta))
        return quad(theta)

    bayesian_optimize(obj, BOUNDS2, X0, max_iter=4, bo_args={"n_init": 3})
    np.testing.assert_allclose(first["theta"], X0, atol=1e-12)


@pytest.mark.slow
def test_bo_recovers_the_optimum_and_ranks_sensitivity():
    # tight curvature along dim 0, nearly flat along dim 1 — the
    # sensitivity ranking must notice
    def obj(theta):
        return float(100.0 * (theta[0] - 0.3) ** 2
                     + 0.01 * (theta[1] + 0.4) ** 2)

    theta, info = bayesian_optimize(obj, BOUNDS2, X0, max_iter=30,
                                    bo_args={"n_init": 8, "seed": 3})
    assert abs(theta[0] - 0.3) < 0.35
    sens = np.asarray(info["sensitivity"], dtype=float)
    assert sens.shape == (2,)
    assert sens[0] > sens[1]


@pytest.mark.slow
def test_bo_convergence_is_scale_free():
    # the LML can sit at -1e6; the patience test must act on relative
    # improvement, not absolute deltas
    def obj(theta):
        return float(-1.0e6 + np.sum((theta - 0.3) ** 2))

    _, info = bayesian_optimize(
        obj, BOUNDS2, X0, max_iter=60,
        bo_args={"n_init": 6, "patience": 3, "f_rtol": 1e-2, "x_tol": 2.0,
                 "seed": 1})
    assert info["stopping reason"] in ("converged", "ei_tolerance")
    assert info["n_evaluations"] < 60


@pytest.mark.slow
def test_bo_reported_noise_is_recorded_not_learned():
    _, info = bayesian_optimize(
        quad, BOUNDS2, X0, max_iter=8,
        bo_args={"n_init": 4, "noise_variance": 0.25})
    assert info["observation noise variance"] == pytest.approx(0.25)
    assert info["noise was learned"] is False


@pytest.mark.slow
def test_bo_noise_function_feeds_the_surrogate():
    reported = []

    def noise_fn(theta):
        reported.append(1)
        return 0.04

    _, info = bayesian_optimize(
        quad, BOUNDS2, X0, max_iter=8,
        bo_args={"n_init": 4, "noise_function": noise_fn})
    assert len(reported) == info["n_evaluations"]
    assert info["observation noise variance"] == pytest.approx(0.04)


@pytest.mark.slow
def test_bo_callback_sees_the_running_best():
    bests = []
    bayesian_optimize(quad, BOUNDS2, X0, max_iter=7,
                      bo_args={"n_init": 4},
                      callback=lambda th, f, i, st: bests.append(float(f)))
    assert len(bests) >= 4
    assert np.all(np.diff(bests) <= 1e-12)      # monotone non-increasing


@pytest.mark.slow
def test_bo_info_trace_is_complete_and_consistent():
    theta, info = bayesian_optimize(quad, BOUNDS2, X0, max_iter=8,
                                    bo_args={"n_init": 4})
    n = info["n_evaluations"]
    assert info["trace x"].shape == (n, 2)
    assert info["trace f(x)"].shape == (n,)
    assert info["trace u"].shape == (n, 2)
    assert np.min(info["trace f(x)"]) == pytest.approx(info["f(x)"])
    assert any(np.allclose(row, theta) for row in info["trace x"])


def test_search_space_log_transform_roundtrip():
    bounds = np.array([[1e-4, 1e2], [0.0, 5.0]])
    space = _SearchSpace.create(bounds)
    # the 6-decade dimension is auto log-scaled, the linear one is not
    assert bool(space.log_mask[0]) and not bool(space.log_mask[1])
    theta = np.array([[1e-3, 2.5], [10.0, 0.0]])
    u = space.encode(theta)
    assert np.all((u >= -1e-9) & (u <= 1 + 1e-9))
    np.testing.assert_allclose(space.decode(u), theta, rtol=1e-10)
    # explicit override wins over the heuristic
    forced = _SearchSpace.create(np.array([[1e-4, 1e2], [1.0, 5.0]]),
                                 log_scale=[False, False])
    assert not forced.log_mask.any()


def test_default_initial_design_size_clips_to_budget():
    assert default_initial_design_size(2, 100) == 6       # 2d+2
    assert default_initial_design_size(1, 100) == 5       # floor
    assert default_initial_design_size(8, 100) == 18
    assert default_initial_design_size(8, 4) == 4         # budget-clipped
    assert default_initial_design_size(8, 1) == 2         # hard minimum


@pytest.mark.slow
def test_bo_survives_nonfinite_objective_values():
    """One inf objective value must not kill the surrogate: the penalty is
    RELATIVE to observed values (an absolute ~1e302 stand-in overflowed
    np.var in the fit and stopped BO after the initial design)."""
    from fvgp_tpu.models.gp_bo import bayesian_optimize
    calls = {"n": 0}

    def obj(theta):
        calls["n"] += 1
        if calls["n"] == 2:
            return np.inf
        return float((theta[0] - 1.3) ** 2)

    x, info = bayesian_optimize(obj, np.array([[0.5, 3.0]]),
                                np.array([2.0]), max_iter=10)
    assert info["n_evaluations"] >= 8          # ran past the design phase
    assert info["stopping reason"] != "surrogate_fit_failed"
    assert np.isfinite(info["f(x)"])


@pytest.mark.slow
def test_bo_pinned_bound_stays_pinned():
    """A degenerate (lower == upper) dimension must decode to exactly the
    pinned value — not escape the box via the width-1 substitution."""
    from fvgp_tpu.models.gp_bo import bayesian_optimize
    seen = []

    def obj(theta):
        seen.append(theta.copy())
        return float((theta[0] - 1.0) ** 2)

    x, info = bayesian_optimize(obj, np.array([[0.5, 3.0], [0.7, 0.7]]),
                                np.array([1.0, 0.7]), max_iter=8)
    assert np.allclose([t[1] for t in seen], 0.7)
    assert np.isclose(x[1], 0.7)


def test_bo_tiny_budget_does_not_overflow_log():
    from fvgp_tpu.models.gp_bo import bayesian_optimize
    x, info = bayesian_optimize(lambda t: float(t[0] ** 2),
                                np.array([[-1.0, 1.0]]),
                                np.array([0.5]), max_iter=1)
    assert np.isfinite(info["f(x)"])


def test_mcmc_rejects_nan_likelihood_proposals():
    """A NaN acceptance exponent must REJECT (the 1.1 overflow branch used
    to auto-accept it, poisoning MAP/mean with NaN)."""
    from fvgp_tpu import gpMCMC
    rng = np.random.default_rng(0)

    def ll(x, args):
        if x[0] > 1.0:
            return -np.inf          # forbidden half-space
        return -float(np.sum(x ** 2))

    s = gpMCMC(ll, bounds=np.array([[-2.0, 2.0]]))
    # start AT the forbidden edge so -inf minus -inf NaNs appear
    out = s.run_mcmc(x0=np.array([1.5]), n_updates=300, break_condition=None)
    assert np.isfinite(out["max f(x)"])
    assert np.all(np.isfinite(out["median(x)"]))

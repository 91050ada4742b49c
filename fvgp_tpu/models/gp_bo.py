"""Bayesian-optimization hyperparameter trainer
(parity target: /root/reference/fvgp/gp_bo.py).

``method='bo'`` exists for the expensive / noisy / gradient-free LML regime
(stochastic-Lanczos logdet + truncated CG), where repeated evaluations of the
same hyperparameters disagree.  Contract preserved from the reference:
per-dimension log/linear transform to the unit cube, Sobol initial design
with warm start, inner GP surrogate (Matérn-5/2 ARD + diagonal-quadratic
polynomial mean + known or learned homoscedastic noise), noisy-EI
acquisition, multi-start acquisition maximization, scale-free patience
convergence, noise-aware recommendation, Laplace theta-posterior and
curvature sensitivity, and the ``bo_info`` dict keys.

TPU-first redesign: the surrogate's kernel/mean/noise are jnp functions, so
its type-II ML training runs on the fused jitted ``value_and_grad`` — none
of the reference's hand-derived kernel gradients (gp_bo.py:132-210) exist
here.  The noisy-EI acquisition value *and* gradient are one jitted
``jax.value_and_grad`` program over the surrogate's stored state, and the
Laplace curvature is an exact ``jax.hessian`` instead of a 4-point stencil.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc

from ..kernels import get_anisotropic_distance_matrix, matern_kernel_diff2

__all__ = ["bayesian_optimize", "default_initial_design_size"]


def default_initial_design_size(dim, max_iter):
    """Sobol design size: ~2(d+1) clipped into [5, 10d] and the budget
    (ref gp_bo.py:104-112)."""
    n_init = min(max(2 * (dim + 1), 5), max(10 * dim, 5))
    return max(2, min(n_init, max_iter))


class _SearchTransform:
    """Per-dimension log/affine map onto the unit cube
    (ref gp_bo.py:45-98): log where bounds are strictly positive (scale-like
    hyperparameters), identity elsewhere; overridable via ``log_scale``."""

    def __init__(self, bounds, log_scale=None):
        bounds = np.asarray(bounds, dtype=float)
        positive = (bounds[:, 0] > 0.0) & (bounds[:, 1] > 0.0)
        if log_scale is None:
            self.log_mask = positive
        else:
            req = np.broadcast_to(np.asarray(log_scale, dtype=bool),
                                  (len(bounds),)).copy()
            impossible = req & ~positive
            if np.any(impossible):
                warnings.warn(
                    f"log_scale requested for hyperparameter(s) "
                    f"{list(np.flatnonzero(impossible))} whose bounds are not "
                    f"strictly positive; searched linearly instead.")
            self.log_mask = req & positive
        lo = np.where(self.log_mask,
                      np.log(np.where(self.log_mask, bounds[:, 0], 1.0)),
                      bounds[:, 0])
        hi = np.where(self.log_mask,
                      np.log(np.where(self.log_mask, bounds[:, 1], 1.0)),
                      bounds[:, 1])
        self.lo, self.hi = lo, hi
        self.span = np.where(hi > lo, hi - lo, 1.0)
        self.dim = len(bounds)

    def to_unit(self, theta):
        theta = np.atleast_2d(np.asarray(theta, dtype=float))
        w = np.where(self.log_mask, np.log(np.clip(theta, 1e-300, None)), theta)
        return np.clip((w - self.lo) / self.span, 0.0, 1.0)

    def from_unit(self, u):
        u = np.atleast_2d(np.asarray(u, dtype=float))
        w = self.lo + np.clip(u, 0.0, 1.0) * self.span
        return np.where(self.log_mask, np.exp(w), w)


# ---------------------------------------------------------------------------
# surrogate model pieces (all jnp -> traced, autodiff-trained)
# ---------------------------------------------------------------------------

def _surrogate_kernel(x1, x2, hps):
    """Matérn-5/2 ARD: hps[0] signal variance, hps[1:1+D] length scales
    (ref gp_bo.py:115-126).  jnp, so the surrogate trains on jax.grad."""
    d = get_anisotropic_distance_matrix(x1, x2, hps[1:1 + x1.shape[1]])
    return hps[0] * matern_kernel_diff2(d, 1.0)


def _make_quadratic_mean(coef, dim):
    coef = jnp.asarray(coef)

    def mean_f(x, hps):
        x = jnp.atleast_2d(x)
        feats = jnp.concatenate(
            [jnp.ones((x.shape[0], 1), x.dtype), x, x ** 2], axis=1)
        return feats @ coef

    mean_f.coefficients = np.asarray(coef)
    return mean_f


def _fit_quadratic_coefficients(u_data, y_data, dim):
    """Diagonal quadratic (1+2d coefficients) absorbing the global bowl of
    the likelihood surface; None with too little data (ref gp_bo.py:265-296)."""
    n_coef = 1 + 2 * dim
    if len(u_data) < 2 * n_coef:
        return None
    design = np.hstack([np.ones((len(u_data), 1)), u_data, u_data ** 2])
    try:
        coef, *_ = np.linalg.lstsq(design, y_data, rcond=None)
    except np.linalg.LinAlgError:
        return None
    if not np.all(np.isfinite(coef)):
        return None
    return coef


def _make_learned_noise(dim):
    def noise_f(x, hps):
        return jnp.full((x.shape[0],), jnp.maximum(hps[dim + 1], 1e-12))
    return noise_f


def _fit_surrogate(u_data, y_data, v_data, dim, train_max_iter):
    """Inner exact GP on the evaluated points (ref gp_bo.py:306-394).
    CholInv mode so the acquisition's variance_only einsum fast path is
    available; autodiff supplies every gradient."""
    from .gp import GP

    coef = _fit_quadratic_coefficients(u_data, y_data, dim)
    mean_f = _make_quadratic_mean(coef, dim) if coef is not None else None
    if mean_f is not None:
        residual = y_data - np.asarray(mean_f(u_data, None))
    else:
        residual = y_data - np.mean(y_data)
    scale = float(np.var(residual))
    if not np.isfinite(scale) or scale <= 0.0:
        scale = float(np.var(y_data)) or 1.0

    init = np.concatenate([[scale], np.full(dim, 0.3)])
    bounds = np.vstack([[1e-4 * scale + 1e-12, 1e2 * scale + 1e-9],
                        np.tile([1e-2, 2.0], (dim, 1))])
    # nugget against near-duplicate design rows (a converged BO proposes
    # points a whisker apart; ref gp_bo.py:342-356 documents the calibration)
    nugget = max(1e-7 * scale, 1e-12)

    kwargs = dict(kernel_function=_surrogate_kernel)
    if v_data is not None:
        kwargs["noise_variances"] = np.maximum(np.asarray(v_data, dtype=float),
                                               nugget)
    else:
        init = np.concatenate([init, [max(1e-4 * scale, nugget)]])
        bounds = np.vstack([bounds, [nugget, max(scale, 10.0 * nugget)]])
        kwargs["noise_function"] = _make_learned_noise(dim)
    kwargs["init_hyperparameters"] = init
    if mean_f is not None:
        kwargs["prior_mean_function"] = mean_f

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gp = GP(u_data, y_data, linalg_mode="CholInv", **kwargs)
        gp.train(hyperparameter_bounds=bounds, method="local",
                 max_iter=train_max_iter)
    gp._bo_mean_function = mean_f
    gp._bo_learned_noise = (None if v_data is not None
                            else float(gp.hyperparameters[dim + 1]))
    return gp


# ---------------------------------------------------------------------------
# acquisition: noisy expected improvement as one jitted program
# ---------------------------------------------------------------------------

def _make_acquisition(gp, y_best_samples, dim):
    """Build (batched NEI values, NEI value_and_grad, posterior mean fn) as
    jitted closures over the surrogate's committed state.

    Replaces the reference's hand-derived dEI/dx (gp_bo.py:441-488) with
    ``jax.value_and_grad`` through the posterior algebra — exact, and one
    compiled program instead of five host matvecs.
    """
    x_data = jnp.asarray(np.asarray(gp.x_data, dtype=float))
    hps = jnp.asarray(np.asarray(gp.hyperparameters, dtype=float))
    kvinv_y = jnp.asarray(gp.kv.KVinvY)[:, 0]
    KVinv = jnp.asarray(gp.kv.KVinv)
    mean_f = getattr(gp, "_bo_mean_function", None)
    coef = jnp.asarray(mean_f.coefficients) if mean_f is not None else None
    ybs = jnp.asarray(y_best_samples)
    floor = 1e-10 * max(float(hps[0]), 1e-300)

    def post_mean_var(u):
        k = _surrogate_kernel(x_data, u[None, :], hps)[:, 0]
        if coef is not None:
            feats = jnp.concatenate([jnp.ones((1,), u.dtype), u, u ** 2])
            prior = feats @ coef
        else:
            prior = jnp.mean(jnp.asarray(np.asarray(gp.y_data))[:, 0])
        mean = prior + k @ kvinv_y
        var = hps[0] - k @ (KVinv @ k)
        return mean, jnp.maximum(var, floor)

    def nei(u):
        mean, var = post_mean_var(u)
        std = jnp.sqrt(var)
        imp = mean - ybs
        z = imp / std
        cdf = jax.scipy.stats.norm.cdf(z)
        pdf = jax.scipy.stats.norm.pdf(z)
        return jnp.maximum(jnp.mean(imp * cdf + std * pdf), 0.0)

    nei_batch = jax.jit(jax.vmap(nei))
    nei_vg = jax.jit(jax.value_and_grad(nei))
    post_mean = jax.jit(lambda u: post_mean_var(u)[0])
    return nei_batch, nei_vg, post_mean


def _maximize_acquisition(nei_batch, nei_vg, dim, rng, n_restarts, n_raw):
    """Random pre-screen (one batched device call) + multi-start L-BFGS-B on
    the exact jitted gradient (ref gp_bo.py:491-523)."""
    from scipy.optimize import minimize

    raw = rng.random((n_raw, dim))
    vals = np.asarray(nei_batch(jnp.asarray(raw)))
    starts = raw[np.argsort(-vals)[:n_restarts]]
    best_u, best_v = starts[0], float(vals.max())

    def objective(z):
        v, g = nei_vg(jnp.asarray(z))
        return -float(v), -np.asarray(g, dtype=np.float64)

    for u0 in starts:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = minimize(objective, u0, jac=True, method="L-BFGS-B",
                           bounds=[(0.0, 1.0)] * dim)
        if res.success and -res.fun > best_v:
            best_v, best_u = -float(res.fun), np.clip(res.x, 0.0, 1.0)
    return best_u, best_v


def _laplace_posterior(post_mean, u_best, tf):
    """Laplace theta-posterior from the surrogate curvature
    (ref gp_bo.py:397-435), via exact jax.hessian instead of an FD stencil."""
    neg_mean = lambda u: -post_mean(u)                      # noqa: E731
    hess = np.asarray(jax.hessian(neg_mean)(jnp.asarray(u_best, dtype=jnp.float64)))
    jac = np.diag(1.0 / tf.span)
    hess_w = jac @ hess @ jac
    hess_w = 0.5 * (hess_w + hess_w.T)
    eig = np.linalg.eigvalsh(hess_w)
    if not np.all(np.isfinite(hess_w)) or np.any(eig <= 0.0):
        return None, hess_w
    try:
        return np.linalg.inv(hess_w), hess_w
    except np.linalg.LinAlgError:
        return None, hess_w


# ---------------------------------------------------------------------------
# the optimizer
# ---------------------------------------------------------------------------

def bayesian_optimize(objective_function, hyperparameter_bounds,
                      init_hyperparameters, max_iter=50, bo_args=None,
                      info=False, callback=None, early_stop=None):
    """Minimize ``objective_function`` over ``hyperparameter_bounds`` by
    Bayesian optimization; returns (theta, bo_info)
    (ref gp_bo.py:529-851; bo_info keys preserved)."""
    a = dict(bo_args or {})
    # async-actor plumbing
    if callback is None and "progress_callback" in a:
        pc = a.pop("progress_callback")
        callback = lambda th, f, i, st: pc(th, f)            # noqa: E731
    if early_stop is None and "stop_requested" in a:
        early_stop = a.pop("stop_requested")

    bounds = np.asarray(hyperparameter_bounds, dtype=float)
    dim = len(bounds)
    tf = _SearchTransform(bounds, log_scale=a.get("log_scale", None))
    rng = np.random.default_rng(a.get("seed", 0))

    n_init = (int(a["n_init"]) if "n_init" in a
              else default_initial_design_size(dim, max_iter))
    n_init = max(2, min(n_init, max_iter))
    n_restarts = int(a.get("n_restarts", 3))
    n_raw = int(a.get("n_raw", 512))
    n_inc = int(a.get("n_incumbent_samples", 64))
    ei_tol = float(a.get("ei_tolerance", 0.0))
    patience = int(a.get("patience", 10))
    f_rtol = float(a.get("f_rtol", 1e-3))
    x_tol = float(a.get("x_tol", 1e-3))
    refit_every = max(1, int(a.get("refit_every", 1)))
    train_max_iter = int(a.get("surrogate_train_max_iter", 100))
    noise_function = a.get("noise_function", None)
    fixed_noise = a.get("noise_variance", None)

    def _noise_for(theta):
        """Known observation variance reported immediately after evaluation
        (lets the SLQ estimator describe that specific evaluation,
        ref gp.py:999-1016)."""
        if callable(noise_function):
            v = noise_function(theta)
            if v is not None and np.isfinite(v) and float(v) > 0.0:
                return float(v)
            return None
        if fixed_noise is not None:
            return max(float(fixed_noise), 1e-12)
        return None

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        u_init = qmc.Sobol(d=dim, scramble=True,
                           seed=int(a.get("seed", 0))).random(n_init)
    u_init[0] = tf.to_unit(init_hyperparameters)[0]

    u_list, y_list, v_list, theta_list = [], [], [], []
    stopped_early = False

    def _evaluate(u_row, iteration):
        theta = tf.from_unit(u_row)[0]
        val = float(objective_function(theta))
        if not np.isfinite(val):
            val = np.finfo(float).max / 1e6
        u_list.append(np.asarray(u_row, dtype=float))
        theta_list.append(theta)
        y_list.append(val)
        v_list.append(_noise_for(theta))
        if callable(callback):
            best = int(np.argmin(y_list))
            callback(theta_list[best], y_list[best], iteration,
                     {"n_evaluations": len(y_list)})
        return val

    if info:
        print(f"fvgp_tpu bo: space-filling design of {len(u_init)} points in "
              f"{dim} hyperparameters (budget {max_iter})")
    for i in range(len(u_init)):
        if callable(early_stop) and early_stop():
            stopped_early = True
            break
        _evaluate(u_init[i], i)
    if info and y_list:
        print(f"fvgp_tpu bo: design complete, best f(x)= {min(y_list)}")

    gp = None
    post_mean_fn = None
    ei_history = []
    n_eval = len(y_list)
    stall = 0
    previous_best = float(np.min(y_list)) if y_list else np.inf
    previous_u = (np.asarray(u_list[int(np.argmin(y_list))])
                  if y_list else None)
    stopping_reason = "budget"

    while n_eval < max_iter and not stopped_early:
        if callable(early_stop) and early_stop():
            stopped_early = True
            stopping_reason = "stopped"
            break
        u_arr = np.asarray(u_list)
        y_arr = -np.asarray(y_list)        # surrogate models the negated objective
        if all(v is None for v in v_list):
            v_arr = None
        else:
            known = [v for v in v_list if v is not None]
            filler = float(np.mean(known))
            v_arr = np.array([filler if v is None else v for v in v_list])

        if gp is None or (n_eval % refit_every) == 0:
            try:
                gp = _fit_surrogate(u_arr, y_arr, v_arr, dim, train_max_iter)
            except Exception as ex:
                warnings.warn(f"Inner BO surrogate fit failed ({ex}); "
                              f"stopping BO early.")
                break

        # incumbent posterior samples (common random numbers per iteration)
        m_obs = np.asarray(gp.posterior_mean(u_arr)["m(x)"]).reshape(len(u_arr))
        v_obs = np.asarray(gp.posterior_covariance(
            u_arr, variance_only=True)["v(x)"]).reshape(len(u_arr))
        s_obs = np.sqrt(np.maximum(v_obs, 1e-12))
        y_best_samples = np.max(
            m_obs[:, None] + s_obs[:, None] * rng.standard_normal(
                (len(u_arr), n_inc)), axis=0)

        nei_batch, nei_vg, post_mean_fn = _make_acquisition(gp, y_best_samples, dim)
        u_next, ei = _maximize_acquisition(nei_batch, nei_vg, dim, rng,
                                           n_restarts, n_raw)
        ei_history.append(float(ei))

        if ei_tol > 0.0 and ei < ei_tol:
            stopping_reason = "ei_tolerance"
            break

        latest = _evaluate(u_next, n_eval)
        n_eval = len(y_list)
        if info:
            print(f"fvgp_tpu bo evaluation {n_eval} of at most {max_iter}: "
                  f"f(x)= {latest}, best= {min(y_list)}, EI was {ei}")

        best_index = int(np.argmin(y_list))
        current_best = float(y_list[best_index])
        current_u = np.asarray(u_list[best_index])
        observed_range = float(np.max(y_list) - np.min(y_list))
        reference = observed_range if observed_range > 0.0 else max(
            abs(current_best), 1.0)
        gained = (previous_best - current_best) / reference
        moved = (np.inf if previous_u is None
                 else float(np.linalg.norm(current_u - previous_u)))
        if gained <= f_rtol and moved <= x_tol:
            stall += 1
        else:
            stall = 0
        previous_best, previous_u = current_best, current_u
        if patience > 0 and stall >= patience:
            stopping_reason = "converged"
            break

    # --- recommendation (noise-aware; ref gp_bo.py:760-802) ----------------
    y_arr = np.asarray(y_list)
    u_arr = np.asarray(u_list)
    best_idx = int(np.argmin(y_arr))
    known = [v for v in v_list if v is not None]
    noise_learned = False
    if known:
        noise_var = float(np.mean(known))
    elif gp is not None and getattr(gp, "_bo_learned_noise", None) is not None:
        noise_var = float(gp._bo_learned_noise)
        noise_learned = True
    else:
        noise_var = 0.0
    if gp is not None and known and noise_var > 0.0:
        try:
            m_obs = np.asarray(gp.posterior_mean(u_arr)["m(x)"]).reshape(len(u_arr))
            cand = int(np.argmax(m_obs))
            if y_arr[cand] <= y_arr[best_idx] + 3.0 * np.sqrt(noise_var):
                best_idx = cand
        except Exception:
            pass
    theta_best = np.asarray(theta_list[best_idx], dtype=float)

    hps_surrogate, ard = None, None
    sensitivity, posterior_cov, curvature = None, None, None
    if gp is not None:
        hps_surrogate = np.asarray(gp.hyperparameters, dtype=float)
        ard = hps_surrogate[1:1 + dim]
        if post_mean_fn is not None:
            try:
                posterior_cov, curvature = _laplace_posterior(
                    post_mean_fn, u_arr[best_idx], tf)
                if curvature is not None:
                    sensitivity = np.abs(np.diag(curvature))
            except Exception:
                pass
        if sensitivity is None:
            sensitivity = 1.0 / np.maximum(ard, 1e-12)

    if info:
        print(f"fvgp_tpu bo finished after {len(y_list)} evaluations "
              f"({stopping_reason}): f(x)= {y_arr[best_idx]} at {theta_best}")
    bo_info = {
        "x": theta_best,
        "f(x)": float(y_arr[best_idx]),
        "trace x": np.asarray(theta_list),
        "trace f(x)": y_arr,
        "trace u": u_arr,
        "n_evaluations": len(y_list),
        "ei history": np.asarray(ei_history),
        "surrogate hyperparameters": hps_surrogate,
        "ard length scales": ard,
        "sensitivity": sensitivity,
        "posterior covariance": posterior_cov,
        "curvature": curvature,
        "log-transformed dimensions": tf.log_mask,
        "stopped early": stopped_early,
        "stopping reason": stopping_reason,
        "observation noise variance": noise_var if noise_var > 0.0 else None,
        "noise was learned": noise_learned,
        "surrogate": gp,
    }
    return theta_best, bo_info

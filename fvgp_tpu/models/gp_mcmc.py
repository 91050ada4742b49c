"""Adaptive-Metropolis MCMC (parity target: /root/reference/fvgp/gp_mcmc.py,
Shaby & Wells adaptive-proposal scheme).

The sampler itself is a host loop — Metropolis adaptation is inherently
sequential — but each likelihood evaluation is one jitted device program
(the traced LML), so the TPU sees a stream of identical compiled calls.
Trace/`mcmc_info` contract matches the reference: MAP / max x / mean /
median / var of the last 1% (gp_mcmc.py:169-179), default break condition on
a stabilized 100-sample likelihood window (:183-193), per-block proposal
distributions with acceptance-rate-targeted adaptation (:234-361).
"""

import time
import warnings

import numpy as np


class ProposalDistribution:
    """A proposal distribution over a subset of hyperparameter indices
    (ref gp_mcmc.py:234)."""

    def __init__(self, indices, proposal_dist="normal", init_prop_Sigma=None,
                 adapt_callable=None, r_opt=.234, c_0=10, c_1=.8, K=10,
                 auto_accept=False, adapt_cov=True, prop_args=None, ID=None):
        self.indices = np.asarray(indices)
        self.r_opt = r_opt
        self.c_0 = c_0
        self.c_1 = c_1
        self.K = K
        self.auto_accept = auto_accept
        self.adapt_cov = adapt_cov
        self.ID = ID
        dim = len(self.indices)
        self.jump_trace = []

        if proposal_dist == "normal":
            self.proposal_dist = self.normal_proposal_dist
        elif callable(proposal_dist):
            self.proposal_dist = proposal_dist
        else:
            raise Exception("No proposal distribution specified!")

        if proposal_dist == "normal" and init_prop_Sigma is None:
            init_prop_Sigma = np.identity(dim)
            warnings.warn("Normal proposal distribution without init_prop_Sigma; "
                          "this can lead to slow convergence.")

        if callable(adapt_callable):
            self.adapt = adapt_callable
        elif adapt_callable == "normal" or proposal_dist == "normal":
            self.adapt = self._adapt
        else:
            if isinstance(adapt_callable, str):
                raise Exception("Invalid string provided for adapt callable.")
            self.adapt = self._no_adapt

        if prop_args is None:
            self.prop_args = {"prop_Sigma": init_prop_Sigma,
                              "sigma_m": 2.4 ** 2 / dim}
        else:
            self.prop_args = prop_args
            if adapt_callable == "normal":
                self.prop_args["prop_Sigma"] = init_prop_Sigma
                self.prop_args["sigma_m"] = 2.4 ** 2 / dim

    def normal_proposal_dist(self, x, hps, obj):
        """Draw from N(x, Σ) (ref gp_mcmc.py:320-341)."""
        cov = obj.prop_args["prop_Sigma"]
        return np.random.multivariate_normal(mean=x, cov=cov, size=1).reshape(len(x))

    def _adapt(self, end, mcmc_obj):
        """Adapt Σ and the log step-scale toward acceptance 0.234 every K
        steps (ref gp_mcmc.py:343-361)."""
        K = self.K
        if (end % K) == 0:
            k = 3
            prop_Sigma = self.prop_args["prop_Sigma"]
            sigma_m = self.prop_args["sigma_m"]
            trace = np.asarray(mcmc_obj.trace["x"]).T
            start = end - K + 1
            gamma2 = 1. / ((end / K) + k) ** self.c_1
            gamma1 = self.c_0 * gamma2
            r_hat = np.mean(self.jump_trace[start:end])
            sigma_m = np.exp(np.log(sigma_m) + gamma1 * (r_hat - self.r_opt))
            if self.adapt_cov:
                prop_Sigma = prop_Sigma + gamma2 * (
                    np.cov(trace[self.indices, start:end]) - prop_Sigma)
            self.prop_args["prop_Sigma"] = prop_Sigma
            self.prop_args["sigma_m"] = sigma_m

    def _no_adapt(self, end, mcmc_obj):
        return

    def __getstate__(self):
        return self.__dict__

    def __setstate__(self, state):
        self.__dict__.update(state)


def run_mcmc_vectorized(log_likelihood_batch, bounds, x0s, *, n_updates=10000,
                        info=False, r_opt=0.234, c_0=10, c_1=0.8, K=10,
                        break_condition="default", seed=0):
    """Adaptive Metropolis with C parallel chains whose likelihood
    evaluations are ONE batched device call per step.

    MCMC adaptation is inherently sequential (SURVEY.md §7 hard part 6);
    what the TPU can amortize is the expensive part — the C marginal
    likelihoods per step run as one vmapped program (C batched Choleskys on
    the MXU).  Each chain keeps its own Shaby-style adaptive proposal.

    Returns the reference-shaped ``mcmc_info`` dict, pooled over chains
    (quantiles over the union of late samples), plus per-chain traces under
    ``"x_chains"`` and the usual keys.
    """
    bounds = np.asarray(bounds, dtype=float)
    x0s = np.atleast_2d(np.asarray(x0s, dtype=float))
    C, H = x0s.shape
    rng = np.random.default_rng(seed)
    domain = bounds[:, 1] - bounds[:, 0]
    prop_sigma = np.tile(np.diag((domain * 0.2 / np.sqrt(12)) ** 2), (C, 1, 1))
    sigma_m = np.full(C, 2.4 ** 2 / H)

    def prior(X):
        return np.all((X >= bounds[:, 0]) & (X <= bounds[:, 1]), axis=1)

    X = x0s.copy()
    like = np.asarray(log_likelihood_batch(X), dtype=float)
    trace_x = [X.copy()]
    trace_f = [like.copy()]
    jumps = np.zeros((0, C))
    start = time.time()
    stamps = []

    n_updates = max(int(n_updates), 2)
    for i in range(1, n_updates):
        # per-chain multivariate-normal proposals (host; tiny)
        prop = np.stack([
            rng.multivariate_normal(X[c], prop_sigma[c]) for c in range(C)])
        ok = prior(prop)
        cand = np.where(ok[:, None], prop, X)
        like_cand = np.asarray(log_likelihood_batch(cand), dtype=float)
        expo = np.where(ok, like_cand - like, -np.inf)
        metr = np.where(expo < 50, np.exp(np.minimum(expo, 50)), 1.1)
        metr = np.where(np.isnan(metr), 0.0, metr)
        accept = metr > rng.uniform(size=C)
        X = np.where(accept[:, None], cand, X)
        like = np.where(accept, like_cand, like)
        trace_x.append(X.copy())
        trace_f.append(like.copy())
        stamps.append(time.time() - start)
        jumps = np.vstack([jumps, accept.astype(float)])

        if (i % K) == 0 and i >= K:
            k_off = 3
            gamma2 = 1.0 / ((i / K) + k_off) ** c_1
            gamma1 = c_0 * gamma2
            r_hat = jumps[-K:].mean(axis=0)
            sigma_m = np.exp(np.log(sigma_m) + gamma1 * (r_hat - r_opt))
            recent = np.stack(trace_x[-K:], axis=0)      # (K, C, H)
            for c in range(C):
                cov = np.cov(recent[:, c, :].T)
                if np.all(np.isfinite(cov)):
                    prop_sigma[c] = prop_sigma[c] + gamma2 * (
                        np.atleast_2d(cov) - prop_sigma[c])

        if info and (i % 10) == 0:
            print(f"mcmc chains step {i}/{n_updates}: best f(x)= "
                  f"{np.max(trace_f[-1]):.4f}")
        if break_condition == "default" and i >= 1000:
            F = np.asarray(trace_f)
            pooled = F.mean(axis=1)
            if abs(pooled[-100:].mean() - pooled[-200:-100].mean()) < 1e-3:
                break

    Xs = np.asarray(trace_x)            # (steps, C, H)
    Fs = np.asarray(trace_f)            # (steps, C)
    flat_idx = np.unravel_index(np.argmax(Fs), Fs.shape)
    tail = max(1, int(len(Xs) / 100))
    pooled_tail = Xs[-tail:].reshape(-1, H)
    return {"f(x)": Fs, "max f(x)": float(Fs[flat_idx]),
            "MAP": float(Fs[flat_idx]),
            "max x": Xs[flat_idx[0], flat_idx[1]],
            "time stamps": stamps,
            "x": Xs.reshape(-1, H),
            "x_chains": Xs,
            "n_chains": C,
            "mean(x)": pooled_tail.mean(axis=0),
            "median(x)": np.median(pooled_tail, axis=0),
            "var(x)": pooled_tail.var(axis=0)}


class gpMCMC:
    """Customizable Metropolis sampler (ref gp_mcmc.py:38)."""

    def __init__(self, log_likelihood_function, bounds=None, prior_function=None,
                 proposal_distributions="normal", args=None):
        self.log_likelihood_function = log_likelihood_function
        if bounds is None and prior_function is None:
            raise AssertionError("Provide either bounds (for the default uniform "
                                 "prior) or a prior_function.")
        if prior_function is None:
            self.prior_function = lambda theta, b, _: (
                0. if np.all((theta >= b[:, 0]) & (theta <= b[:, 1])) else -np.inf)
        else:
            self.prior_function = prior_function
        if proposal_distributions == "normal":
            if bounds is None:
                raise AssertionError("bounds must be provided to initialize the "
                                     "default normal proposal distribution.")
            domain_size = bounds[:, 1] - bounds[:, 0]
            std_diag = domain_size * 0.2 / np.sqrt(12)
            proposal_distributions = [ProposalDistribution(
                np.arange(len(bounds)), init_prop_Sigma=np.diag(std_diag ** 2))]
        self.proposal_distributions = proposal_distributions
        self.args = args
        self.bounds = bounds
        self.trace = None
        self.mcmc_info = {}

    def run_mcmc(self, *, x0, n_updates=10000, info=False, break_condition=None,
                 run_in_every_iteration=None):
        """Run the sampler (ref gp_mcmc.py:96-181); returns the mcmc_info
        dict with MAP/mean/median/var of the last 1%."""
        start_time = time.time()
        n_updates = max(n_updates, 2)
        if not (isinstance(x0, np.ndarray) and x0.ndim == 1):
            raise AssertionError("x0 must be a 1-d np.ndarray")

        if break_condition is None:
            break_condition = lambda a: False          # noqa: E731
        elif break_condition == "default":
            break_condition = self._default_break_condition
        elif callable(break_condition):
            pass
        else:
            raise Exception("No valid input for break condition provided!")
        if run_in_every_iteration is None:
            run_in_every_iteration = lambda a: False   # noqa: E731

        self.trace = {"f(x)": [], "x": [], "time stamp": []}
        self.trace["x"].append(x0)

        x = x0.copy()
        likelihood = self.log_likelihood_function(x, self.args)
        if info:
            print("Starting likelihood. f(x)= ", likelihood)
        prior = self.prior_function(x, self.bounds, self.args)

        for i in np.arange(1, n_updates):
            for obj in self.proposal_distributions:
                x, prior, likelihood, jt = self._jump(x, obj, prior, likelihood)
                obj.jump_trace.append(jt)
                obj.adapt(i, self)

            self.trace["x"].append(x)
            self.trace["f(x)"].append(likelihood)
            self.trace["time stamp"].append(time.time() - start_time)
            run_in_every_iteration(self)

            if info and (i % 10) == 0:
                print("Finished ", i, " out of ", n_updates,
                      " iterations. f(x)= ", likelihood)
            if break_condition(self):
                break

            arg_max = np.argmax(self.trace["f(x)"])
            dist_index = int(len(self.trace["x"]) - (len(self.trace["x"]) / 100))
            self.mcmc_info = {
                "f(x)": self.trace["f(x)"],
                "max f(x)": self.trace["f(x)"][arg_max],
                "MAP": self.trace["f(x)"][arg_max],
                "max x": np.asarray(self.trace["x"])[arg_max],
                "time stamps": self.trace["time stamp"],
                "x": np.asarray(self.trace["x"]),
                "mean(x)": np.mean(np.asarray(self.trace["x"])[dist_index:], axis=0),
                "median(x)": np.median(np.asarray(self.trace["x"])[dist_index:], axis=0),
                "var(x)": np.var(np.asarray(self.trace["x"])[dist_index:], axis=0)}
        return self.mcmc_info

    @staticmethod
    def _default_break_condition(obj):
        """Stop once the mean likelihood of the last 100 samples stabilized
        (ref gp_mcmc.py:183-193)."""
        loglik = np.asarray(obj.trace["f(x)"])
        i = len(loglik)
        W = 100
        tol = 1e-3
        if i < 1000:
            return False
        return abs(loglik[-W:].mean() - loglik[-2 * W:-W].mean()) < tol

    def _jump(self, x_old, obj, prior_eval, likelihood):
        """One Metropolis step over obj's index block (ref gp_mcmc.py:196-224)."""
        x_star = x_old.copy()
        x_star[obj.indices] = obj.proposal_dist(x_old[obj.indices].copy(), x_old, obj)
        prior_star = self.prior_function(x_star, self.bounds, self.args)
        jump_trace = 0.
        if prior_star != -np.inf:
            likelihood_star = self.log_likelihood_function(x_star, self.args)
            if np.isnan(likelihood_star):
                raise Exception("Likelihood evaluation = NaN in gpMCMC")
            expo = prior_star + likelihood_star - prior_eval - likelihood
            metr_ratio = np.exp(expo) if expo < 50 else 1.1
            if np.isnan(metr_ratio):
                metr_ratio = 0.
            if metr_ratio > np.random.uniform(0, 1, 1) or obj.auto_accept:
                x = x_star
                prior_eval = prior_star
                likelihood = likelihood_star
                jump_trace = 1.
            else:
                x = x_old
        else:
            x = x_old
        return x, prior_eval, likelihood, jump_trace

    def __getstate__(self):
        return self.__dict__

    def __setstate__(self, state):
        self.__dict__.update(state)

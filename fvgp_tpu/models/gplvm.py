"""GPLVM — Gaussian-process latent-variable model
(parity target: the reference's unreleased /root/reference/dev/gplvm.py and
dev/gpm.py, its manifold/latent-variable GP line; not packaged in the
reference wheel either).

TPU-first formulation: the latent coordinates ARE parameters.  The whole
objective — kernel assembly over the latent X, Cholesky, the multi-output
marginal likelihood — is one jitted ``jax.value_and_grad`` program over
(X, hyperparameters), optimized with Adam.  The reference's dev version
threads hand-written gradients through its GP object graph; here latent
learning is ~40 lines because autodiff differentiates through the
factorization.

Model: Y (N, Q) observed; X (N, L) latent;  K = k(X, X) + noise I;
LML = -0.5 [ Q·log|KV| + tr(KV⁻¹ Y Yᵀ) + N·Q·log 2π ].
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config
from ..kernels import default_matern_ard

__all__ = ["GPLVM"]


class GPLVM:
    """Latent-variable GP: learns an (N, latent_dim) embedding of
    high-dimensional observations by maximizing the multi-output marginal
    likelihood.

    Parameters
    ----------
    y_data : (N, Q) observations.
    latent_dim : dimensionality L of the latent space.
    kernel_function : jnp kernel k(x1, x2, hps); default anisotropic
        Matérn-3/2 ARD over the latent space (hps = [var, l_1..l_L]).
    init_latent : (N, L) initial embedding; default PCA of y_data.
    init_hyperparameters : default ones(L+1).
    noise : observation noise variance (learned in log space).
    """

    def __init__(self, y_data, latent_dim=2, kernel_function=None,
                 init_latent=None, init_hyperparameters=None, noise=1e-2):
        y = np.asarray(y_data, dtype=np.float64)
        if y.ndim != 2:
            raise AssertionError("y_data must be (N, Q)")
        self.n, self.q = y.shape
        self.latent_dim = int(latent_dim)
        self.kernel = kernel_function or default_matern_ard
        dtype = config.linalg_dtype(None)
        self._y = jnp.asarray(y - y.mean(axis=0), dtype=dtype)

        if init_latent is None:
            # PCA initialization (the standard GPLVM seed)
            yc = y - y.mean(axis=0)
            _, _, vt = np.linalg.svd(yc, full_matrices=False)
            init_latent = yc @ vt[: self.latent_dim].T
            init_latent /= max(init_latent.std(), 1e-12)
        if init_hyperparameters is None:
            init_hyperparameters = np.ones(self.latent_dim + 1)
        self.X = jnp.asarray(init_latent, dtype=dtype)
        self.hyperparameters = np.asarray(init_hyperparameters, dtype=np.float64)
        self.log_noise = float(np.log(noise))
        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        kernel = self.kernel
        y = self._y
        n, q = self.n, self.q

        def neg_lml(params):
            X, log_hps, log_noise = params
            hps = jnp.exp(log_hps)
            K = kernel(X, X, hps)
            KV = K + jnp.exp(log_noise) * jnp.eye(n, dtype=K.dtype)
            L = jnp.linalg.cholesky(KV)
            alpha = jax.scipy.linalg.cho_solve((L, True), y)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            quad = jnp.sum(y * alpha)
            # a standard-normal prior on X regularizes the embedding scale
            prior = 0.5 * jnp.sum(X * X)
            return 0.5 * (q * logdet + quad + n * q * jnp.log(2 * jnp.pi)) + prior

        self._neg_lml_vg = jax.jit(jax.value_and_grad(neg_lml))
        self._neg_lml = jax.jit(neg_lml)

    def _params(self):
        dtype = config.linalg_dtype(None)
        return (self.X,
                jnp.log(jnp.asarray(self.hyperparameters, dtype=dtype)),
                jnp.asarray(self.log_noise, dtype=dtype))

    def log_likelihood(self):
        """Multi-output marginal log-likelihood at the current state."""
        return -float(self._neg_lml(self._params()))

    # ------------------------------------------------------------------
    def train(self, max_iter=500, learning_rate=1e-2, info=False):
        """Jointly optimize latent coordinates, kernel hyperparameters, and
        noise with Adam on the jitted value_and_grad program."""
        params = self._params()
        optimizer = optax.adam(learning_rate)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = self._neg_lml_vg(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        loss = None
        for it in range(int(max_iter)):
            params, opt_state, loss = step(params, opt_state)
            if info and (it % 50 == 0):
                print(f"GPLVM iter {it}: loss {float(loss):.4f}")
        X, log_hps, log_noise = params
        self.X = X
        self.hyperparameters = np.exp(np.asarray(log_hps))
        self.log_noise = float(log_noise)
        return np.asarray(self.X)

    # ------------------------------------------------------------------
    def __getstate__(self):
        """Checkpoint contract: jitted closures drop and rebuild on load."""
        state = dict(self.__dict__)
        state.pop("_neg_lml", None)
        state.pop("_neg_lml_vg", None)
        state["X"] = np.asarray(self.X)
        state["_y"] = np.asarray(self._y)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        dtype = config.linalg_dtype(None)
        self.X = jnp.asarray(self.X, dtype=dtype)
        self._y = jnp.asarray(self._y, dtype=dtype)
        self._build()

    # ------------------------------------------------------------------
    @property
    def latent_coordinates(self):
        return np.asarray(self.X)

    def reconstruct(self, x_latent=None):
        """Posterior mean of Y at latent positions (default: the training
        embedding) — the decoder direction."""
        dtype = config.linalg_dtype(None)
        Xq = self.X if x_latent is None else jnp.asarray(x_latent, dtype=dtype)
        hps = jnp.asarray(self.hyperparameters, dtype=dtype)
        K = self.kernel(self.X, self.X, hps) \
            + np.exp(self.log_noise) * jnp.eye(self.n, dtype=dtype)
        ks = self.kernel(self.X, Xq, hps)
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), self._y)
        return np.asarray(ks.T @ alpha)

    def predict_variance(self, x_latent):
        """Posterior variance at latent positions (shared across outputs)."""
        dtype = config.linalg_dtype(None)
        Xq = jnp.asarray(x_latent, dtype=dtype)
        hps = jnp.asarray(self.hyperparameters, dtype=dtype)
        K = self.kernel(self.X, self.X, hps) \
            + np.exp(self.log_noise) * jnp.eye(self.n, dtype=dtype)
        ks = self.kernel(self.X, Xq, hps)
        kss = self.kernel(Xq, Xq, hps)
        L = jnp.linalg.cholesky(K)
        sol = jax.scipy.linalg.cho_solve((L, True), ks)
        v = jnp.diagonal(kss) - jnp.sum(ks * sol, axis=0)
        return np.asarray(jnp.clip(v, 0.0, None))

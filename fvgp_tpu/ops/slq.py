"""Stochastic Lanczos quadrature log-determinant.

TPU-native replacement for the `imate` C++/CUDA SLQ backend the reference
hard-requires for gp2Scale (/root/reference/fvgp/gp_lin_alg.py:1083-1181).

Estimator: logdet(A) = tr(log A) = E_z[ zᵀ log(A) z ] for Rademacher z.
Each probe runs an m-step Lanczos recursion (a `lax.scan` of matvecs with
full reorthogonalization — m is tiny, ~20, so the reorth GEMMs are cheap on
the MXU), then quadrature through `eigh` of the m×m tridiagonal.  Probes are
vmapped, so one kernel launch carries a whole probe batch.

The estimator's own variance is reported exactly as the reference surfaces
imate's `info` (gp_lin_alg.py:1159-1180): it is the observation noise that
`train(method='bo')` feeds into its surrogate.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["slq_logdet", "lanczos_tridiag"]


@functools.partial(jax.jit, static_argnames=("matvec", "degree"))
def lanczos_tridiag(matvec, v0, degree):
    """m-step Lanczos with full reorthogonalization.

    Parameters
    ----------
    matvec : callable (n,) -> (n,)
    v0 : (n,) start vector (need not be normalized)
    degree : number of Lanczos steps m

    Returns
    -------
    alphas (m,), betas (m-1,) of the tridiagonal T.
    """
    n = v0.shape[0]
    dtype = v0.dtype
    v = v0 / jnp.linalg.norm(v0)
    V = jnp.zeros((degree, n), dtype).at[0].set(v)

    def step(carry, i):
        V, v_prev, v, beta_prev = carry
        w = matvec(v)
        alpha = jnp.dot(w, v)
        w = w - alpha * v - beta_prev * v_prev
        # full reorthogonalization against all previous basis vectors
        w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        v_next = jnp.where(beta > 0, w / jnp.where(beta == 0, 1.0, beta), w)
        V = jax.lax.cond(i + 1 < degree,
                         lambda V: V.at[i + 1].set(v_next),
                         lambda V: V, V)
        return (V, v, v_next, beta), (alpha, beta)

    (_, _, _, _), (alphas, betas) = jax.lax.scan(
        step, (V, jnp.zeros_like(v), v, jnp.zeros((), dtype)),
        jnp.arange(degree))
    return alphas, betas[:-1]


def _probe_quadrature(matvec, z, degree):
    """zᵀ log(A) z estimate for one Rademacher probe z."""
    n = z.shape[0]
    alphas, betas = lanczos_tridiag(matvec, z, degree)
    T = (jnp.diag(alphas)
         + jnp.diag(betas, 1)
         + jnp.diag(betas, -1))
    theta, U = jnp.linalg.eigh(T)
    theta = jnp.maximum(theta, jnp.finfo(z.dtype).tiny)
    tau = U[0, :] ** 2
    # ||z||² = n for Rademacher probes
    return n * jnp.sum(tau * jnp.log(theta))


@functools.partial(jax.jit,
                   static_argnames=("matvec", "n", "degree", "num", "dtype"))
def _probe_batch(matvec, key, n, degree, num, dtype):
    z = jax.random.rademacher(key, (num, n), dtype=dtype)
    return jax.vmap(lambda zz: _probe_quadrature(matvec, zz, degree))(z)


def slq_logdet(matvec, n, *, dtype=jnp.float64, degree=20, min_num_samples=10,
               max_num_samples=5000, error_rtol=0.01, batch=None, key=None,
               info_out=None):
    """Stochastic Lanczos log-determinant with adaptive probe count.

    Mirrors the reference's imate contract (gp_lin_alg.py:1103-1181):
    draws at least ``min_num_samples`` Hutchinson probes, keeps drawing in
    batches until the relative standard error of the mean falls under
    ``error_rtol`` or ``max_num_samples`` is hit, and reports the achieved
    variance/sample count via ``info_out``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if batch is None:
        batch = max(int(min_num_samples), 8)
    samples = []
    total = 0
    while True:
        key, sub = jax.random.split(key)
        vals = _probe_batch(matvec, sub, n, int(degree), int(batch), dtype)
        samples.append(vals)
        total += int(batch)
        all_vals = jnp.concatenate(samples)
        mean = jnp.mean(all_vals)
        if total > 1:
            var_mean = jnp.var(all_vals, ddof=1) / total
        else:
            var_mean = jnp.asarray(jnp.inf, dtype)
        err = float(jnp.sqrt(var_mean) / jnp.maximum(jnp.abs(mean), 1e-300))
        if (total >= min_num_samples and err <= error_rtol) or total >= max_num_samples:
            break
    result = float(mean)
    if info_out is not None:
        info_out["logdet"] = result
        info_out["variance"] = float(var_mean)
        info_out["num_samples"] = total
        info_out["relative_error"] = err
        info_out["degree"] = int(degree)
    return result

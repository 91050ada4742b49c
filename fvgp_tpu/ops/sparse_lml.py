"""Differentiable block-sparse marginal likelihood — the scale-path
training step.

The reference cannot differentiate its sparse LML at all: gp2Scale training
is restricted to MCMC/BO because imate's SLQ logdet and scipy's CG have no
gradient (ref gp.py:947-949, gp_marginal_likelihood.py:240).  Here the whole
sparse LML is ONE jittable, `jax.grad`-able program:

* covariance tiles are assembled in-trace from the (static) block structure,
  so the gradient flows through the kernel into the hyperparameters;
* the solve is conjugate gradients with a *static* iteration count
  (`lax.scan`, reverse-mode differentiable — the GPyTorch/BBMM recipe);
* log|K+V| is stochastic Lanczos quadrature with static probes and degree,
  differentiated through the Lanczos recursion and the m×m `eigh`.

Sharding: the tile arrays carry a NamedSharding over the device mesh; XLA
partitions the batched tile matmuls and inserts the all-reduce, so the same
program is the single-chip and the pod-scale training step.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["make_sparse_lml", "assemble_tiles"]


def assemble_tiles(kernel_fn, xb, mask, rows, cols, hps):
    """tiles[t] = k(x block rows[t], x block cols[t]) with padding masked.

    xb: (nb, B, D) padded point blocks; mask: (nb, B) validity;
    rows/cols: (T,) int32 (sentinel == nb allowed: gathers clamp, and the
    mask of the clamped block zeroes nothing extra because sentinel tiles
    are dropped at scatter time).
    """
    def one(i, j):
        Kt = kernel_fn(xb[i], xb[j], hps)
        return Kt * (mask[i][:, None] * mask[j][None, :])

    return jax.vmap(one)(rows, cols)


def _spmv(rows, cols, tiles, X, nb, B):
    n_pad = nb * B
    Xb = X.reshape(nb, B, -1)
    prod = jnp.einsum("tij,tjk->tik", tiles, Xb[cols],
                      preferred_element_type=X.dtype)
    out = jax.ops.segment_sum(prod, rows, num_segments=nb)
    return out.reshape(n_pad, -1)


def _cg_fixed(matvec, Bmat, iters):
    """CG with a static trip count — reverse-differentiable via scan."""
    X = jnp.zeros_like(Bmat)
    R = Bmat
    P = R
    rs = jnp.sum(R * R, axis=0)

    def step(carry, _):
        X, R, P, rs = carry
        Ap = matvec(P)
        pAp = jnp.sum(P * Ap, axis=0)
        alpha = rs / jnp.maximum(pAp, 1e-300)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * Ap
        rs_new = jnp.sum(R * R, axis=0)
        beta = rs_new / jnp.maximum(rs, 1e-300)
        P = R + beta[None, :] * P
        return (X, R, P, rs_new), None

    (X, _, _, _), _ = jax.lax.scan(step, (X, R, P, rs), None, length=iters)
    return X


def _slq_fixed(matvec, Z, degree, n_logical):
    """SLQ logdet with static probes Z (n_pad, P) and degree; Rademacher
    probes are zero on padded rows so the estimate covers the logical
    matrix."""
    n_pad, n_probe = Z.shape

    def lanczos(z):
        v = z / jnp.linalg.norm(z)

        def step(carry, _):
            v_prev, v, beta_prev = carry
            w = matvec(v[:, None])[:, 0]
            alpha = jnp.dot(w, v)
            w = w - alpha * v - beta_prev * v_prev
            beta = jnp.linalg.norm(w)
            v_next = w / jnp.maximum(beta, 1e-300)
            return (v, v_next, beta), (alpha, beta)

        _, (alphas, betas) = jax.lax.scan(
            step, (jnp.zeros_like(v), v, jnp.zeros((), v.dtype)), None,
            length=degree)
        T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1)
             + jnp.diag(betas[:-1], -1))
        theta, U = jnp.linalg.eigh(T)
        theta = jnp.maximum(theta, 1e-30)
        tau = U[0, :] ** 2
        return jnp.dot(z, z) * jnp.sum(tau * jnp.log(theta))

    vals = jax.vmap(lanczos, in_axes=1)(Z)
    return jnp.mean(vals), jnp.var(vals) / n_probe


def make_sparse_lml(kernel_fn, structure, *, cg_iters=64, slq_probes=16,
                    slq_degree=20):
    """Build lml(hps, xb, mask, y_pad, ypad_mask, noise_diag_pad, Z) — a pure
    jittable, differentiable sparse LML.

    structure: (rows, cols, nb, B) — static tile occupancy (host-computed
    from the bounding-box prune for the current hyperparameter region).
    y/noise arrive padded to nb*B with a validity mask.
    """
    rows, cols, nb, B = structure
    rows = jnp.asarray(rows, dtype=jnp.int32)
    cols = jnp.asarray(cols, dtype=jnp.int32)

    def lml(hps, xb, mask, y_pad, ypad_mask, noise_diag_pad, Z):
        tiles = assemble_tiles(kernel_fn, xb, mask, rows, cols, hps)

        def matvec(X):
            out = _spmv(rows, cols, tiles, X, nb, B)
            # K+V: diagonal noise (padded rows get 1.0 so Lanczos stays PD,
            # but probes/ rhs are zero there so they contribute nothing)
            return out + noise_diag_pad[:, None] * X

        n = jnp.sum(ypad_mask)
        mean = jnp.sum(y_pad) / n
        ym = (y_pad - mean) * ypad_mask
        alpha = _cg_fixed(matvec, ym[:, None], cg_iters)[:, 0]
        l1 = jnp.dot(ym, alpha)
        logdet, logdet_var = _slq_fixed(matvec, Z, slq_degree, n)
        # padded diagonal entries contribute log(1) = 0
        return -0.5 * (l1 + logdet + n * jnp.log(2.0 * jnp.pi))

    return lml


def make_padded_inputs(x, y, noise_diag, block_size, dtype=jnp.float32):
    """Host helper: pad (x, y, noise) to full blocks and build masks.
    Padded noise diagonal is 1.0 (keeps K+V PD on padded rows)."""
    import numpy as np
    n, d = x.shape
    nb = -(-n // block_size)
    n_pad = nb * block_size
    xb = np.zeros((n_pad, d))
    xb[:n] = x
    mask = np.zeros(n_pad)
    mask[:n] = 1.0
    y_pad = np.zeros(n_pad)
    y_pad[:n] = y
    noise_pad = np.ones(n_pad)
    noise_pad[:n] = noise_diag
    return (jnp.asarray(xb.reshape(nb, block_size, d), dtype),
            jnp.asarray(mask.reshape(nb, block_size), dtype),
            jnp.asarray(y_pad, dtype),
            jnp.asarray(mask, dtype),
            jnp.asarray(noise_pad, dtype))

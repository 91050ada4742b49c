"""Block-Jacobi preconditioner — the TPU-idiomatic replacement for the
reference's ILU / incomplete-Cholesky / AMG preconditioner zoo
(/root/reference/fvgp/gp_lin_alg.py:604-935).

Sequential sparse factorizations (ILU, IC, AMG setup) do not map to the MXU;
a block-Jacobi operator built from the diagonal blocks does: its setup is one
*batched* Cholesky of (nb, B, B) blocks and its application is a batched
triangular solve — both pure MXU work.  For compactly-supported covariance
matrices (the gp2Scale regime) the diagonal blocks carry most of the mass,
which is exactly when block-Jacobi is a strong preconditioner.

Diagonal-shift retry ladder on non-PD blocks follows the reference's
contract (gp_lin_alg.py:514-531): shift, grow, retry.
"""

import functools

import jax
import jax.numpy as jnp

from ..parallel.block_sparse import is_block_sparse

__all__ = ["build_block_jacobi", "build_block_jacobi_op",
           "block_jacobi_apply_factory"]


@jax.jit
def _batched_cholesky(blocks):
    return jnp.linalg.cholesky(blocks)


@functools.partial(jax.jit, static_argnames=("nb", "p", "n"))
def _apply_block_jacobi(Minv, X, nb, p, n):
    """Apply the batched explicit block inverse — one bmm.  (Triangular
    solves here are sequential over p rows and dominated the CG hot loop.)"""
    k = X.shape[1]
    Xp = jnp.zeros((nb * p, k), X.dtype).at[:n].set(X)
    Xb = Xp.reshape(nb, p, k)
    z = jnp.einsum("rij,rjk->rik", Minv, Xb, preferred_element_type=X.dtype)
    return z.reshape(nb * p, k)[:n]


@jax.jit
def _invert_from_chol(L):
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(eye, L.shape), lower=True)
    return jnp.einsum("rji,rjk->rik", Linv, Linv,
                      preferred_element_type=L.dtype)


def _pad_identity(blocks, n, p):
    """Set the diagonal of padded (all-zero) trailing rows to 1 so the
    batched Cholesky stays PD."""
    nb = blocks.shape[0]
    total = nb * p
    if total == n:
        return blocks
    flat_idx = jnp.arange(nb * p)
    pad = flat_idx >= n
    pad_b = pad.reshape(nb, p)
    idx = jnp.arange(p)
    diag = blocks[:, idx, idx]
    blocks = blocks.at[:, idx, idx].set(jnp.where(pad_b, 1.0, diag))
    return blocks


@functools.lru_cache(maxsize=64)
def block_jacobi_apply_factory(nb, p, n):
    """Stable apply-fn for the solver operator convention (ops.krylov):
    ``fn(Minv, X)`` with the batched block inverses as traced data."""

    def apply(Minv, X):
        return _apply_block_jacobi(Minv, X, nb, p, n)

    return apply


def build_block_jacobi_op(KV, args=None):
    """Operator-convention block-Jacobi: returns (stable_fn, L_data) so the
    solvers compile once per shape instead of once per factor."""
    L, nb, p, n = _factor_blocks(KV, args)
    return block_jacobi_apply_factory(nb, p, n), _invert_from_chol(L)


def build_block_jacobi(KV, args=None):
    """Build M ≈ (K+V)⁻¹ as a callable X -> M X (closure convention).

    For a BlockSparseMatrix the blocks are its diagonal tiles; for a dense
    matrix the diagonal is partitioned into
    ``args['sparse_preconditioner_block_size']`` (default 128) blocks.
    """
    L, nb, p, n = _factor_blocks(KV, args)
    Minv = _invert_from_chol(L)

    def apply(X):
        X = jnp.asarray(X)
        squeeze = X.ndim == 1
        if squeeze:
            X = X[:, None]
        out = _apply_block_jacobi(Minv, X, nb, p, n)
        return out[:, 0] if squeeze else out

    return apply


def _factor_blocks(KV, args=None):
    """(L, nb, p, n): the batched Cholesky of the diagonal blocks."""
    args = args or {}
    shift0 = float(args.get("sparse_preconditioner_shift", 0.0))
    growth = float(args.get("sparse_preconditioner_shift_growth", 10.0))
    attempts = int(args.get("sparse_preconditioner_shift_attempts", 5))

    if is_block_sparse(KV):
        blocks = KV.diagonal_tiles()
        n = KV.n
        p = KV.block_size
    else:
        KV = jnp.asarray(KV)
        n = KV.shape[0]
        p = min(int(args.get("sparse_preconditioner_block_size", 128)), n)
        nb = -(-n // p)
        n_pad = nb * p
        KVp = jnp.zeros((n_pad, n_pad), KV.dtype).at[:n, :n].set(KV)
        K4 = KVp.reshape(nb, p, nb, p)
        blocks = K4[jnp.arange(nb), :, jnp.arange(nb), :]
    nb = blocks.shape[0]
    blocks = _pad_identity(blocks, n, p)

    shift = shift0
    eye = jnp.eye(p, dtype=blocks.dtype)
    for attempt in range(max(attempts, 1)):
        L = _batched_cholesky(blocks + shift * eye[None])
        if bool(jnp.all(jnp.isfinite(L))):
            break
        shift = max(shift, 1e-12 * float(jnp.max(jnp.abs(blocks)))) * growth
    else:
        raise RuntimeError("block-Jacobi setup failed: non-PD diagonal blocks "
                           "after shift retries")
    return L, nb, p, n

"""Batched preconditioners — the TPU-idiomatic replacement for the
reference's ILU / incomplete-Cholesky / AMG preconditioner zoo
(/root/reference/fvgp/gp_lin_alg.py:604-935).

Sequential sparse factorizations (ILU, IC, AMG setup) do not map to the MXU.
Three operators that do, in increasing strength:

* **block-Jacobi** — batched Cholesky of the (nb, B, B) diagonal blocks;
  application is one batched matmul.  Strong when the diagonal blocks carry
  most of the mass (compact support, short length scales).
* **overlapping additive Schwarz** (the block-IC-class option, every
  ``sparseCGpre_ichol``-family alias) — exact factorizations of OVERLAPPING
  2B×2B windows [[D_w, C_w], [C_wᵀ, D_{w+1}]] along the (Morton-ordered)
  block tridiagonal: M⁻¹ = Σ_w R_wᵀ W_w⁻¹ R_w, symmetric PSD.  Captures the
  neighbor coupling that stalls block-Jacobi on dense-ish kernels / long
  length scales — the role the reference fills with compiled incomplete
  Cholesky (ref gp_lin_alg.py:655-756, :830-860) — while staying one
  batched Cholesky + one batched matmul.
* **two-level** (the AMG-class option, ``sparseCGpre_amg``) — block-Jacobi
  smoother plus an additive coarse-grid correction P A_c⁻¹ Pᵀ with
  block-constant prolongation P and the Galerkin coarse matrix
  A_c = PᵀAP (tile-sum entries, one dense nb×nb Cholesky).  Kills the
  low-frequency error AMG targets (ref gp_lin_alg.py:863-887) without a
  sequential setup phase.

Diagonal-shift retry ladder on non-PD blocks follows the reference's
contract (gp_lin_alg.py:514-531): shift, grow, retry.
"""

import functools

import jax
import jax.numpy as jnp

from ..parallel.block_sparse import is_block_sparse

__all__ = ["build_block_jacobi", "build_block_jacobi_op",
           "block_jacobi_apply_factory", "build_preconditioner_op",
           "build_schwarz_op", "build_two_level_op"]


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


# ---------------------------------------------------------------------------
# overlapping additive Schwarz (block-IC-class)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nb", "p", "n"))
def _apply_schwarz(Winv, X, nb, p, n):
    """M⁻¹X = Σ_w R_wᵀ W_w⁻¹ R_w X over windows of rows [w·p, w·p+2p):
    one batched bmm + one overlap scatter-add."""
    k = X.shape[1]
    Xp = jnp.zeros((nb * p + p, k), X.dtype).at[:n].set(X)
    idx = jnp.arange(nb)[:, None] * p + jnp.arange(2 * p)[None, :]
    Xw = Xp[idx]                                            # (nb, 2p, k)
    Zw = jnp.einsum("wij,wjk->wik", Winv, Xw,
                    preferred_element_type=X.dtype)
    out = jnp.zeros((nb * p + p, k), X.dtype).at[idx].add(Zw)
    return out[:n]


@functools.lru_cache(maxsize=64)
def schwarz_apply_factory(nb, p, n):
    def apply(Winv, X):
        return _apply_schwarz(Winv, X, nb, p, n)

    return apply


def _window_blocks(KV, args=None):
    """(nb, 2p, 2p) overlapping windows along the block tridiagonal."""
    args = args or {}
    if is_block_sparse(KV):
        D = KV.diagonal_tiles()
        C = KV.off_diagonal_tiles(1)
        n = KV.n
        p = KV.block_size
        nb = D.shape[0]
        W = jnp.zeros((nb, 2 * p, 2 * p), D.dtype)
        W = W.at[:, :p, :p].set(D)
        W = W.at[:, :p, p:].set(C)
        W = W.at[:, p:, :p].set(jnp.swapaxes(C, 1, 2))
        W = W.at[:-1, p:, p:].set(D[1:])
    else:
        KV = jnp.asarray(KV)
        n = KV.shape[0]
        p = min(int(args.get("sparse_preconditioner_block_size", 128)), n)
        nb = -(-n // p)
        n_pad = nb * p
        KVp = jnp.zeros((n_pad + p, n_pad + p), KV.dtype).at[:n, :n].set(KV)
        idx = jnp.arange(nb)[:, None] * p + jnp.arange(2 * p)[None, :]
        W = KVp[idx[:, :, None], idx[:, None, :]]
    # padded/overhanging rows must be DECOUPLED unit rows so the window
    # factorization stays exact and PD: zero their couplings, then set a
    # unit diagonal
    flat = jnp.arange(nb)[:, None] * p + jnp.arange(2 * p)[None, :]
    pad = flat >= n
    d = jnp.arange(2 * p)
    W = jnp.where(pad[:, :, None] | pad[:, None, :],
                  jnp.zeros_like(W), W)
    W = W.at[:, d, d].set(jnp.where(pad, 1.0, W[:, d, d]))
    return W, nb, p, n


def build_schwarz_op(KV, args=None):
    """Operator-convention overlapping additive Schwarz."""
    args = args or {}
    W, nb, p, n = _window_blocks(KV, args)
    L = _shifted_cholesky(W, args)
    return schwarz_apply_factory(nb, p, n), _invert_from_chol(L)


# ---------------------------------------------------------------------------
# two-level (AMG-class): block-Jacobi smoother + coarse-grid correction
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nb", "p", "n"))
def _apply_two_level(Minv, Lc, X, nb, p, n):
    z = _apply_block_jacobi(Minv, X, nb, p, n)
    k = X.shape[1]
    Xp = jnp.zeros((nb * p, k), X.dtype).at[:n].set(X)
    r_c = jnp.sum(Xp.reshape(nb, p, k), axis=1)             # Pᵀ X
    y_c = jax.scipy.linalg.cho_solve((Lc, True), r_c)       # A_c⁻¹
    corr = jnp.broadcast_to(y_c[:, None, :], (nb, p, k)).reshape(nb * p, k)
    return z + corr[:n]


@functools.lru_cache(maxsize=64)
def two_level_apply_factory(nb, p, n):
    def apply(data, X):
        Minv, Lc = data
        return _apply_two_level(Minv, Lc, X, nb, p, n)

    return apply


def build_two_level_op(KV, args=None):
    """Operator-convention two-level preconditioner (AMG-class)."""
    args = args or {}
    L, nb, p, n, Ac = _factor_blocks(KV, args, want_coarse=True)
    Minv = _invert_from_chol(L)
    # padded trailing block (if any) may have a deficient coarse row; the
    # shift ladder below covers it along with any near-singular aggregate
    Lc = _shifted_cholesky(Ac[None], args)[0]
    return two_level_apply_factory(nb, p, n), (Minv, Lc)


_SCHWARZ_ALIASES = frozenset((
    "schwarz", "additive_schwarz", "ic", "ichol", "ichol0",
    "incomplete_cholesky", "native_ic", "native_ichol",
    "native_incomplete_cholesky", "legacy_ic", "legacy_ichol",
    "legacy_incomplete_cholesky", "ilu"))


def normalize_type(name):
    """Canonicalize the reference's preconditioner aliases onto the three
    operators that exist here (ref gp_lin_alg.py:397): every IC/ILU-family
    name -> 'schwarz', AMG names -> 'amg', jacobi names ->
    'block_jacobi'.  Unknown names RAISE — a typo ('schwartz', 'AMG' on a
    case-sensitive compare) must not silently hand back block-Jacobi on
    the long-lengthscale problems where the user chose otherwise."""
    n = str(name).lower()
    if n in _SCHWARZ_ALIASES:
        return "schwarz"
    if "amg" in n:
        return "amg"
    if n in ("block_jacobi", "jacobi", "bj", "diag", "diagonal"):
        return "block_jacobi"
    raise Exception(f"Unknown sparse preconditioner type: {name!r}. "
                    f"Known: block_jacobi, schwarz (+ IC/ILU aliases), amg.")


def build_preconditioner_op(KV, args=None):
    """Dispatch on ``args['sparse_preconditioner_type']`` (the
    ``sparseCGpre_<type>`` alias target, ref gp_lin_alg.py:474-505):
    block-Jacobi (default), overlapping Schwarz (every IC/ILU-family
    alias), or two-level ('amg').  Unknown names raise (normalize_type)."""
    args = args or {}
    ptype = normalize_type(args.get("sparse_preconditioner_type",
                                    "block_jacobi"))
    if ptype == "schwarz":
        return build_schwarz_op(KV, args)
    if ptype == "amg":
        return build_two_level_op(KV, args)
    return build_block_jacobi_op(KV, args)


def _shifted_cholesky(blocks, args):
    """Batched Cholesky with the reference's diagonal-shift retry ladder
    (ref gp_lin_alg.py:514-531)."""
    args = args or {}
    shift0 = float(args.get("sparse_preconditioner_shift", 0.0))
    growth = float(args.get("sparse_preconditioner_shift_growth", 10.0))
    attempts = int(args.get("sparse_preconditioner_shift_attempts", 5))
    eye = jnp.eye(blocks.shape[-1], dtype=blocks.dtype)
    shift = shift0
    for _ in range(max(attempts, 1)):
        L = _batched_cholesky(blocks + shift * eye[None])
        if bool(jnp.all(jnp.isfinite(L))):
            return L
        shift = max(shift, 1e-12 * float(jnp.max(jnp.abs(blocks)))) * growth
    raise RuntimeError("preconditioner setup failed: non-PD blocks after "
                       "shift retries")


def _factor_blocks(KV, args=None, want_coarse=False):
    """(L, nb, p, n[, Ac]): the batched Cholesky of the diagonal blocks.

    ``want_coarse=True`` also returns the coarse aggregate matrix
    ``Ac[i, j] = sum of KV block (i, j)`` computed from the SAME padded
    copy the dense path already builds — the two-level builder previously
    re-allocated a second (n_pad, n_pad) copy (2x transient memory near
    the 20k dense cutoff) just for this sum."""
    args = args or {}
    Ac = None
    if is_block_sparse(KV):
        blocks = KV.diagonal_tiles()
        n = KV.n
        p = KV.block_size
        if want_coarse:
            Ac = KV.coarse_matrix()
    else:
        KV = jnp.asarray(KV)
        n = KV.shape[0]
        p = min(int(args.get("sparse_preconditioner_block_size", 128)), n)
        nb = -(-n // p)
        n_pad = nb * p
        KVp = jnp.zeros((n_pad, n_pad), KV.dtype).at[:n, :n].set(KV)
        K4 = KVp.reshape(nb, p, nb, p)
        blocks = K4[jnp.arange(nb), :, jnp.arange(nb), :]
        if want_coarse:
            Ac = jnp.sum(K4, axis=(1, 3))
    nb = blocks.shape[0]
    blocks = _pad_identity(blocks, n, p)
    L = _shifted_cholesky(blocks, args)
    if want_coarse:
        return L, nb, p, n, Ac
    return L, nb, p, n

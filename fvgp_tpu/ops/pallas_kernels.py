"""Pallas TPU kernels for the two hot ops of the covariance path.

1. ``block_spmv`` — the block-sparse matvec.  The XLA formulation
   (gather -> batched einsum -> segment_sum) materializes a (T, B, k)
   intermediate in HBM; this kernel streams one tile at a time through VMEM
   and accumulates row blocks in place, so HBM traffic is exactly
   tiles + X + out.  Tile indices arrive by scalar prefetch
   (PrefetchScalarGridSpec) so the DMA of the right X/out blocks is issued
   before the body runs.  Requires the tile list sorted by row (the
   assembler emits row-major order); sentinel rows (== nb) are pre-clamped
   by the wrapper — their tiles are zero, so they accumulate nothing.

2. ``dense_covariance`` — fused anisotropic-distance + kernel-polynomial
   evaluation writing K tile by tile, never materializing the (B, B, D)
   broadcast in HBM.

Both fall back to ``interpret=True`` off-TPU so the same code path is
exercised by the CPU test suite.

Measured on v5e (2026-08): XLA's own fusion currently WINS on both ops
(dense cov 8k²: 4.4 ms XLA vs 21 ms Pallas; SpMV T=1600,B=256,k=16:
21 ms vs 30 ms), so the library's default paths stay on the XLA
formulations and these kernels are kept as verified infrastructure for
future tuning (bf16 tile streaming, fused CG step).  Two hardware findings
are load-bearing and documented in the bodies: Mosaic on this libtpu
rejects 64-bit lowering (kernels trace under an x64-off scope), and the
MXU's default bf16 matmul pass cannot be used for distance matrices
(0.25 absolute distance error on the diagonal — kernels use exact
per-dimension differences instead).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["block_spmv", "dense_covariance"]


def _interpret():
    return jax.default_backend() != "tpu"


def _x32_scope():
    """Trace pallas kernels with x64 disabled ON TPU: under global x64,
    weak-typed in-kernel scalars lower to 64-bit ops that this libtpu's
    Mosaic cannot legalize ('failed to legalize func.return').  TPU
    operands are f32/int32, so semantics are unchanged.  Interpret mode
    (CPU tests) keeps the global x64 setting — mixing the scope with f64
    refs would silently downcast stores."""
    import contextlib
    if _interpret():
        return contextlib.nullcontext()
    return jax.enable_x64(False)


# ---------------------------------------------------------------------------
# block-sparse matvec
# ---------------------------------------------------------------------------

def _spmv_kernel(rows_ref, cols_ref, tiles_ref, x_ref, out_ref):
    t = pl.program_id(0)
    row = rows_ref[t]
    first = t == 0
    prev_row = rows_ref[jnp.maximum(t - 1, 0)]
    new_block = jnp.logical_or(first, row != prev_row)

    prod = jnp.dot(tiles_ref[0], x_ref[0], preferred_element_type=out_ref.dtype)

    @pl.when(new_block)
    def _():
        out_ref[0] = prod

    @pl.when(jnp.logical_not(new_block))
    def _():
        out_ref[0] = out_ref[0] + prod


@functools.partial(jax.jit, static_argnames=("nb", "block_size"))
def _block_spmv_call(rows, cols, tiles, Xb, nb, block_size):
    T = tiles.shape[0]
    k = Xb.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, block_size, block_size),
                         lambda t, rows, cols: (t, 0, 0)),
            pl.BlockSpec((1, block_size, k),
                         lambda t, rows, cols: (cols[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_size, k),
                               lambda t, rows, cols: (rows[t], 0, 0)),
    )
    out = pl.pallas_call(
        _spmv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, block_size, k), Xb.dtype),
        interpret=_interpret(),
    )(rows, cols, tiles, Xb)
    return out


def block_spmv(rows, cols, tiles, X, nb, block_size, n=None):
    """y = A @ X for a row-major-sorted tile list.

    Whole-row blocks missing from the tile list come back as whatever the
    kernel never wrote — the wrapper zero-fills them by masking against the
    set of present rows.
    """
    X = jnp.asarray(X)
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    n_pad = nb * block_size
    k = X.shape[1]
    Xp = jnp.zeros((n_pad, k), X.dtype).at[: X.shape[0]].set(X)
    Xb = Xp.reshape(nb, block_size, k)
    rows = jnp.minimum(jnp.asarray(rows, jnp.int32), nb - 1)
    cols = jnp.minimum(jnp.asarray(cols, jnp.int32), nb - 1)
    with _x32_scope():
        out = _block_spmv_call(rows, cols, tiles, Xb, nb, block_size)
    # zero rows that own no tile (uninitialized output blocks)
    present = jnp.zeros((nb,), jnp.bool_).at[rows].set(True)
    out = jnp.where(present[:, None, None], out, 0.0)
    out = out.reshape(n_pad, k)[: X.shape[0] if n is None else n]
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# fused dense covariance assembly
# ---------------------------------------------------------------------------

_SQRT3 = 1.7320508075688772


def _safe_dist(d2):
    pos = d2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)


def _cov_body(poly, ndim):
    """Kernel body: whitened distance by exact per-dimension outer
    differences (2-D broadcasts on the VPU) + kernel polynomial.

    Not the matmul expansion: the MXU's default bf16 pass loses ~8 mantissa
    bits, which turned diagonal distances of 0 into ~0.25 — a 30% kernel
    error.  D is static and tiny for GP index sets, so the unrolled
    difference loop is cheap and exact.  (Mosaic also rejects the
    (B, B, D) broadcast layout, hence 2-D ops only.)
    """

    def body(z1_ref, z2t_ref, var_ref, out_ref):
        z1 = z1_ref[...]                 # (t, d) pre-whitened
        z2t = z2t_ref[...]               # (d, t) pre-whitened, transposed
        d2 = jnp.zeros(out_ref.shape, out_ref.dtype)
        for k in range(ndim):
            diff = z1[:, k:k + 1] - z2t[k:k + 1, :]
            d2 = d2 + diff * diff
        d = _safe_dist(d2)
        out_ref[...] = var_ref[0, 0] * poly(d)

    return body


def _matern32_poly(d):
    a = _SQRT3 * d
    return (1.0 + a) * jnp.exp(-a)


def _wendland_poly(d):
    d = jnp.minimum(d, 1.0)
    return (1.0 - d) ** 8 * (32.0 * d ** 3 + 25.0 * d ** 2 + 8.0 * d + 1.0)


_COV_POLYS = {"matern32": _matern32_poly, "wendland": _wendland_poly}


@functools.partial(jax.jit, static_argnames=("kind", "tile"))
def _dense_cov_call(z1, z2t, var, kind, tile):
    n1, d = z1.shape
    n2 = z2t.shape[1]
    body = _cov_body(_COV_POLYS[kind], d)
    grid = (pl.cdiv(n1, tile), pl.cdiv(n2, tile))
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, tile), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n1, n2), z1.dtype),
        interpret=_interpret(),
    )(z1, z2t, var)


def dense_covariance(x1, x2, hyperparameters, kind="matern32", tile=256):
    """K = k(x1, x2) assembled tile-by-tile with whitening, distance, and
    kernel polynomial fused in VMEM.  hps = [signal variance, l_1..l_D]."""
    x1 = jnp.atleast_2d(jnp.asarray(x1))
    x2 = jnp.atleast_2d(jnp.asarray(x2))
    hps = jnp.asarray(hyperparameters, dtype=x1.dtype)
    ls = hps[1:1 + x1.shape[1]]
    z1 = x1 / ls
    z2t = (x2 / ls).T
    var = hps[:1].reshape(1, 1)
    n1, n2 = x1.shape[0], x2.shape[0]
    t = min(tile, 256)
    p1 = -(-n1 // t) * t
    p2 = -(-n2 // t) * t
    z1p = jnp.zeros((p1, x1.shape[1]), x1.dtype).at[:n1].set(z1)
    z2tp = jnp.zeros((x2.shape[1], p2), x2.dtype).at[:, :n2].set(z2t)
    if z1p.dtype == jnp.float64 and not _interpret():
        # the Mosaic path is f32; f64 interpret-mode (CPU tests) keeps full
        # precision
        z1p = z1p.astype(jnp.float32)
        z2tp = z2tp.astype(jnp.float32)
        var = var.astype(jnp.float32)
    with _x32_scope():
        K = _dense_cov_call(z1p, z2tp, var, kind, t)
    return K[:n1, :n2]

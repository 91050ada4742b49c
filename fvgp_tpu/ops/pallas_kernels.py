"""Pallas TPU kernels for the hot ops of the covariance path.

1. ``chunked_spmm`` — the production block-sparse SpMM for the CG/mBCG
   hot loop when X and the output fit VMEM (see ``chunked_spmm_fits``).
   One grid step processes C tiles with X and the accumulator RESIDENT in
   VMEM, so HBM traffic is exactly the tile stream: no (T, B, k) gather /
   product intermediates exist (the XLA formulation materializes both).
   Measured on the v5e bench shapes (T=4096, B=256, k=17, bf16 tiles):
   0.84 ms vs 1.12 ms XLA — 1.33x; at B=128 both run at the MXU
   weight-pass floor (~136 ns/tile) and the kernel wins 1.22x.
   Differentiable via custom VJP (XLA-einsum backward — the tile-cotangent
   IS a (T, B, B) batched outer product, so there is nothing to fuse).

2. ``block_spmv`` — earlier one-tile-per-step variant (kept as verified
   infrastructure; the per-step fixed cost makes it ~1.3x slower than XLA).

3. ``dense_covariance`` — fused anisotropic-distance + kernel-polynomial
   evaluation writing K tile by tile, never materializing the (B, B, D)
   broadcast in HBM.  XLA's fusion currently wins on this op (4.4 ms vs
   21 ms at 8k²); kept non-default.

All kernels fall back to ``interpret=True`` off-TPU so the same code path
is exercised by the CPU test suite.  Hardware findings that shape the code:
Mosaic on this libtpu rejects 64-bit lowering (kernels trace under an
x64-off scope); scalar-prefetch index arrays live in SMEM and overflow it
beyond ~100k tiles (chunked_spmm therefore feeds rows/cols as (8, C) SMEM
blocks); the MXU's default bf16 matmul pass cannot be used for distance
matrices (0.25 absolute distance error on the diagonal — kernels use exact
per-dimension differences instead).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["block_spmv", "dense_covariance", "chunked_spmm",
           "chunked_spmm_fits", "row_aligned_schedule", "row_chunk_sums"]


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
# chunked SpMM — the production matvec kernel (X/out resident in VMEM)
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 96 * 1024 * 1024       # of the chip's 128 MB VMEM


def chunked_spmm_fits(T, nb, B, k, tile_itemsize=2, C=8):
    """True when X + accumulator + a double-buffered tile chunk fit VMEM
    and the (bucket-padded) tile count divides into (8, C) SMEM blocks.

    VMEM windows are physically padded to the (8, 128) register tile, so
    the MINOR dimension of the (nb, B, k) X/out windows costs
    ``ceil(k/128)*128`` lanes regardless of the logical k — a k=1 matvec
    at nb~8000 is a 512 MB window, not 4 MB (this gate once used logical
    sizes and compiled such a window straight into a VMEM OOM on the
    N=1M posterior path)."""
    k_pad = -(-int(k) // 128) * 128
    b_pad = -(-int(B) // 8) * 8
    vmem = 2 * nb * b_pad * k_pad * 4 + 2 * C * b_pad * b_pad * tile_itemsize
    return vmem <= _VMEM_BUDGET and T % (8 * C) == 0


def _chunked_kernel(C):
    def kernel(rows_ref, cols_ref, tiles_ref, x_ref, out_ref):
        s = pl.program_id(0)
        r = s % 8

        @pl.when(s == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def body(c, _):
            row = rows_ref[r, c]
            col = cols_ref[r, c]
            prod = jnp.dot(tiles_ref[c], x_ref[col],
                           preferred_element_type=jnp.float32)
            out_ref[row] = out_ref[row] + prod
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "B", "k", "C"))
def _chunked_spmm_call(rows2, cols2, tiles, Xb, nb, B, k, C):
    T = tiles.shape[0]
    return pl.pallas_call(
        _chunked_kernel(C),
        grid=(T // C,),
        in_specs=[
            # index arrays as (8, C) SMEM blocks: scalar prefetch would put
            # the whole (T,) array in SMEM, which overflows beyond ~100k
            # tiles
            pl.BlockSpec((8, C), lambda s: (s // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, C), lambda s: (s // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, B, B), lambda s: (s, 0, 0)),
            pl.BlockSpec((nb, B, k), lambda s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, B, k), lambda s: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, B, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * B * k,
            bytes_accessed=T * B * B * tiles.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(rows2, cols2, tiles, Xb)


@functools.lru_cache(maxsize=32)
def _chunked_spmm_factory(nb, B, C, mv_dtype=None):
    """Differentiable chunked SpMM bound to a (nb, B) grid.

    Forward is the Pallas kernel; backward is the plain-XLA einsum pair
    (the tile cotangent IS a (T, B, B) batched outer product written to
    HBM, so a kernel could not reduce its traffic):

        tiles_bar[t] = ybar[rows[t]] · X[cols[t]]ᵀ
        X_bar       = Aᵀ ybar  (segment-sum over cols)
    """

    def _fwd_impl(rows, cols, tiles, X):
        k = X.shape[1]
        if mv_dtype is not None:
            tiles = tiles.astype(mv_dtype)
            Xc = X.astype(mv_dtype)
        else:
            Xc = X
        # (T//C, C) row-major layout; the SMEM (8, C) blocking is done by
        # the BlockSpec index map, not by any regrouping here
        rows2 = rows.reshape(-1, C)
        cols2 = cols.reshape(-1, C)
        with _x32_scope():
            out = _chunked_spmm_call(rows2, cols2, tiles,
                                     Xc.reshape(nb, B, k), nb, B, k, C)
        return out.reshape(nb * B, k).astype(X.dtype)

    @jax.custom_vjp
    def spmm(rows, cols, tiles, X):
        return _fwd_impl(rows, cols, tiles, X)

    def spmm_fwd(rows, cols, tiles, X):
        return _fwd_impl(rows, cols, tiles, X), (rows, cols, tiles, X)

    def spmm_bwd(res, ybar):
        rows, cols, tiles, X = res
        k = X.shape[1]
        acc = X.dtype if X.dtype == jnp.float64 else jnp.float32
        Yb = ybar.reshape(nb, B, k)
        Xb = X.reshape(nb, B, k)
        if mv_dtype is not None:
            Yc, Xc, tc = (Yb.astype(mv_dtype), Xb.astype(mv_dtype),
                          tiles.astype(mv_dtype))
        else:
            Yc, Xc, tc = Yb, Xb, tiles
        tiles_bar = jnp.einsum("tik,tjk->tij", Yc[rows], Xc[cols],
                               preferred_element_type=acc)
        contrib = jnp.einsum("tij,tik->tjk", tc, Yc[rows],
                             preferred_element_type=acc)
        Xbar = jax.ops.segment_sum(contrib, cols, num_segments=nb)
        return (np.zeros(rows.shape, jax.dtypes.float0),
                np.zeros(cols.shape, jax.dtypes.float0),
                tiles_bar.astype(tiles.dtype),
                Xbar.reshape(nb * B, k).astype(X.dtype))

    spmm.defvjp(spmm_fwd, spmm_bwd)
    return spmm


def chunked_spmm(rows, cols, tiles, X, nb, B, mv_dtype=None, C=8):
    """y = A @ X via the VMEM-resident kernel (same contract as the XLA
    ``_spmv``: clamped sentinel indices must carry zero tiles).  Callers
    check :func:`chunked_spmm_fits` first."""
    return _chunked_spmm_factory(nb, B, C, mv_dtype)(rows, cols, tiles, X)


# ---------------------------------------------------------------------------
# row-aligned chunked SpMM — X in HBM (the wide/committed-state matvec)
# ---------------------------------------------------------------------------
#
# The VMEM-resident chunked_spmm needs X AND the accumulator on-chip, which
# caps it at nb*B*k ~ a few MB — useless at N=1M where X alone is GBs.  The
# XLA fallback (_spmv_scan) pays a (chunk, B, c) gather copy, a (chunk, B, c)
# f32 product round-trip to HBM, and a full-size scatter-add — ~2x the
# unavoidable traffic.  The fused path removes the product round-trip and
# shrinks the scatter C-fold:
#
# * the schedule is ROW-ALIGNED (``row_aligned_schedule``): each C-tile
#   chunk's tiles all belong to ONE output row block (rows sorted, each
#   row's tile list padded to a multiple of C with zero sentinel tiles);
# * ``row_chunk_sums`` streams the tiles and the pre-gathered X through
#   VMEM and emits one (B, k) f32 partial PER CHUNK — the (T, B, k)
#   product never exists in HBM;
# * the caller scatter-adds the C×-smaller, row-sorted chunk sums.
#
# The committed-state solver runs this inside a lax.scan over schedule
# slices so the gathered X is bounded to one slice.


def row_aligned_schedule(rows, cols, nb, C=8, chunk_bucket=256):
    """Host helper: regroup a row-sorted tile schedule so every C tiles
    share one output row block.

    Returns ``(rows_p, cols_p, rowsc, n_chunks)``: per-tile indices padded
    per row to a multiple of ``C`` (sentinel ``col == nb`` marks padding —
    the assembler zeroes those tiles), and the per-chunk output row index
    ``rowsc`` (sentinel ``nb`` on trailing bucket-padding chunks, which the
    kernel routes to a dummy output block).  ``n_chunks`` is bucketed to
    multiples of ``chunk_bucket`` so jit caches survive occupancy moves."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    counts = np.bincount(rows, minlength=nb)
    padded = -(-counts // C) * C
    total = int(padded.sum())
    n_chunks = -(-max(total // C, 1) // chunk_bucket) * chunk_bucket
    T_pad = n_chunks * C
    rows_p = np.full(T_pad, nb, np.int32)
    cols_p = np.full(T_pad, nb, np.int32)
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(padded, out=starts[1:])
    # rows are sorted: each row's tiles are one contiguous slice
    src_starts = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=src_starts[1:])
    idx = np.arange(len(rows))
    dst = starts[rows] + (idx - src_starts[rows])
    rows_p[dst] = rows
    cols_p[dst] = cols
    # padded in-row slots keep the row (alignment) with a sentinel col
    pad_rows = np.repeat(np.arange(nb, dtype=np.int32),
                         (padded - counts).astype(np.int64))
    pad_dst = []
    off = starts[:-1] + counts
    for r, extra in zip(*np.unique(pad_rows, return_counts=True)):
        pad_dst.append(np.arange(off[r], off[r] + extra))
    if pad_dst:
        pad_dst = np.concatenate(pad_dst)
        rows_p[pad_dst] = pad_rows
        cols_p[pad_dst] = nb
    rowsc = np.full(n_chunks, nb, np.int32)
    rowsc[: total // C] = np.repeat(np.arange(nb, dtype=np.int32),
                                    (padded // C).astype(np.int64))
    return rows_p, cols_p, rowsc, n_chunks


def _chunk_sums_kernel(C):
    def kernel(tiles_ref, xg_ref, out_ref):
        acc = jnp.dot(tiles_ref[0], xg_ref[0],
                      preferred_element_type=jnp.float32)
        for j in range(1, C):
            acc = acc + jnp.dot(tiles_ref[j], xg_ref[j],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("B", "k", "C"))
def _chunk_sums_call(tiles, Xg, B, k, C):
    n_chunks = tiles.shape[0] // C
    return pl.pallas_call(
        _chunk_sums_kernel(C),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((C, B, B), lambda s: (s, 0, 0)),
            pl.BlockSpec((C, B, k), lambda s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, k), lambda s: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_chunks, B, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tiles.shape[0] * B * B * k,
            bytes_accessed=(tiles.shape[0] * B
                            * (B * tiles.dtype.itemsize
                               + k * Xg.dtype.itemsize)
                            + n_chunks * B * k * 4),
            transcendentals=0),
        interpret=_interpret(),
    )(tiles, Xg)


def row_chunk_sums(tiles, Xg, B, C=8):
    """Per-chunk partial products ``sum_j tiles[s*C+j] @ Xg[s*C+j]`` for a
    row-aligned schedule slice — tiles and the pre-gathered X stream
    through VMEM; the (C·M, B, k) f32 product NEVER round-trips HBM (the
    XLA formulation materializes it).  The caller scatter-adds the
    C×-smaller chunk sums into the row blocks (sorted indices)."""
    k = Xg.shape[2]
    with _x32_scope():
        return _chunk_sums_call(tiles, Xg, B, k, C)


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

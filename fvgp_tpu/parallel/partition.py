"""Row-affinity tile partitioning — the scale path's ownership model.

The block-sparse SpMM is ``segment_sum(tiles[t] @ X[cols[t]], rows[t])``.
With tiles sharded by *list position* alone, every device may contribute to
every output row block, so XLA must all-reduce the full (nb*B, k) product —
``2·(n-1)/n · nb·B·k`` words over ICI per matvec (reduce-scatter +
all-gather), paid tens to hundreds of times per CG/SLQ solve.

Partitioning instead gives device ``d`` exclusive ownership of the
contiguous row-block range ``[d·nb_local, (d+1)·nb_local)`` and places every
tile on its row's owner.  Then each device computes its own output rows
*completely* — no cross-device reduction exists.  The only communication is
making X's column blocks visible (an all-gather of X when it is row-sharded:
``(n-1)/n · nb·B·k`` words — **half** the all-reduce volume), and because
Morton ordering (parallel/ordering.py) makes index-contiguous blocks
spatially compact, a compact-support kernel's tiles reference mostly *local*
column blocks, so the all-gather is the next thing to shrink (halo
exchange); ``schedule_stats`` reports the measured halo fraction.

The reference's analogue is the Dask blockwise task fan-out with host-side
COO assembly (ref gp2Scale_covariance.py:230-307) — ownership there is
whichever worker the scheduler picked, and every matvec runs on the *host*
against the assembled CSR.  Here ownership is static, balanced, and aligned
with the collective structure of the solver.
"""

import numpy as np

__all__ = ["partition_schedule", "schedule_stats", "local_row_blocks"]


def local_row_blocks(nb, n_dev):
    """Row blocks owned per device: ``ceil(nb / n_dev)``.

    The ``shard_map`` training path pads the *point* blocking so ``nb`` is a
    multiple of ``n_dev`` (empty blocks carry mask 0 / unit noise and
    contribute nothing), which makes the row-sharded vectors evenly
    divisible; with an unaligned ``nb`` (GSPMD posterior path) the last
    device simply owns fewer row blocks.
    """
    return -(-nb // n_dev)


def partition_schedule(rows, cols, nb, n_dev, pad_to=None):
    """Reorder a tile schedule so position-sharding equals row ownership.

    rows/cols: (T,) int32 tile block indices (mirrors included; sentinel
    entries ``rows == nb`` are dropped — padding is re-created per device).
    Returns ``(rows_out, cols_out, perm, per_dev)`` where the output arrays
    have length ``per_dev * n_dev``; positions ``[d*per_dev, (d+1)*per_dev)``
    hold exactly the tiles whose row block lies in device ``d``'s range,
    sentinel-padded (``rows == nb``) at each segment's tail.  ``perm`` maps
    output position -> input tile index (-1 for padding), so tile buffers
    assembled in input order can be permuted identically.

    ``pad_to`` (optional) rounds the per-device count up (e.g. a jit-cache
    bucket) — it must be >= the largest per-device count.
    """
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    nb_local = local_row_blocks(nb, n_dev)
    live = np.nonzero(rows < nb)[0]
    owner = np.minimum(rows[live] // nb_local, n_dev - 1)
    counts = np.bincount(owner, minlength=n_dev)
    per_dev = int(counts.max()) if len(live) else 1
    if pad_to is not None:
        if pad_to < per_dev:
            raise ValueError(f"pad_to={pad_to} < max per-device count {per_dev}")
        per_dev = int(pad_to)
    T_out = per_dev * n_dev
    rows_out = np.full(T_out, nb, np.int32)
    cols_out = np.full(T_out, nb, np.int32)
    perm = np.full(T_out, -1, np.int64)
    # stable order within each device keeps the (row-major) input locality
    order = np.argsort(owner, kind="stable")
    src = live[order]
    owner_sorted = owner[order]
    offsets = np.zeros(n_dev + 1, np.int64)
    offsets[1:] = np.cumsum(counts)
    within = np.arange(len(src)) - offsets[owner_sorted]
    dest = owner_sorted * per_dev + within
    rows_out[dest] = rows[src]
    cols_out[dest] = cols[src]
    perm[dest] = src
    return rows_out, cols_out, perm, per_dev


def schedule_stats(rows, cols, nb, n_dev, block_size, n_rhs=1, elt_bytes=4):
    """Ownership-balance and communication-volume diagnostics.

    Per matvec of ``n_rhs`` columns (words -> bytes via ``elt_bytes``):

    * ``allreduce_bytes``  — position sharding, GSPMD all-reduce of the full
      output: ``2 (n-1)/n · nb·B·k``.
    * ``allgather_bytes``  — row ownership, X row-sharded then all-gathered:
      ``(n-1)/n · nb·B·k``.
    * ``halo_bytes``       — row ownership + halo exchange (each device
      fetches only the distinct non-local column blocks its tiles touch);
      the lower bound the current all-gather leaves on the table.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    live = rows < nb
    rows = rows[live]
    cols = cols[live]
    nb_local = local_row_blocks(nb, n_dev)
    owner = np.minimum(rows // nb_local, n_dev - 1)
    counts = np.bincount(owner, minlength=n_dev).astype(np.int64)
    total = int(counts.sum())
    mean = total / n_dev if n_dev else 0.0
    B = block_size
    word = B * n_rhs * elt_bytes
    halo_blocks = 0
    local_tiles = 0
    for d in range(n_dev):
        sel = owner == d
        c = cols[sel]
        in_range = (c >= d * nb_local) & (c < (d + 1) * nb_local)
        local_tiles += int(np.sum(in_range))
        halo_blocks += len(np.unique(c[~in_range]))
    frac = (n_dev - 1) / n_dev if n_dev > 1 else 0.0
    return {
        "n_dev": n_dev,
        "tiles_per_device": counts.tolist(),
        "balance": float(counts.max() / mean) if total else 1.0,
        "local_tile_fraction": local_tiles / total if total else 1.0,
        "halo_col_blocks": halo_blocks,
        "allreduce_bytes": int(2 * frac * nb * word),
        "allgather_bytes": int(frac * nb * word),
        "halo_bytes": int(halo_blocks * word),
    }

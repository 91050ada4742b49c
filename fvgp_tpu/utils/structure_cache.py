"""Disk persistence for the gp2Scale structure pass.

The host-side structure pass — Morton permutation, box-prune candidate
pairs, exact tile-liveness masks — is a pure function of (dataset bytes,
block size, support geometry) and costs seconds at N ~ 1M, recomputed by
every process (round-4 verdict, missing #4).  The reference demonstrates
the cure in-repo: GGMP's content-hash npz cache with atomic saves
(ref ggmp.py:1781-1988, atomic replace :2025).  This module applies that
pattern to the structure pass.

Entries are content-addressed — the blake2b of the exact inputs is the
filename — so a stale hit is impossible: different data, lengthscales,
radius, or block size hash to a different file.  Writes go through a
process-unique temp file + ``os.replace`` so concurrent processes never
read a torn entry.  Every failure path degrades to recomputation; the
cache can never sink a computation.

Enabled by default next to the JAX executable cache
(``~/.cache/fvgp_tpu_structure``); opt out with
``FVGP_TPU_STRUCTURE_CACHE=0``, redirect with
``FVGP_TPU_STRUCTURE_CACHE_DIR``, or override per-GP with
``args['gp2Scale_structure_cache_dir']`` (a path, or ``False`` to
disable for one model).
"""

import hashlib
import os

import numpy as np

# Producer-schema token, hashed into every key: the cached artifacts are
# OUTPUTS of morton_order / _candidate_pairs / tile_live, so a semantic
# change to any producer must orphan old entries even though the inputs
# hash identically.  Bump on any such change.
_SCHEMA = b"fvgp-tpu-structure-v1|"

# Directory size cap (bytes): stores during a long training run (every
# >5%-drift lengthscale move writes fresh candidates/liveness entries
# that are rarely re-hit) must not grow the user's cache without bound.
# Oldest-mtime entries are evicted after each store.
_DEFAULT_MAX_BYTES = 2 << 30


def cache_dir(args=None):
    """Resolved cache directory, or None when disabled.  The per-GP args
    key wins over the environment (so tests can pin a tmp dir even with
    the global kill switch set)."""
    if args is not None and "gp2Scale_structure_cache_dir" in args:
        d = args["gp2Scale_structure_cache_dir"]
        return str(d) if d else None
    if os.environ.get("FVGP_TPU_STRUCTURE_CACHE", "1") == "0":
        return None
    return os.environ.get(
        "FVGP_TPU_STRUCTURE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "fvgp_tpu_structure"))


def content_key(*parts):
    """blake2b-128 hex over a mixed stream of arrays and plain values.
    Arrays contribute bytes + dtype + shape (a transposed or re-typed
    array must not collide)."""
    h = hashlib.blake2b(digest_size=16)
    h.update(_SCHEMA)
    for p in parts:
        if isinstance(p, np.ndarray):
            h.update(np.ascontiguousarray(p).tobytes())
            h.update(str(p.dtype).encode())
            h.update(str(p.shape).encode())
        else:
            h.update(repr(p).encode())
        h.update(b"|")
    return h.hexdigest()


def load(dirpath, name, key):
    """The stored arrays as a dict, or None (miss / disabled / unreadable)."""
    if not dirpath:
        return None
    path = os.path.join(dirpath, f"{name}-{key}.npz")
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None


def store(dirpath, name, key, **arrays):
    """Atomic content-addressed save; failures are swallowed (the caller
    already holds the computed result).  After a successful save the
    directory is pruned oldest-first to the size cap
    (``FVGP_TPU_STRUCTURE_CACHE_MAX_BYTES``, default 2 GiB)."""
    if not dirpath:
        return
    tmp = None
    try:
        os.makedirs(dirpath, exist_ok=True)
        path = os.path.join(dirpath, f"{name}-{key}.npz")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
        _evict(dirpath, keep=path)
    except Exception:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass


def _evict(dirpath, keep=None):
    """Delete oldest-mtime entries until the directory fits the cap.
    Concurrent readers of a deleted entry degrade to a miss (load()
    swallows the error and the caller recomputes)."""
    try:
        cap = int(os.environ.get("FVGP_TPU_STRUCTURE_CACHE_MAX_BYTES",
                                 _DEFAULT_MAX_BYTES))
        entries = []
        total = 0
        with os.scandir(dirpath) as it:
            for e in it:
                if not e.name.endswith(".npz"):
                    continue
                st = e.stat()
                entries.append((st.st_mtime, st.st_size, e.path))
                total += st.st_size
        if total <= cap:
            return
        for _, size, p in sorted(entries):
            if p == keep:
                continue
            try:
                os.unlink(p)
                total -= size
            except OSError:
                pass
            if total <= cap:
                return
    except Exception:
        pass

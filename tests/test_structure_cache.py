"""Disk persistence of the gp2Scale structure pass (utils/structure_cache).

The Morton permutation, box-prune candidate pairs, and exact tile-liveness
masks are pure functions of (dataset bytes, block size, support geometry);
the content-addressed npz cache (the reference's GGMP cache pattern,
ref ggmp.py:1781-1988) makes repeat cold starts I/O instead of recompute.
These tests pin a tmp cache dir per model via
``args['gp2Scale_structure_cache_dir']`` (the suite-wide kill switch
``FVGP_TPU_STRUCTURE_CACHE=0`` is set in conftest.py)."""

import os
import warnings

import numpy as np
import pytest

from fvgp_tpu import GP
from fvgp_tpu.utils import structure_cache as sc

warnings.simplefilter("ignore")

HPS = np.array([1.0, 1.5, 1.5])


def _data(n=800, span=40.0, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, span, (n, 2))
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(n)
    return x, y


def _args(tmp_path, **extra):
    a = {"gp2Scale_block_size": 128,
         "gp2Scale_structure_cache_dir": str(tmp_path)}
    a.update(extra)
    return a


def _files(tmp_path, prefix):
    return sorted(p for p in os.listdir(tmp_path)
                  if p.startswith(prefix + "-") and p.endswith(".npz"))


# ---------------------------------------------------------------------------
# unit: resolution, keys, atomic store/load
# ---------------------------------------------------------------------------

def test_cache_dir_resolution(tmp_path, monkeypatch):
    # suite env kill switch is on: default resolution is disabled
    assert sc.cache_dir(None) is None
    assert sc.cache_dir({}) is None
    # per-model args win over the environment, both ways
    assert sc.cache_dir({"gp2Scale_structure_cache_dir": str(tmp_path)}) \
        == str(tmp_path)
    assert sc.cache_dir({"gp2Scale_structure_cache_dir": False}) is None
    # env-enabled default lands next to the user cache dir
    monkeypatch.setenv("FVGP_TPU_STRUCTURE_CACHE", "1")
    assert sc.cache_dir(None).endswith("fvgp_tpu_structure")
    monkeypatch.setenv("FVGP_TPU_STRUCTURE_CACHE_DIR", str(tmp_path))
    assert sc.cache_dir(None) == str(tmp_path)


def test_content_key_sensitivity():
    a = np.arange(6, dtype=np.float64)
    base = sc.content_key("k", a, 128, 1.5)
    assert sc.content_key("k", a, 128, 1.5) == base          # deterministic
    assert sc.content_key("k", a + 1, 128, 1.5) != base      # value
    assert sc.content_key("k", a.astype(np.float32), 128, 1.5) != base  # dtype
    assert sc.content_key("k", a.reshape(2, 3), 128, 1.5) != base       # shape
    assert sc.content_key("k", a, 64, 1.5) != base           # scalar part
    assert sc.content_key("other", a, 128, 1.5) != base      # namespace


def test_store_load_roundtrip_and_corruption(tmp_path):
    d = str(tmp_path)
    key = sc.content_key("t", np.ones(3))
    assert sc.load(d, "t", key) is None                      # miss
    sc.store(d, "t", key, rows=np.arange(5, dtype=np.int32),
             keep=np.array([True, False]))
    hit = sc.load(d, "t", key)
    np.testing.assert_array_equal(hit["rows"], np.arange(5))
    np.testing.assert_array_equal(hit["keep"], [True, False])
    # a torn/corrupt entry degrades to a miss, never an exception
    with open(os.path.join(d, f"t-{key}.npz"), "wb") as f:
        f.write(b"not an npz")
    assert sc.load(d, "t", key) is None
    # disabled dir: both ends are no-ops
    assert sc.load(None, "t", key) is None
    sc.store(None, "t", key, rows=np.arange(2))
    # unusable dir (an existing plain file): store swallows the failure
    blocked = os.path.join(d, "file-not-dir")
    open(blocked, "w").close()
    sc.store(blocked, "t", key, rows=np.arange(2))
    assert sc.load(blocked, "t", key) is None


# ---------------------------------------------------------------------------
# end-to-end: LML structure pass (Morton + candidates + liveness)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lml_structure_pass_cached_and_reused(tmp_path, monkeypatch):
    x, y = _data()
    gp1 = GP(x, y, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre", args=_args(tmp_path))
    lml1 = gp1.log_likelihood()
    assert _files(tmp_path, "morton")
    assert _files(tmp_path, "candidates")
    assert _files(tmp_path, "liveness")

    # second cold model on the same data: the host structure pass must be
    # pure I/O — recomputation is made impossible, not just unlikely
    import fvgp_tpu.native as native
    import fvgp_tpu.parallel.ordering as ordering
    import fvgp_tpu.parallel.sharded_cov as shc

    def _boom(*a, **k):
        raise AssertionError("structure recomputed despite disk cache")

    monkeypatch.setattr(ordering, "morton_order", _boom)
    monkeypatch.setattr(shc, "_candidate_pairs", _boom)
    monkeypatch.setattr(native, "tile_live", _boom)
    gp2 = GP(x, y, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre", args=_args(tmp_path))
    lml2 = gp2.log_likelihood()
    np.testing.assert_allclose(lml2, lml1, rtol=1e-10)


@pytest.mark.slow
def test_different_data_never_hits(tmp_path, monkeypatch):
    x, y = _data(seed=3)
    gp1 = GP(x, y, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre", args=_args(tmp_path))
    gp1.log_likelihood()
    n_before = len(os.listdir(tmp_path))
    # a different point cloud must MISS (content-addressed keys) and write
    # fresh entries rather than reusing another dataset's structure
    x2, y2 = _data(seed=11)
    gp2 = GP(x2, y2, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre", args=_args(tmp_path))
    lml2 = gp2.log_likelihood()
    assert len(os.listdir(tmp_path)) > n_before
    # parity with a cache-free model on the same data
    gp3 = GP(x2, y2, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre",
             args={"gp2Scale_block_size": 128,
                   "gp2Scale_structure_cache_dir": False})
    np.testing.assert_allclose(lml2, gp3.log_likelihood(), rtol=1e-10)


# ---------------------------------------------------------------------------
# end-to-end: posterior-only process (GPkv._tile_structure)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_posterior_only_structure_cached(tmp_path, monkeypatch):
    x, y = _data()
    xp = np.random.default_rng(7).uniform(0, 40, (9, 2))
    gp1 = GP(x, y, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre", args=_args(tmp_path))
    m1 = gp1.posterior_mean(xp)["m(x)"]
    assert _files(tmp_path, "tile_structure"), \
        "committed-solver structure pass did not persist"

    # fresh posterior-only model: assembly runs (kernel tiles are data),
    # but the committed solver's structure pass must be a disk hit
    gp2 = GP(x, y, init_hyperparameters=HPS, gp2Scale=True,
             linalg_mode="sparseCGpre", args=_args(tmp_path))
    import fvgp_tpu.parallel.sharded_cov as shc
    real = shc._candidate_pairs

    def _counting(*a, **k):
        _counting.calls += 1
        return real(*a, **k)
    _counting.calls = 0
    monkeypatch.setattr(shc, "_candidate_pairs", _counting)
    m2 = gp2.posterior_mean(xp)["m(x)"]
    assert _counting.calls == 0, "posterior structure recomputed"
    np.testing.assert_allclose(m2, m1, rtol=1e-8)


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------

def test_non_euclidean_writes_nothing(tmp_path):
    """Arbitrary-object inputs have no canonical byte form — content_token
    is None and the disk layer must stay silent (a repr-of-None key would
    collide across datasets)."""
    from fvgp_tpu.models.gp_data import GPdata
    x = [["a", 1], ["b", 2], ["c", 3]]
    d = GPdata(x, np.array([1.0, 2.0, 3.0]),
               args={"gp2Scale_structure_cache_dir": str(tmp_path)})
    assert not d.Euclidean
    assert d.content_token is None
    assert os.listdir(tmp_path) == []


def test_content_token_tracks_generation(tmp_path):
    from fvgp_tpu.models.gp_data import GPdata
    x, y = _data(n=50)
    d = GPdata(x, y)
    t0 = d.content_token
    assert t0 is not None and t0 == d.content_token     # stable
    d.update(np.vstack([x, x[:1] + 100.0]),
             np.concatenate([y, [0.0]]), append=False)
    assert d.content_token != t0                        # new bytes, new token

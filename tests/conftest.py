"""Test environment: pure-CPU JAX with x64 and a virtual 8-device mesh.

* ``PALLAS_AXON_POOL_IPS`` is cleared BEFORE jax loads so the axon
  sitecustomize does not claim the TPU relay for every test process
  (the claim serializes across processes and costs ~35 s of startup).
* ``JAX_PLATFORMS=cpu`` + ``xla_force_host_platform_device_count=8`` gives
  an 8-device CPU mesh — the in-process "cluster fixture" that replaces the
  reference's in-process Dask cluster (SURVEY.md §4).
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent compile cache under tests: CPU AOT entries record the
# compile machine's feature set and loading them on a different host can
# SIGILL (XLA logs cpu_aot_loader feature-mismatch errors); every test
# program is cheap to recompile
os.environ.setdefault("FVGP_TPU_COMPILE_CACHE", "0")
# hermetic suite: no shared on-disk structure cache (targeted tests opt in
# per-model via args['gp2Scale_structure_cache_dir'] pointed at a tmp dir)
os.environ.setdefault("FVGP_TPU_STRUCTURE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter startup, which freezes
# JAX_PLATFORMS before this file runs — override through the live config
# (backends have not been initialized yet at collection time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# optional line-coverage measurement (the image has no coverage.py):
#   FVGP_COV=1 python -m pytest tests -q     (or `make coverage`)
if os.environ.get("FVGP_COV") == "1":
    import sys
    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _root not in sys.path:
        sys.path.insert(0, _root)
    from tools.stdlib_cov import install as _cov_install
    _cov_install()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_dataset(n=60, d=2, seed=0, noisy=True):
    r = np.random.default_rng(seed)
    x = r.uniform(0.0, 10.0, (n, d))
    y = np.sin(x[:, 0]) + np.cos(0.5 * x[:, min(1, d - 1)])
    if noisy:
        y = y + 0.05 * r.standard_normal(n)
    return x, y


@pytest.fixture
def small_data():
    return make_dataset()

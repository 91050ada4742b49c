"""Precision/device policy seams (fvgp_tpu.config).

The reference is float64 numpy everywhere; this build routes every dtype
decision through config (ref gp_lin_alg.py module docstring).  These tests
pin the override priority chain and the import-time compile-cache wiring.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from fvgp_tpu import config


def test_forced_linalg_dtype_priority_chain():
    """Priority: per-GP args['dtype'] > global set_linalg_dtype > backend
    default (f64 on CPU with x64 on)."""
    assert config.linalg_dtype() == jnp.dtype(jnp.float64)      # CPU suite
    try:
        config.set_linalg_dtype("float32")
        assert config.linalg_dtype() == jnp.dtype(jnp.float32)
        assert config.linalg_dtype({"dtype": "float64"}) == \
            jnp.dtype(jnp.float64)
        # kernel dtype falls back to the (forced) linalg dtype
        assert config.kernel_compute_dtype() == jnp.dtype(jnp.float32)
        assert config.kernel_compute_dtype({"kernel_dtype": "bfloat16"}) \
            == jnp.dtype(jnp.bfloat16)
    finally:
        config.set_linalg_dtype(None)
    assert config.linalg_dtype() == jnp.dtype(jnp.float64)


def test_asarray_int_passthrough_and_to_numpy_upcast():
    """Integer arrays keep their dtype through config.asarray; user-facing
    to_numpy upcasts reduced-precision floats to float64."""
    ints = config.asarray(np.arange(4, dtype=np.int32))
    assert jnp.issubdtype(ints.dtype, jnp.integer)
    out = config.to_numpy(jnp.asarray(np.array([1.5], np.float32)))
    assert out.dtype == np.float64 and out[0] == 1.5


def test_compile_cache_wiring_in_fresh_process(tmp_path):
    """With a non-CPU-pinned env, importing fvgp_tpu points the XLA
    persistent compile cache at FVGP_TPU_COMPILE_CACHE_DIR and sets the
    3 s min-compile-time bar (the large-N time-to-first-gradient lever;
    config.py:27-48)."""
    cache = tmp_path / "cc"
    env = dict(os.environ, FVGP_TPU_COMPILE_CACHE_DIR=str(cache),
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="",
               FVGP_TPU_COMPILE_CACHE="1")   # conftest pins it to 0
    code = ("import fvgp_tpu, jax; "
            "print(jax.config.jax_compilation_cache_dir); "
            "print(jax.config.jax_persistent_cache_min_compile_time_secs)")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert lines[-2] == str(cache)
    assert float(lines[-1]) == 3.0
    assert cache.is_dir()


def test_compile_cache_disabled_when_cpu_pinned(tmp_path):
    """A CPU-pinned env must NOT enable the disk cache (XLA:CPU AOT
    entries record the compile machine's features; loading one on another
    host risks SIGILL)."""
    cache = tmp_path / "cc2"
    env = dict(os.environ, FVGP_TPU_COMPILE_CACHE_DIR=str(cache),
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    code = ("import fvgp_tpu, jax; "
            "print(repr(jax.config.jax_compilation_cache_dir))")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().splitlines()[-1] in ("None", "''")
    assert not cache.exists()

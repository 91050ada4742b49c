import time, warnings, traceback
warnings.simplefilter("ignore")
import numpy as np
import jax, jax.numpy as jnp
import fvgp_tpu
from fvgp_tpu.kernels import wendland_anisotropic
from fvgp_tpu.ops.sparse_lml import make_padded_inputs, assemble_tiles
from fvgp_tpu.ops.pallas_kernels import chunked_spmm
from fvgp_tpu.parallel.ordering import morton_order
from fvgp_tpu.parallel.sharded_cov import _candidate_pairs
from fvgp_tpu.native import tile_live

N, D, B = 50_000, 3, 256
rng = np.random.default_rng(0)
span = (N * 4.19 / 40.0) ** (1.0 / 3.0)
x = rng.uniform(0, span, (N, D)); x = x[morton_order(x)]
y = np.sin(x[:, 0])
hps = np.array([1.0, 1.0, 1.0, 1.0])
rows, cols = _candidate_pairs(x, None, hps[1:], 1.0, B, symmetric=True)
off = rows < cols
rows_f = np.concatenate([rows, cols[off]]).astype(np.int32)
cols_f = np.concatenate([cols, rows[off]]).astype(np.int32)
keep = tile_live(x / hps[1:], rows_f, cols_f, B, 1.0)
rows_f = rows_f[keep]; cols_f = cols_f[keep]
nb = -(-N // B)
xb, mask, *_ , = make_padded_inputs(x, y, np.full(N,1e-2), B, dtype=jnp.float32)
tiles = assemble_tiles(wendland_anisotropic, xb, mask,
                       jnp.asarray(rows_f), jnp.asarray(cols_f),
                       jnp.asarray(hps, jnp.float32)).astype(jnp.bfloat16)
X = jax.random.normal(jax.random.PRNGKey(1), (nb * 256, 17), jnp.float32)
r_d = jnp.asarray(rows_f); c_d = jnp.asarray(cols_f)

def bench_C(C):
    def mv_loop(n_iter):
        @jax.jit
        def f(X, tiles, r_d, c_d):
            def body(i, Xc):
                out = chunked_spmm(r_d, c_d, tiles, Xc, nb, 256,
                                   mv_dtype=jnp.bfloat16, C=C)
                s = jnp.asarray(1.0, X.dtype) - jnp.asarray(
                    1e-12, X.dtype) * i.astype(X.dtype)
                return out * s
            return jax.lax.fori_loop(0, n_iter, body, X).sum()
        return f
    f2, f22 = mv_loop(2), mv_loop(22)
    a = (X, tiles, r_d, c_d)
    float(f2(*a)); float(f22(*a))
    best = np.inf
    for _ in range(3):
        t0=time.time(); float(f2(*a)); ta=time.time()-t0
        t0=time.time(); float(f22(*a)); tb=time.time()-t0
        best = min(best, (tb-ta)/20.0)
    GBps = tiles.size * 2 / best / 1e9
    print(f"C={C}: {best*1000:.3f} ms/matvec ({GBps:.0f} GB/s tile stream)", flush=True)

for C in (8, 16, 32):
    try:
        bench_C(C)
    except Exception:
        traceback.print_exc()
print("C SWEEP DONE", flush=True)

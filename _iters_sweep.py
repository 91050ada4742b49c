import time, warnings, traceback
warnings.simplefilter("ignore")
import numpy as np
import jax, jax.numpy as jnp
import fvgp_tpu
from fvgp_tpu.kernels import wendland_anisotropic
from fvgp_tpu.ops.sparse_lml import make_sparse_lml, make_padded_inputs
from fvgp_tpu.parallel.ordering import morton_order
from fvgp_tpu.parallel.sharded_cov import _candidate_pairs
from fvgp_tpu.native import tile_live

N, D, B = 50_000, 3, 256
rng = np.random.default_rng(0)
span = (N * 4.19 / 40.0) ** (1.0 / 3.0)
x = rng.uniform(0, span, (N, D)); x = x[morton_order(x)]
y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(N)
hps = np.array([1.0, 1.0, 1.0, 1.0]); noise = np.full(N, 1e-2)
rows, cols = _candidate_pairs(x, None, hps[1:], 1.0, B, symmetric=True)
off = rows < cols
rows_f = np.concatenate([rows, cols[off]]).astype(np.int32)
cols_f = np.concatenate([cols, rows[off]]).astype(np.int32)
keep = tile_live(x / hps[1:], rows_f, cols_f, B, 1.0)
rows_f = rows_f[keep]; cols_f = cols_f[keep]
nb = -(-N // B)
xb, mask, y_pad, ypad_mask, noise_pad = make_padded_inputs(x, y, noise, B, dtype=jnp.float32)
Z = jax.random.rademacher(jax.random.PRNGKey(0), (nb * B, 16), jnp.float32) * ypad_mask[:, None]
hps_j = jnp.asarray(hps, jnp.float32)
args = (jnp.asarray(rows_f), jnp.asarray(cols_f), xb, mask, y_pad, ypad_mask, noise_pad, Z)

def run(iters, width, sdt=jnp.bfloat16):
    lml = make_sparse_lml(wendland_anisotropic, nb, B, cg_iters=iters,
                          slq_degree=16, solver_dtype=sdt, solver="mbcg",
                          precond_width=width)
    def chain(n):
        @jax.jit
        def f(h, *a):
            def step(carry, _):
                h, acc = carry
                v, g = jax.value_and_grad(lml)(h, *a)
                h2 = h * (1.0 + 1e-9 * jnp.tanh(g * 1e-6))
                return (h2, acc + v), None
            (hf, acc), _ = jax.lax.scan(step, (h, 0.0), None, length=n)
            return acc
        return f
    c2, c12 = chain(2), chain(12)
    float(c2(hps_j, *args)); float(c12(hps_j, *args))
    best = np.inf
    for _ in range(2):
        t0=time.time(); float(c2(hps_j, *args)); ta=time.time()-t0
        t0=time.time(); float(c12(hps_j, *args)); tb=time.time()-t0
        best = min(best, (tb-ta)/10.0)
    vg = jax.jit(jax.value_and_grad(lml))
    v, g = vg(hps_j, *args)
    return float(v), np.asarray(g, np.float64), best

v_ref, g_ref, _ = run(128, 1, sdt=None)
print(f"ref: lml={v_ref:.2f}", flush=True)
for iters in (48, 32, 24):
    for width in (1, 2):
        try:
            v, g, dt = run(iters, width)
            dv = abs(v - v_ref)/abs(v_ref)
            dg = np.max(np.abs(g - g_ref)/np.maximum(np.abs(g_ref), 1e-3))
            print(f"iters={iters} width={width}: {dt*1000:.1f} ms/eval "
                  f"({1/dt:.2f}/s) dlml={dv:.2e} dgrad={dg:.2e}", flush=True)
        except Exception:
            traceback.print_exc()
print("ITERS SWEEP DONE", flush=True)

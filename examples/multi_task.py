"""BASELINE config 2 — multi-task fvGP with a task-aware kernel (the
reference's MultiTaskTest.ipynb workflow, synthetic climate-like data)."""
import os as _os, sys as _sys
# runnable from a bare checkout: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fvgp_tpu import fvGP
from fvgp_tpu.kernels import get_anisotropic_distance_matrix, matern_kernel_diff1


def mt_kernel(x1, x2, hps):
    """Task-aware kernel over the augmented index set: a spatial Matérn
    times an exponential task-similarity factor — the shape of the
    reference's mt_climate_kernel."""
    import jax.numpy as jnp
    d_space = get_anisotropic_distance_matrix(x1[:, :-1], x2[:, :-1], hps[1:-1])
    d_task = jnp.abs(x1[:, -1][:, None] - x2[:, -1][None, :])
    return hps[0] * matern_kernel_diff1(d_space, 1.0) * jnp.exp(-d_task / hps[-1])


def main():
    rng = np.random.default_rng(1)
    # "stations" with three correlated measurement channels; one channel
    # has gaps (NaN)
    x = rng.uniform(0, 5, (60, 2))
    base = np.sin(x[:, 0]) + 0.3 * np.cos(2 * x[:, 1])
    y = np.stack([base, 0.8 * base + 0.1, base ** 2], axis=1)
    y += 0.02 * rng.standard_normal(y.shape)
    y[rng.choice(60, 10, replace=False), 2] = np.nan        # missing task

    f = fvGP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0, 1.0]),
             kernel_function=mt_kernel)
    print("points in the augmented index set:", f.data.point_number)
    bounds = np.array([[0.01, 10.0], [0.1, 10.0], [0.1, 10.0], [0.1, 10.0]])
    f.train(method="local", hyperparameter_bounds=bounds, max_iter=100)
    print("trained hps:", f.hyperparameters, "LML:", f.log_likelihood())

    res = f.posterior_mean(x[:5], x_out=np.arange(3.0))
    print("posterior mean (5 points x 3 tasks):\n", np.round(res["m(x)"], 3))
    cov = f.posterior_covariance(x[:3], x_out=np.arange(3.0))
    print("S shape (task-major):", cov["S"].shape)


if __name__ == "__main__":
    main()

"""BASELINE config 1 — 1-D single-task GP, N~100, Matérn kernel + noise,
MAP training (the reference's SingleTaskTest.ipynb workflow)."""
import os as _os, sys as _sys
# runnable from a bare checkout: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fvgp_tpu import GP


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, (100, 1))
    y = np.sin(x[:, 0]) * np.exp(-0.1 * x[:, 0]) + 0.03 * rng.standard_normal(100)

    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]))
    print("initial LML:", gp.log_likelihood())
    gp.train(method="local", max_iter=200)
    print("trained hps:", gp.hyperparameters, "LML:", gp.log_likelihood())

    x_pred = gp.make_1d_x_pred([0, 10], res=200)
    mean = gp.posterior_mean(x_pred)["m(x)"]
    var = gp.posterior_covariance(x_pred)["v(x)"]
    truth = np.sin(x_pred[:, 0]) * np.exp(-0.1 * x_pred[:, 0])
    print("RMSE:", gp.rmse(x_pred, truth))
    print("R2:", gp.r2(x_pred, truth))
    print("95% coverage:", gp.picp(x_pred, truth))
    print("CRPS:", gp.crps(x_pred, truth))
    return mean, var


if __name__ == "__main__":
    main()

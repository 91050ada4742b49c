"""BASELINE config 4 — deep-kernel GP: an MLP warps the inputs of a
stationary kernel; the flattened weights ride in the hyperparameter vector
and train by multi-start (`method='hgdl'`), with every gradient supplied by
autodiff through the marginal likelihood."""
import os as _os, sys as _sys
# runnable from a bare checkout: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fvgp_tpu import GP
from fvgp_tpu.models.deep_kernel_network import WarpNet, make_deep_kernel


def main():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 2, (80, 2))
    y = np.sin(4 * x[:, 0] * x[:, 1])          # multiplicative structure

    net = WarpNet(2, 4, 4, 2)
    kernel = make_deep_kernel(net)
    init = np.concatenate([0.3 * rng.standard_normal(net.number_of_hps),
                           [1.0, 1.0]])
    gp = GP(x, y, init_hyperparameters=init, kernel_function=kernel)
    print("hyperparameters (MLP weights + kernel):", len(init),
          "| traceable:", gp.prior.kernel_traceable)
    print("initial LML:", gp.log_likelihood())

    bounds = np.vstack([np.tile([-3.0, 3.0], (net.number_of_hps, 1)),
                        [[0.01, 10.0], [0.1, 10.0]]])
    gp.train(method="hgdl", hyperparameter_bounds=bounds, pop_size=8,
             max_iter=100)
    print("trained LML:", gp.log_likelihood())
    xp = rng.uniform(0, 2, (10, 2))
    pred = gp.posterior_mean(xp)["m(x)"]
    print("pred vs truth RMSE:",
          float(np.sqrt(np.mean((pred - np.sin(4 * xp[:, 0] * xp[:, 1])) ** 2))))


if __name__ == "__main__":
    main()

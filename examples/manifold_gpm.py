"""GPm — multi-output GP regression on a learned linear manifold
(parity target: the reference's unreleased dev/gpm.py:20).

A 6-D input whose outputs really depend on one latent direction: GPm learns
the embedding jointly with the kernel hyperparameters by Adam on the jitted
trace-form marginal likelihood, then predicts all outputs with one shared
solve."""
import os as _os, sys as _sys
# runnable from a bare checkout: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fvgp_tpu import GPm


def main():
    rng = np.random.default_rng(3)
    n, d = 150, 6
    x = rng.uniform(-2, 2, (n, d))
    w_true = np.array([1.0, -0.5, 0.25, 0.0, 0.0, 0.0])
    t = x @ w_true
    y = np.stack([np.sin(t), np.cos(t), 0.5 * t], axis=1)
    y += 0.02 * rng.standard_normal(y.shape)

    m = GPm(x, y, manifold_dim=1)
    print("initial LML:", round(m.log_likelihood(), 2))
    m.train(max_iter=400, learning_rate=5e-2)
    print("trained LML:", round(m.log_likelihood(), 2))

    w_learned = np.asarray(m.W)[:, 0]
    cos = abs(w_true @ w_learned) / (np.linalg.norm(w_true)
                                     * np.linalg.norm(w_learned))
    print("alignment with the generating direction:", round(float(cos), 4))

    x_test = rng.uniform(-2, 2, (20, d))
    y_test = np.stack([np.sin(x_test @ w_true), np.cos(x_test @ w_true),
                       0.5 * (x_test @ w_true)], axis=1)
    pm = m.posterior_mean(x_test)
    pv = m.posterior_variance(x_test)
    print("test RMSE:", round(float(np.sqrt(np.mean((pm - y_test) ** 2))), 4),
          "| mean posterior sd:", round(float(np.sqrt(pv.mean())), 4))


if __name__ == "__main__":
    main()

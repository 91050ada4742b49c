"""GGMP-on-fvGP — multi-task distributional regression (beyond the
reference, whose GGMP is single-task; ref fvgp/ggmp.py:40).

Every station observes one probability density PER OUTPUT CHANNEL; the
mixture components are multi-task fvGP GPs over the task-augmented index
set, trained per-component and re-weighted by EM against the observed
densities."""
import os as _os, sys as _sys
# runnable from a bare checkout: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fvgp_tpu.models.ggmp import GGMP, gaussian_pdf, hyperparameters


def main():
    rng = np.random.default_rng(0)
    n, n_tasks, K = 14, 2, 2
    x = np.linspace(0, 10, n).reshape(-1, 1)
    domain = np.linspace(-6, 6, 200)

    # per-station, per-task bimodal PDFs whose centers drift with x
    y_data = []
    for xi in x[:, 0]:
        tasks = []
        for t in range(n_tasks):
            c = np.sin(xi) if t == 0 else np.cos(xi)
            tasks.append((domain,
                          0.5 * gaussian_pdf(domain, c - 0.6, 0.15)
                          + 0.5 * gaussian_pdf(domain, c + 0.6, 0.15)))
        y_data.append(tasks)

    # K components, each a multi-task fvGP: default Matérn over the
    # (D+1)-dim augmented index set -> D+2 hyperparameters
    hps = [np.ones(3) for _ in range(K)]
    bounds = [np.tile([0.01, 10.0], (3, 1)) for _ in range(K)]
    hobj = hyperparameters(np.full(K, 1 / K), np.tile([0.0, 1.0], (K, 1)),
                           hps, bounds)

    g = GGMP(x, y_data, hps_obj=hobj, likelihood_terms=K)
    g.initLikelihoods()
    g.initGPs()
    g.train(method="local", max_iter=60, weight_method="density")

    xp = np.array([[2.5], [5.0], [7.5]])
    mean = g.posterior_mean(xp)          # (3, n_tasks)
    var = g.posterior_variance(xp)       # (3, n_tasks)
    pdf = g.posterior_pdf(xp, domain)    # (3, n_tasks, len(domain))
    w = [lk.weight for lk in g.likelihoods]
    print("mixture weights:", np.round(w, 3))
    for i, xi in enumerate(xp[:, 0]):
        print(f"x={xi:4.1f}  mean per task {np.round(mean[i], 3)}  "
              f"var per task {np.round(var[i], 3)}  "
              f"pdf mass {np.round(pdf[i].sum(axis=-1) * (domain[1]-domain[0]), 3)}")


if __name__ == "__main__":
    main()

"""BASELINE config 3 — GP on a non-Euclidean input space (arbitrary Python
objects as points; the reference's NonEuclideanInputSpaces.ipynb workflow)."""
import os as _os, sys as _sys
# runnable from a bare checkout: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fvgp_tpu import GP

SEQUENCES = ["AGCT", "AGCC", "AGTT", "TGCA", "TGCC", "CCCC", "GGGG",
             "ACGT", "AAAA", "TTTT"]


def hamming_kernel(x1, x2, hps):
    """Gram matrix over equal-length strings from Hamming distance."""
    K = np.empty((len(x1), len(x2)))
    for i, a in enumerate(x1):
        for j, b in enumerate(x2):
            d = sum(c1 != c2 for c1, c2 in zip(a, b))
            K[i, j] = np.exp(-d / hps[1])
    return hps[0] * K


def main():
    y = np.array([sum(c == "A" for c in s) + 0.5 * sum(c == "G" for c in s)
                  for s in SEQUENCES], dtype=float)
    gp = GP(SEQUENCES, y, init_hyperparameters=np.array([1.0, 2.0]),
            kernel_function=hamming_kernel)
    print("Euclidean:", gp.data.Euclidean, "| LML:", gp.log_likelihood())
    gp.train(method="mcmc", max_iter=400,
             hyperparameter_bounds=np.array([[0.1, 20.0], [0.5, 20.0]]))
    res = gp.posterior_mean(["AGGT", "TTTA"])
    print("predictions for unseen sequences:", np.round(res["m(x)"], 3))
    print("variances:", np.round(gp.posterior_covariance(["AGGT", "TTTA"])["v(x)"], 3))


if __name__ == "__main__":
    main()

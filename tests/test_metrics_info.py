"""Validation metrics and information-theory posteriors against oracles.

The reference exposes 13 validation metrics on ``GP`` (ref gp.py:1659-1976)
and an information-theory suite on the posterior (ref
gp_posterior.py:393-526).  Each metric here is checked against its formula
computed directly from the posterior moments the GP itself reports, so the
test validates the delegation wiring AND the formula.
"""

import warnings

import numpy as np
import pytest
from scipy.stats import norm

from fvgp_tpu import GP

warnings.simplefilter("ignore")


@pytest.fixture(scope="module")
def trained_gp():
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 10, (40, 1))
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(40)
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]))
    gp.train(method="local", max_iter=30)
    return gp


@pytest.fixture(scope="module")
def test_set(trained_gp):
    xt = trained_gp.make_1d_x_pred([0.0, 10.0], res=25)
    yt = np.sin(xt[:, 0])
    mu = trained_gp.posterior_mean(xt)["m(x)"]
    v = trained_gp.posterior_covariance(xt)["v(x)"]
    vn = trained_gp.posterior_covariance(xt, add_noise=True)["v(x)"]
    return xt, yt, mu, v, vn


def test_rmse_mae_mape_nrmse_r2(trained_gp, test_set):
    xt, yt, mu, _, _ = test_set
    assert trained_gp.rmse(xt, yt) == pytest.approx(
        np.sqrt(np.mean((yt - mu) ** 2)))
    assert trained_gp.mae(xt, yt) == pytest.approx(np.mean(np.abs(yt - mu)))
    assert trained_gp.mape(xt, yt) == pytest.approx(
        np.mean(np.abs((yt - mu) / yt)))
    assert trained_gp.nrmse(xt, yt) == pytest.approx(
        trained_gp.rmse(xt, yt) / (yt.max() - yt.min()))
    ss_res = np.sum((yt - mu) ** 2)
    ss_tot = np.sum((yt - np.mean(yt)) ** 2)
    r2 = trained_gp.r2(xt, yt)
    assert r2 == pytest.approx(1.0 - ss_res / ss_tot)
    assert r2 > 0.9            # the fit is actually good


def test_nlpd_and_msll(trained_gp, test_set):
    xt, yt, mu, v, _ = test_set
    nlpd = np.mean(0.5 * np.log(2 * np.pi * v) + 0.5 * (yt - mu) ** 2 / v)
    assert trained_gp.nlpd(xt, yt) == pytest.approx(nlpd)
    bm, bv = np.mean(trained_gp.y_data), np.var(trained_gp.y_data)
    base = np.mean(0.5 * np.log(2 * np.pi * bv) + 0.5 * (yt - bm) ** 2 / bv)
    assert trained_gp.msll(xt, yt) == pytest.approx(nlpd - base)
    assert trained_gp.msll(xt, yt) < 0   # better than the trivial model


def test_crps_formula(trained_gp, test_set):
    xt, yt, mu, v, _ = test_set
    sigma = np.sqrt(v)
    z = (yt - mu) / sigma
    res = np.abs(sigma * (1.0 / np.sqrt(np.pi) - 2.0 * norm.pdf(z)
                          - z * (2.0 * norm.cdf(z) - 1.0)))
    got_mean, got_std = trained_gp.crps(xt, yt)
    assert got_mean == pytest.approx(np.mean(res))
    assert got_std == pytest.approx(np.sqrt(np.var(res)))


def test_interval_metrics(trained_gp, test_set):
    xt, yt, mu, _, vn = test_set
    sigma = np.sqrt(vn)
    z = norm.ppf(0.975)
    lower, upper = mu - z * sigma, mu + z * sigma
    picp = np.mean((yt >= lower) & (yt <= upper))
    assert trained_gp.picp(xt, yt) == pytest.approx(picp)
    assert trained_gp.mpiw(xt) == pytest.approx(np.mean(2 * z * sigma))
    alpha = 0.05
    pen_lo = (2 / alpha) * np.maximum(lower - yt, 0)
    pen_hi = (2 / alpha) * np.maximum(yt - upper, 0)
    assert trained_gp.interval_score(xt, yt) == pytest.approx(
        np.mean(upper - lower + pen_lo + pen_hi))
    curve = trained_gp.coverage_curve(xt, yt, intervals=[0.5, 0.95])
    assert curve["target_coverage"] == [0.5, 0.95]
    assert curve["measured_coverage"][0] <= curve["measured_coverage"][1]
    assert curve["measured_coverage"][1] == pytest.approx(picp)


def test_metric_shape_mismatch_raises(trained_gp, test_set):
    xt, yt = test_set[0], test_set[1]
    bad = yt[:, None]                       # (M, 1) vs (M,)
    for name in ("crps", "rmse", "nlpd", "r2", "mae", "mape", "msll",
                 "interval_score"):
        with pytest.raises(AssertionError):
            getattr(trained_gp, name)(xt, bad)


def test_plot_observed_vs_predicted(trained_gp, test_set):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xt, yt = test_set[0], test_set[1]
    _, ax = plt.subplots()
    trained_gp.plot_observed_vs_predicted(xt, yt, title="obs vs pred", ax=ax)
    assert ax.get_xlabel() == "Observed" and ax.get_ylabel() == "Predicted"
    # default-axis branch
    trained_gp.plot_observed_vs_predicted(xt, yt)
    plt.close("all")


def test_conveniences(trained_gp):
    g = trained_gp.gaussian_1d(np.array([0.0]), 0.0, 2.0)
    assert g[0] == pytest.approx(1.0 / (np.sqrt(2 * np.pi) * 2.0))
    grid = trained_gp.make_2d_x_pred(np.array([0, 1]), np.array([2, 3]),
                                     resx=4, resy=5)
    assert grid.shape == (20, 2)
    assert grid[:, 0].min() == 0 and grid[:, 1].max() == 3
    t = trained_gp.get_gp2Scale_exec_time(0.1, 4)
    D, b = len(trained_gp.x_data), trained_gp.prior.batch_size
    assert t == pytest.approx(D ** 2 * 0.1 / (2 * 4 * b ** 2))


# ---------------------------------------------------------------------------
# information-theory suite (ref gp_posterior.py:393-526)
# ---------------------------------------------------------------------------

def test_gp_kl_div_matches_manual(trained_gp, test_set):
    xt = test_set[0][:6]
    comp_mean = np.zeros(6)
    comp_cov = np.eye(6)
    out = trained_gp.gp_kl_div(xt, comp_mean, comp_cov)
    mu1 = out["gp posterior mean"]
    S1 = out["gp posterior covariance"]
    S2 = out["given covariance"]
    d = comp_mean - mu1
    kld = 0.5 * (np.trace(np.linalg.solve(S2, S1))
                 + d @ np.linalg.solve(S2, d) - 6
                 + np.linalg.slogdet(S2)[1] - np.linalg.slogdet(S1)[1])
    assert out["kl-div"] == pytest.approx(abs(kld), rel=1e-6)
    # KL of the posterior against itself is ~0
    same = trained_gp.gp_kl_div(xt, mu1, S1 - np.identity(6) * 1e-9)
    assert abs(same["kl-div"]) < 1e-6


def test_gp_mutual_information_and_total_correlation(trained_gp, test_set):
    xt = test_set[0][:5]
    mi = trained_gp.gp_mutual_information(xt)["mutual information"]
    assert mi > 0.0            # predictions near data carry information
    # add_noise applies only when a noise FUNCTION exists (matching the
    # reference, ref gp_posterior.py:554-569): a noise-callable GP must
    # report less shared information with noisy predictions
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 10, (30, 1))
    y = np.sin(x[:, 0])
    gpn = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]),
             noise_function=lambda x, hps: np.full(len(x), 0.25))
    mi0 = gpn.gp_mutual_information(xt)["mutual information"]
    mi_noise = gpn.gp_mutual_information(xt, add_noise=True)[
        "mutual information"]
    assert mi_noise < mi0      # noise dilutes the shared information
    tc = trained_gp.gp_total_correlation(xt)["total correlation"]
    assert tc > 0.0
    assert np.isfinite(tc)
    tcn = gpn.gp_total_correlation(xt, add_noise=True)["total correlation"]
    assert np.isfinite(tcn)


def test_gp_relative_information_entropy_and_set(trained_gp, test_set):
    xt = test_set[0][:4]
    rie = trained_gp.gp_relative_information_entropy(xt)["RIE"]
    assert rie > 0.0           # the data taught the model something
    out = trained_gp.gp_relative_information_entropy_set(xt)
    assert out["RIE"].shape == (4,)
    # each set entry equals the singleton RIE at that point
    one = trained_gp.gp_relative_information_entropy(xt[:1])["RIE"]
    assert out["RIE"][0] == pytest.approx(one)
    assert np.all(out["RIE"] > 0.0)


def test_gp_entropy_consistency(trained_gp, test_set):
    """entropy(joint prior) relates MI: I = H(kk) + H(K) - H(joint)."""
    xt = test_set[0][:5]
    ent = trained_gp.gp_entropy(xt)
    assert np.isfinite(ent)
    mi = trained_gp.gp_mutual_information(xt)["mutual information"]
    # MI is bounded by each marginal entropy's information content; just
    # anchor the plumbing: both finite, MI much smaller than |entropy|
    assert mi < abs(ent) * 10

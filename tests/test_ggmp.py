"""GGMP distributional regression (ref tests/test_fvgp.py:702 + the ggmp
utility suite)."""

import warnings

import numpy as np
import pytest

from fvgp_tpu.models.ggmp import (GGMP, NormalLikelihood,
                                  align_gmm_components_hungarian,
                                  bhattacharyya_distance,
                                  empirical_pdf_from_samples,
                                  fit_gmm_fixed_weights,
                                  fit_station_gmms_cached, gaussian_pdf,
                                  gaussian_w2_squared, hyperparameters,
                                  kl_divergence, optimize_weights_em_density,
                                  optimize_weights_em_samples,
                                  wasserstein_1d_density)

warnings.simplefilter("ignore")


def _make_distributional_data(n=12, K=2, seed=0):
    """Stations along a line; each observes a bimodal PDF whose mode
    locations drift with x."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 10, n).reshape(-1, 1)
    y_data = []
    for xi in x[:, 0]:
        domain = np.linspace(-8, 12, 200)
        d1 = gaussian_pdf(domain, np.sin(xi), 0.3)
        d2 = gaussian_pdf(domain, 3.0 + 0.2 * xi, 0.5)
        y_data.append((domain, 0.5 * d1 + 0.5 * d2))
    return x, y_data


def _hps_obj(K, d=1):
    hps = [np.array([1.0, 2.0, 0.0]) for _ in range(K)]
    bounds = [np.array([[0.01, 10.0], [0.5, 10.0], [-10.0, 10.0]])
              for _ in range(K)]
    w = np.full(K, 1.0 / K)
    wb = np.tile([0.0, 1.0], (K, 1))
    return hyperparameters(w, wb, hps, bounds)


def test_hyperparameters_vectorize_roundtrip():
    h = _hps_obj(3)
    v = h.vectorized_hps
    w, hps = h.devectorize_hps(v)
    assert len(w) == 3 and len(hps) == 3
    np.testing.assert_array_equal(hps[1], h.hps[1])
    wb, hb = h.devectorize_bounds(h.vectorized_bounds)
    assert len(hb) == 3 and hb[0].shape == (3, 2)


def test_normal_likelihood_ravel():
    lk = NormalLikelihood(np.arange(4.0), np.ones(4), 0.5)
    m, v = lk.ravel(lk.unravel())
    np.testing.assert_array_equal(m, np.arange(4.0))
    np.testing.assert_array_equal(v, np.ones(4))


def test_gmm_fit_recovers_modes():
    domain = np.linspace(-6, 6, 400)
    density = 0.5 * gaussian_pdf(domain, -2.0, 0.2) + \
        0.5 * gaussian_pdf(domain, 2.0, 0.2)
    means, variances = fit_gmm_fixed_weights(domain, density, 2)
    np.testing.assert_allclose(sorted(means), [-2.0, 2.0], atol=0.2)


def test_hungarian_alignment():
    perm = align_gmm_components_hungarian(
        np.array([0.0, 5.0]), np.array([1.0, 1.0]),
        np.array([5.1, 0.1]), np.array([1.0, 1.0]))
    np.testing.assert_array_equal(perm, [1, 0])
    assert gaussian_w2_squared(0, 1, 0, 1) == 0.0


def test_density_distances():
    domain = np.linspace(-5, 5, 300)
    p = gaussian_pdf(domain, 0.0, 1.0)
    q = gaussian_pdf(domain, 1.0, 1.0)
    assert bhattacharyya_distance(domain, p, p) < 1e-6
    assert kl_divergence(domain, p, q) > 0.0
    w = wasserstein_1d_density(domain, p, q)
    assert abs(w - 1.0) < 0.05      # W1 of shifted Gaussians = shift


def test_em_weight_optimizers():
    domain = np.linspace(-6, 6, 200)
    true_w = np.array([0.8, 0.2])
    mix = true_w[0] * gaussian_pdf(domain, -2, 0.3) + \
        true_w[1] * gaussian_pdf(domain, 2, 0.3)
    _, dens, dx = (domain, mix, np.abs(np.gradient(domain)))
    comp = np.stack([gaussian_pdf(domain, -2, 0.3),
                     gaussian_pdf(domain, 2, 0.3)])
    terms = [(comp, mix * dx / (mix * dx).sum())]
    w, hist, iters = optimize_weights_em_density(terms, 2, max_iter=500)
    np.testing.assert_allclose(w, true_w, atol=0.05)

    rng = np.random.default_rng(0)
    samples = np.concatenate([rng.normal(-2, 0.55, 800),
                              rng.normal(2, 0.55, 200)])
    w2, _, _ = optimize_weights_em_samples(
        [samples], [np.array([-2.0, 2.0])], [np.array([0.3, 0.3])], 2,
        max_iter=500)
    np.testing.assert_allclose(w2, true_w, atol=0.1)


def test_station_gmm_cache(tmp_path):
    _, y_data = _make_distributional_data(n=4)
    m1, v1 = fit_station_gmms_cached(y_data, 2, cache_dir=tmp_path)
    assert len(list(tmp_path.glob("ggmp_gmms_*.npz"))) == 1
    m2, v2 = fit_station_gmms_cached(y_data, 2, cache_dir=tmp_path)
    np.testing.assert_array_equal(m1, m2)


def test_mst_alignment(rng):
    """MST alignment must make component k mean the same mode at every
    station even when stations are spatially scattered."""
    from fvgp_tpu.models.ggmp import align_local_gmms
    x = rng.uniform(0, 10, (25, 2))
    true_means = np.stack([np.sin(x[:, 0]) - 3.0, np.sin(x[:, 0]) + 3.0],
                          axis=1)
    means = true_means.copy()
    variances = np.full_like(means, 0.25)
    flip = rng.uniform(size=25) > 0.5          # scramble component order
    means[flip] = means[flip][:, ::-1]
    aligned_m, aligned_v = align_local_gmms(x, means, variances, method="mst")
    # after alignment, each column is one coherent mode (low spread around
    # its sin curve)
    resid0 = aligned_m[:, 0] - np.sin(x[:, 0])
    resid1 = aligned_m[:, 1] - np.sin(x[:, 0])
    assert np.std(resid0) < 0.5 and np.std(resid1) < 0.5
    assert abs(abs(resid0.mean() - resid1.mean()) - 6.0) < 0.5


@pytest.mark.slow
def test_mcmc_until_converged(small_data):
    import warnings as w
    w.simplefilter("ignore")
    from fvgp_tpu import GP
    from fvgp_tpu.models.ggmp import train_gp_mcmc_until_converged
    x, y = small_data
    gp = GP(x, y, init_hyperparameters=np.ones(3))
    bounds = np.array([[0.01, 10.0], [0.1, 20.0], [0.1, 20.0]])
    hps, rounds = train_gp_mcmc_until_converged(gp, bounds, max_rounds=3,
                                                steps_per_round=300,
                                                rel_tol=0.05)
    assert hps.shape == (3,)
    assert 1 <= rounds <= 3


def test_empirical_pdf():
    samples = np.random.default_rng(1).normal(3.0, 1.0, 5000)
    domain, dens = empirical_pdf_from_samples(samples)
    mode = domain[np.argmax(dens)]
    assert abs(mode - 3.0) < 0.5


@pytest.mark.slow
def test_ggmp_end_to_end():
    """The documented workflow: init -> train (both phases) -> posterior
    (ref ggmp.py:67-74)."""
    K = 2
    x, y_data = _make_distributional_data(n=12, K=K)
    ggmp = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K)
    lks = ggmp.initLikelihoods()
    assert len(lks) == K
    ggmp.initGPs()
    assert len(ggmp.gps) == K
    joints = ggmp.build_pairwise_data_generating_normals(0, 1)
    assert len(joints) == K and joints[0]["cov"].shape == (2, 2)
    ggmp.train(method="local", max_iter=30)
    mean = ggmp.posterior_mean(x)
    var = ggmp.posterior_variance(x)
    assert mean.shape == (12,) and var.shape == (12,)
    assert np.all(var > 0)
    # the mixture mean should track the station empirical means
    np.testing.assert_allclose(mean, ggmp.station_means, atol=1.5)
    w = np.array([lk.weight for lk in ggmp.likelihoods])
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-9)
    pdf = ggmp.posterior_pdf(x[:2], np.linspace(-8, 12, 100))
    assert pdf.shape == (2, 100)
    assert np.all(pdf >= 0)


def test_ggmp_requires_init_order():
    K = 2
    x, y_data = _make_distributional_data(n=5)
    ggmp = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K)
    with pytest.raises(ValueError):
        ggmp.initGPs()
    with pytest.raises(ValueError):
        ggmp.posterior_mean(x)


# ---------------------------------------------------------------------------
# multivariate-output GMMs (ref ggmp.py:1036-1207, :1556-1779)
# ---------------------------------------------------------------------------

def _two_cluster_2d(n=400, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.multivariate_normal([0.0, 0.0], [[0.2, 0.05], [0.05, 0.1]],
                                size=n // 2)
    b = rng.multivariate_normal([4.0, 3.0], [[0.3, -0.1], [-0.1, 0.2]],
                                size=n // 2)
    return np.vstack([a, b])


def test_fit_gmm_free_weights_multivariate_recovers_clusters():
    from fvgp_tpu.models.ggmp import fit_gmm_free_weights_multivariate
    y = _two_cluster_2d()
    w, means, covs, info = fit_gmm_free_weights_multivariate(
        y, 2, covariance_type="full", n_init=3)
    assert w.shape == (2,) and means.shape == (2, 2) and covs.shape == (2, 2, 2)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(w, [0.5, 0.5], atol=0.05)
    got = means[np.argsort(means[:, 0])]
    np.testing.assert_allclose(got, [[0.0, 0.0], [4.0, 3.0]], atol=0.15)
    assert info["converged"] and np.isfinite(info["bic"])


def test_fit_gmm_multivariate_diag_and_1d_sort():
    from fvgp_tpu.models.ggmp import fit_gmm_free_weights_multivariate
    rng = np.random.default_rng(1)
    y = np.concatenate([rng.normal(-2.0, 0.3, 150), rng.normal(2.0, 0.5, 150)])
    w, means, covs, _ = fit_gmm_free_weights_multivariate(
        y, 2, covariance_type="diag")
    assert means[0, 0] < means[1, 0]          # sorted when d == 1
    np.testing.assert_allclose(means[:, 0], [-2.0, 2.0], atol=0.15)
    assert covs[0].shape == (1, 1)


def test_gaussian_w2_squared_dispatch():
    from fvgp_tpu.models.ggmp import gaussian_w2_squared
    # 1-d closed form and multivariate Bures form must agree on scalars
    w2_scalar = gaussian_w2_squared(1.0, 0.5, 3.0, 2.0)
    w2_mv = gaussian_w2_squared(np.array([1.0]), np.array([[0.5]]),
                                np.array([3.0]), np.array([[2.0]]))
    np.testing.assert_allclose(w2_scalar, w2_mv, rtol=1e-10)
    # identical Gaussians -> 0
    C = np.array([[0.4, 0.1], [0.1, 0.3]])
    assert abs(gaussian_w2_squared(np.zeros(2), C, np.zeros(2), C)) < 1e-10


def test_hungarian_alignment_multivariate():
    from fvgp_tpu.models.ggmp import align_gmm_components_hungarian
    means = np.array([[0.0, 0.0], [4.0, 3.0], [-3.0, 2.0]])
    covs = np.tile(np.eye(2) * 0.1, (3, 1, 1))
    perm_in = np.array([2, 0, 1])
    perm = align_gmm_components_hungarian(means, covs,
                                          means[perm_in], covs[perm_in])
    np.testing.assert_array_equal(means[perm_in][perm], means)


def test_em_multivariate_weights_recovery():
    from fvgp_tpu.models.ggmp import (
        optimize_weights_em_multivariate_samples, sample_gmm_multivariate)
    true_w = np.array([0.75, 0.25])
    means = np.array([[0.0, 0.0], [5.0, 5.0]])
    covs = np.tile(np.eye(2) * 0.2, (2, 1, 1))
    y_list = [sample_gmm_multivariate(true_w, means, covs, 600,
                                      random_state=i) for i in range(3)]
    w, w_hist, obj = optimize_weights_em_multivariate_samples(
        y_list, [means] * 3, [covs] * 3, K=2)
    np.testing.assert_allclose(w, true_w, atol=0.03)
    assert np.all(np.diff(obj) >= -1e-6)      # EM monotonicity


def test_loglik_multivariate_matches_scipy():
    from fvgp_tpu.models.ggmp import loglik_multivariate_mixture_samples
    from scipy.stats import multivariate_normal
    rng = np.random.default_rng(3)
    y = rng.normal(size=(50, 2))
    w = np.array([0.6, 0.4])
    means = np.array([[0.0, 0.0], [1.0, -1.0]])
    covs = np.stack([np.eye(2) * 0.5, [[0.8, 0.2], [0.2, 0.6]]])
    got = loglik_multivariate_mixture_samples(y, w, means, covs, cov_reg=0.0)
    want = np.log(w[0] * multivariate_normal.pdf(y, means[0], covs[0])
                  + w[1] * multivariate_normal.pdf(y, means[1], covs[1]))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_fit_local_gmms_multivariate_contract():
    from fvgp_tpu.models.ggmp import fit_local_gmms_multivariate
    y_list = [_two_cluster_2d(200, seed=i) for i in range(3)]
    out = fit_local_gmms_multivariate(y_list, 2, n_init=2)
    assert out["K"] == 2 and out["d"] == 2
    assert len(out["weights"]) == 3 and out["covs"][0].shape == (2, 2, 2)


def test_multivariate_sample_distances():
    from fvgp_tpu.models.ggmp import (energy_distance_multivariate,
                                      sliced_wasserstein_distance, mmd_rbf)
    rng = np.random.default_rng(4)
    a = rng.normal(size=(200, 3))
    b = rng.normal(size=(200, 3))
    c = rng.normal(loc=3.0, size=(200, 3))
    for fn in (energy_distance_multivariate, sliced_wasserstein_distance,
               mmd_rbf):
        near = fn(a, b)
        far = fn(a, c)
        assert far > near, fn.__name__
    assert energy_distance_multivariate(a, a) < 1e-9


def test_fit_gmm_multivariate_degenerate_samples():
    """All-identical samples must not crash k-means++ seeding."""
    from fvgp_tpu.models.ggmp import fit_gmm_free_weights_multivariate
    w, m, c, info = fit_gmm_free_weights_multivariate(np.ones((30, 2)), 2,
                                                      n_init=1)
    assert np.isfinite(m).all() and np.isfinite(c).all()
    np.testing.assert_allclose(w.sum(), 1.0)


# ---------------------------------------------------------------------------
# GGMP-on-fvGP: multi-task mixture GPs (beyond the reference)
# ---------------------------------------------------------------------------

def _make_multitask_distributional_data(n=10, n_tasks=2, seed=0):
    """Each station observes one PDF PER TASK; task 0 tracks sin(x),
    task 1 tracks cos(x)."""
    x = np.linspace(0, 10, n).reshape(-1, 1)
    y_data = []
    domain = np.linspace(-6, 6, 160)
    for xi in x[:, 0]:
        tasks = []
        for t in range(n_tasks):
            center = np.sin(xi) if t == 0 else np.cos(xi)
            d1 = gaussian_pdf(domain, center - 0.8, 0.25)
            d2 = gaussian_pdf(domain, center + 0.8, 0.25)
            tasks.append((domain, 0.5 * d1 + 0.5 * d2))
        y_data.append(tasks)
    return x, y_data


def _hps_obj_mt(K, d=1):
    # fvGP default Matérn over the task-augmented index set: d+2 hps
    hps = [np.ones(d + 2) for _ in range(K)]
    bounds = [np.tile([0.01, 10.0], (d + 2, 1)) for _ in range(K)]
    w = np.full(K, 1.0 / K)
    wb = np.tile([0.0, 1.0], (K, 1))
    return hyperparameters(w, wb, hps, bounds)


@pytest.mark.slow
def test_ggmp_multitask_end_to_end():
    K = 2
    x, y_data = _make_multitask_distributional_data()
    g = GGMP(x, y_data, hps_obj=_hps_obj_mt(K), likelihood_terms=K)
    assert g.multi_task and g.n_tasks == 2
    g.initLikelihoods()
    assert g.station_means.shape == (len(x), 2)
    g.initGPs()
    from fvgp_tpu import fvGP
    assert all(isinstance(gp, fvGP) for gp in g.gps)
    g.train(method="local", max_iter=30, weight_method="density",
            weight_max_iter=50)
    xp = np.array([[2.5], [7.5]])
    pm = g.posterior_mean(xp)
    pv = g.posterior_variance(xp)
    assert pm.shape == (2, 2) and pv.shape == (2, 2)
    assert np.all(np.isfinite(pm)) and np.all(pv > 0)
    # the mixture mean tracks the (N, No) station empirical means at the
    # single-task test's tolerance (the noise floor of moment-seeded
    # components is high on bimodal data)
    pm_train = g.posterior_mean(x)
    assert pm_train.shape == g.station_means.shape
    np.testing.assert_allclose(pm_train, g.station_means, atol=1.5)
    pdf = g.posterior_pdf(xp, np.linspace(-6, 6, 100))
    assert pdf.shape == (2, 2, 100)
    assert np.all(pdf >= 0)
    # the predictive density integrates to ~1 per (point, task)
    mass = pdf.sum(axis=-1) * (12.0 / 99)
    np.testing.assert_allclose(mass, 1.0, atol=0.05)


@pytest.mark.slow
def test_ggmp_multitask_rejects_sample_weights():
    K = 2
    x, y_data = _make_multitask_distributional_data(n=6)
    g = GGMP(x, y_data, hps_obj=_hps_obj_mt(K), likelihood_terms=K)
    g.initLikelihoods()
    g.initGPs()
    with pytest.raises(ValueError, match="single-task"):
        g.train(method="local", max_iter=5, weight_method="samples",
                y_samples=[np.zeros(3)] * len(x))


@pytest.mark.slow
def test_reference_name_helper_parity(tmp_path):
    """The reference ggmp module's remaining public helpers exist with the
    same contracts (ref ggmp.py:1847, :2002, :2159, :2301, :2430)."""
    from fvgp_tpu.models.ggmp import (build_gp_init_kwargs,
                                      fit_station_gmms_fixed_weights_cached,
                                      prepare_station_terms_density,
                                      train_component_gps_mcmc,
                                      wasserstein_1d)
    # wasserstein_1d == wasserstein_1d_density on densities
    dom = np.linspace(-3, 3, 100)
    p = gaussian_pdf(dom, 0.0, 1.0)
    q = gaussian_pdf(dom, 1.0, 1.0)
    assert wasserstein_1d(dom, p, q) == pytest.approx(
        wasserstein_1d_density(dom, p, q))
    assert wasserstein_1d(dom, p, q) == pytest.approx(1.0, abs=0.1)

    kw, devs = build_gp_init_kwargs()
    assert kw == {"compute_device": "cpu"} and devs is None
    kw, _ = build_gp_init_kwargs(use_gpu=True, gpu_engine="cupy")
    assert kw["compute_device"] == "gpu"

    # sample-series GMM fitting with the npz cache
    rng = np.random.default_rng(0)
    series = [np.concatenate([rng.normal(-1, 0.3, 300),
                              rng.normal(2, 0.4, 300)]) for _ in range(4)]
    m1, v1, path = fit_station_gmms_fixed_weights_cached(
        series, np.arange(4), data_path=tmp_path, K=2, gmm_max_iter=150)
    assert m1.shape == v1.shape == (4, 2)
    assert path is not None and path.exists()
    m2, v2, _ = fit_station_gmms_fixed_weights_cached(
        series, np.arange(4), data_path=tmp_path, K=2, gmm_max_iter=150)
    np.testing.assert_array_equal(m1, m2)          # cache hit
    assert np.all(np.diff(m1, axis=1) > 0)         # sorted components

    # component-GP MCMC training + EM term preparation on a tiny model
    K = 2
    x, y_data = _make_distributional_data(n=8)
    g = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K)
    g.initLikelihoods()
    g.initGPs()
    trained = train_component_gps_mcmc(g, g.hps_obj, n_updates_gp=40)
    assert len(trained) == K
    assert all(np.all(np.isfinite(t)) for t in trained)
    terms, ll_comp = prepare_station_terms_density(g, trained)
    assert len(terms) == len(y_data) and ll_comp.shape == (K,)
    p_obs, dx, log_pdf = terms[0]
    assert log_pdf.shape == (len(p_obs), K)
    assert np.all(np.isfinite(log_pdf))


# ---------------------------------------------------------------------------
# component parallelism (SURVEY §2c item 7; ref ggmp.py:469-503): the K
# component posteriors run as ONE vmapped device program

@pytest.mark.slow
def test_ggmp_batched_component_eval_matches_sequential():
    K = 3
    x, y_data = _make_distributional_data(n=14, K=K)
    seq = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K)
    seq.initLikelihoods()
    seq.initGPs()
    par = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K,
               gp_eval_parallel=True)
    par.initLikelihoods()
    par.initGPs()

    xp = np.linspace(-1, 11, 9).reshape(-1, 1)
    m_seq, v_seq = seq._component_posteriors(xp)
    m_par, v_par = par._component_posteriors(xp)
    # the batched path actually engaged (parity alone would also pass if
    # it silently fell back)
    assert getattr(par, "_batched_eval_count", 0) == 1
    assert getattr(seq, "_batched_eval_count", 0) == 0
    np.testing.assert_allclose(m_par, m_seq, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(v_par, v_seq, rtol=1e-8, atol=1e-10)

    # the public mixture surface agrees too, and keeps engaging the
    # batched program (prediction-shape bucketing: same compiled fn)
    np.testing.assert_allclose(par.posterior_mean(xp),
                               seq.posterior_mean(xp), rtol=1e-8)
    np.testing.assert_allclose(par.posterior_variance(xp),
                               seq.posterior_variance(xp), rtol=1e-8)
    assert par._batched_eval_count >= 3


@pytest.mark.slow
def test_ggmp_batched_eval_after_training_and_em():
    """The batched path serves the EM weight terms and stays consistent
    with per-GP evaluation after hyperparameters move."""
    K = 2
    x, y_data = _make_distributional_data(n=12, K=K)
    g = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K,
             gp_eval_parallel=True)
    g.initLikelihoods()
    g.initGPs()
    g.train(method="local", max_iter=30)
    assert g._batched_eval_count >= 1          # _station_terms_density
    xp = x[:5]
    m_b, v_b = g._component_posteriors(xp)
    m_s = np.stack([gp.posterior_mean(xp)["m(x)"] for gp in g.gps])
    v_s = np.stack([gp.posterior_covariance(xp, variance_only=True)["v(x)"]
                    for gp in g.gps])
    np.testing.assert_allclose(m_b, m_s, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(v_b, v_s, rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_ggmp_batched_eval_falls_back_on_mixed_kernels():
    """Components with different kernel callables cannot share one vmapped
    program — the sequential path must serve them (correctness first)."""
    import jax.numpy as jnp

    def k1(x1, x2, hps):
        d = jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1)
        return hps[0] * jnp.exp(-0.5 * d / hps[1] ** 2)

    def k2(x1, x2, hps):
        d = jnp.sqrt(jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2,
                             axis=-1) + 1e-12)
        return hps[0] * jnp.exp(-d / hps[1])

    K = 2
    x, y_data = _make_distributional_data(n=10, K=K)
    g = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K,
             gp_eval_parallel=True, gp_kernel_functions=[k1, k2])
    g.initLikelihoods()
    g.initGPs()
    xp = x[:4]
    m, v = g._component_posteriors(xp)
    assert getattr(g, "_batched_eval_count", 0) == 0   # fell back
    m_s = np.stack([gp.posterior_mean(xp)["m(x)"] for gp in g.gps])
    np.testing.assert_allclose(m, m_s, rtol=1e-12)


@pytest.mark.slow
def test_ggmp_gp_parallel_mcmc_threads_match_serial_surface():
    """train_component_gps_mcmc(gp_parallel=True) trains every component
    (thread pool over the K samplers) and returns in-bounds vectors."""
    from fvgp_tpu.models.ggmp import train_component_gps_mcmc

    K = 2
    x, y_data = _make_distributional_data(n=10, K=K)
    hps = _hps_obj(K)
    g = GGMP(x, y_data, hps_obj=hps, likelihood_terms=K)
    g.initLikelihoods()
    g.initGPs()
    trained = train_component_gps_mcmc(g, hps, n_updates_gp=40,
                                       gp_parallel=True, gp_workers=2)
    assert len(trained) == K
    for k, hk in enumerate(trained):
        b = np.asarray(hps.hps_bounds[k], dtype=float)
        assert hk.shape == (3,)
        assert np.all(hk >= b[:, 0]) and np.all(hk <= b[:, 1])


def test_ggmp_batched_eval_multitask_matches_sequential():
    """Multi-task components (fvGP over one shared augmented index set)
    also run as one batched program — means/variances identical to the
    per-GP path, task-major shapes preserved."""
    K = 2
    x, y_data = _make_multitask_distributional_data(n=8, n_tasks=2)
    seq = GGMP(x, y_data, hps_obj=_hps_obj_mt(K), likelihood_terms=K)
    seq.initLikelihoods()
    seq.initGPs()
    par = GGMP(x, y_data, hps_obj=_hps_obj_mt(K), likelihood_terms=K,
               gp_eval_parallel=True)
    par.initLikelihoods()
    par.initGPs()
    xp = x[:5]
    m_seq, v_seq = seq._component_posteriors(xp)
    m_par, v_par = par._component_posteriors(xp)
    assert getattr(par, "_batched_eval_count", 0) == 1
    assert m_par.shape == m_seq.shape == (K, 5, 2)
    np.testing.assert_allclose(m_par, m_seq, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(v_par, v_seq, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(par.posterior_mean(xp),
                               seq.posterior_mean(xp), rtol=1e-8)
    np.testing.assert_allclose(par.posterior_variance(xp),
                               seq.posterior_variance(xp), rtol=1e-8)


def test_ggmp_narrow_branches(tmp_path):
    """Validation edges and helper fallbacks across the GGMP utility
    surface (alignment dispatch, degenerate densities, container
    validation, constructor rejection)."""
    from fvgp_tpu.models import ggmp as G

    # zero-mass density normalizes to uniform
    dom = np.linspace(0, 1, 11)
    _, dens, _ = G._normalize_density(dom, np.zeros(11))
    assert np.allclose(dens, dens[0])
    # alignment dispatch: sequence + unknown method
    means = [np.array([0.0, 1.0]), np.array([1.1, 0.1])]
    vs = [np.array([0.1, 0.1]), np.array([0.1, 0.1])]
    m_seq, _ = G.align_local_gmms(np.zeros((2, 1)), means, vs,
                                  method="sequence")
    assert np.allclose(np.sort(m_seq[1]), np.sort(means[1]))
    with pytest.raises(ValueError):
        G.align_local_gmms(np.zeros((2, 1)), means, vs, method="bogus")
    # energy distance: 1-d row-vector transpose branch
    e = G.energy_distance(np.linspace(0, 1, 20)[None, :],
                          np.linspace(2, 3, 20)[None, :])
    assert e > 0
    # hyperparameters container validation
    wb = np.array([[0.0, 1.0]])
    hb = [np.array([[0.1, 10.0], [0.1, 10.0]])]
    with pytest.raises(Exception):
        G.hyperparameters([0.5], wb, [np.ones(2)], [])
    with pytest.raises(Exception):
        G.hyperparameters([0.5, 0.5], wb, [np.ones(2)], hb)
    h = G.hyperparameters([0.5], wb, [np.ones(2)], hb)
    with pytest.raises(Exception):
        h.set([0.5], [np.ones(2), np.ones(2)])
    with pytest.raises(Exception):
        h.set([0.5, 0.5], [np.ones(2)])
    w2, hps2 = h.devectorize_hps(h.vectorized_hps)
    assert np.allclose(w2, [0.5]) and np.allclose(hps2[0], np.ones(2))
    wb2, hb2 = h.devectorize_bounds(h.vectorized_bounds)
    assert np.allclose(wb2, wb) and np.allclose(hb2[0], hb[0])
    # GGMP constructor rejection: x/y length mismatch
    pair = (dom, np.full(11, 1.0))
    with pytest.raises(AssertionError):
        G.GGMP(np.zeros((3, 1)), [pair] * 2, hps_obj=h, likelihood_terms=1)


def _tiny_ggmp(rng, K=2, n=4):
    from fvgp_tpu.models import ggmp as G
    dom = np.linspace(-3.0, 6.0, 150)
    dens = 0.5 * G.gaussian_pdf(dom, 0.0, 0.1) \
        + 0.5 * G.gaussian_pdf(dom, 3.0, 0.1)
    y = [(dom, dens) for _ in range(n)]
    x = rng.uniform(0, 1, (n, 1))
    hps_obj = G.hyperparameters(
        [1.0 / K] * K, np.tile([[0.01, 1.0]], (K, 1)),
        [np.ones(2)] * K, [np.array([[0.1, 10.0], [0.1, 10.0]])] * K)
    return G.GGMP(x, y, hps_obj=hps_obj, likelihood_terms=K)


def test_ggmp_init_mean_std_validation():
    rng = np.random.default_rng(1)
    m = _tiny_ggmp(rng)
    with pytest.raises(AssertionError):
        m.initLikelihoods(init_mean=[np.zeros(4)])
    with pytest.raises(AssertionError):
        m.initLikelihoods(init_std=[np.ones(4)])


def test_atomic_savez_cleanup(tmp_path, monkeypatch):
    """A failing savez leaves neither the target nor a temp file behind."""
    from fvgp_tpu.models import ggmp as G
    target = tmp_path / "out.npz"

    def bad_savez(path, **kw):
        raise RuntimeError("disk full (synthetic)")

    monkeypatch.setattr(np, "savez", bad_savez)
    with pytest.raises(RuntimeError):
        G._atomic_savez(str(target), a=np.ones(3))
    assert list(tmp_path.iterdir()) == []


def test_fit_station_gmms_fixed_weights_logging(tmp_path, caplog):
    import logging
    from fvgp_tpu.models import ggmp as G
    rng = np.random.default_rng(2)
    series = [rng.normal(0, 1, 80) for _ in range(4)]
    lg = logging.getLogger("ggmp-test")
    with caplog.at_level(logging.INFO, logger="ggmp-test"):
        means, variances, path = G.fit_station_gmms_fixed_weights_cached(
            series, np.arange(4), K=2, cache_dir=tmp_path,
            log_every=2, logger=lg)
    assert means.shape == (4, 2) and path.exists()
    assert any("stations" in r.message for r in caplog.records)
    # second call takes the cache-hit branch
    m2, v2, p2 = G.fit_station_gmms_fixed_weights_cached(
        series, np.arange(4), K=2, cache_dir=tmp_path)
    np.testing.assert_allclose(m2, means)


def test_ggmp_batched_eval_mean_only_and_pickle():
    """posterior_mean's need_var=False compiles a mean-only batched
    program (no discarded variance work), and the jitted closure is
    dropped on pickling (checkpoint contract, SURVEY §5)."""
    import pickle

    K = 2
    x, y_data = _make_distributional_data(n=12, K=K)
    g = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K,
             gp_eval_parallel=True)
    g.initLikelihoods()
    g.initGPs()
    xp = x[:4]
    m, v = g._component_posteriors(xp, need_var=False)
    assert v is None
    assert g._batched_eval_count == 1
    m2, v2 = g._component_posteriors(xp)
    assert v2 is not None
    np.testing.assert_allclose(m, m2, rtol=1e-8, atol=1e-10)
    # pickle round-trips after batched evals; the rebuilt model serves
    # the same batched program lazily
    g2 = pickle.loads(pickle.dumps(g))
    m3, _ = g2._component_posteriors(xp, need_var=False)
    np.testing.assert_allclose(m3, m, rtol=1e-8, atol=1e-10)


def test_ggmp_batched_eval_skips_gp2scale_components():
    """gp2Scale component GPs keep the per-GP path: the batched program
    would densify K full (N, N) kernels (review finding)."""
    K = 2
    x, y_data = _make_distributional_data(n=12, K=K)
    g = GGMP(x, y_data, hps_obj=_hps_obj(K), likelihood_terms=K,
             gp_eval_parallel=True,
             gp_init_kwargs={"gp2Scale": True,
                             "args": {"gp2Scale_block_size": 8}})
    g.initLikelihoods()
    g.initGPs()
    m, v = g._component_posteriors(x[:4])
    assert getattr(g, "_batched_eval_count", 0) == 0
    assert m.shape[0] == K and v.shape[0] == K

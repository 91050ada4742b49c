"""GP end-to-end: numerical-agreement oracles against an independent numpy
implementation of the exact-GP equations (the role the reference plays in
its own suite; SURVEY.md §4 'dense-oracle agreement tests')."""

import warnings

import numpy as np
import pytest

from fvgp_tpu import GP

warnings.simplefilter("ignore")


def _np_matern_ard(x1, x2, hps):
    dm = np.zeros((len(x1), len(x2)))
    for i in range(x1.shape[1]):
        dm += np.abs(np.subtract.outer(x1[:, i], x2[:, i]) / hps[1 + i]) ** 2
    dm = np.sqrt(dm)
    return hps[0] * (1 + np.sqrt(3) * dm) * np.exp(-np.sqrt(3) * dm)


def _np_gp_reference(x, y, hps, noise_level=None):
    """Plain-numpy exact GP with the library's default kernel/mean/noise."""
    n = len(x)
    K = _np_matern_ard(x, x, hps)
    if noise_level is None:
        noise_level = (np.mean(np.abs(y)) / 100.0) ** 2
        V = np.full(n, noise_level)
    else:
        V = np.asarray(noise_level)
    KV = K + np.diag(V)
    m = np.full(n, np.mean(y))
    L = np.linalg.cholesky(KV)
    alpha = np.linalg.solve(KV, (y - m))
    logdet = 2 * np.sum(np.log(np.diag(L)))
    lml = -0.5 * ((y - m) @ alpha + logdet + n * np.log(2 * np.pi))
    return dict(K=K, V=V, KV=KV, m=m, alpha=alpha, lml=lml)


@pytest.fixture
def gp_and_oracle(small_data):
    x, y = small_data
    hps = np.array([1.0, 1.0, 1.0])
    gp = GP(x, y, init_hyperparameters=hps)
    return gp, x, y, hps


def test_lml_matches_numpy_oracle(gp_and_oracle):
    gp, x, y, hps = gp_and_oracle
    oracle = _np_gp_reference(x, y, hps)
    assert abs(gp.log_likelihood() - oracle["lml"]) < 1e-8
    hps2 = np.array([1.5, 2.0, 0.7])
    oracle2 = _np_gp_reference(x, y, hps2)
    assert abs(gp.log_likelihood(hps2) - oracle2["lml"]) < 1e-8


@pytest.mark.slow
def test_posterior_matches_numpy_oracle(gp_and_oracle):
    gp, x, y, hps = gp_and_oracle
    oracle = _np_gp_reference(x, y, hps)
    xp = np.random.default_rng(3).uniform(0, 10, (7, 2))
    k = _np_matern_ard(x, xp, hps)
    kk = _np_matern_ard(xp, xp, hps)
    mean_exp = np.mean(y) + k.T @ oracle["alpha"]
    S_exp = kk - k.T @ np.linalg.solve(oracle["KV"], k)
    res_m = gp.posterior_mean(xp)
    res_c = gp.posterior_covariance(xp)
    np.testing.assert_allclose(res_m["m(x)"], mean_exp, atol=1e-8)
    np.testing.assert_allclose(res_c["v(x)"], np.clip(np.diag(S_exp), 0, None),
                               atol=1e-8)
    np.testing.assert_allclose(res_c["S"], S_exp, atol=1e-8)


@pytest.mark.slow
def test_gradient_matches_finite_differences(gp_and_oracle):
    gp, x, y, hps = gp_and_oracle
    fd, an = gp.test_log_likelihood_gradient(np.array([1.5, 2.0, 1.0]),
                                             epsilon=1e-7)
    np.testing.assert_allclose(fd, an, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("mode", ["Chol", "CholInv", "Inv", "sparseCG",
                                  "sparseMINRES", "sparseCGpre",
                                  "sparseMINRESpre", "sparseLU", "sparseSolve"])
@pytest.mark.slow
def test_all_linalg_modes_agree(small_data, mode):
    """Every linalg mode answers the same LML and posterior
    (the reference's mode sweep, tests/test_fvgp.py:357)."""
    x, y = small_data
    hps = np.array([1.0, 1.0, 1.0])
    args = {"sparse_cg_tol": 1e-12, "sparse_minres_tol": 1e-12,
            "random_logdet_min_num_samples": 400,
            "random_logdet_max_num_samples": 800,
            "random_logdet_lanczos_degree": 40}
    gp = GP(x, y, init_hyperparameters=hps, linalg_mode=mode, args=args)
    oracle = _np_gp_reference(x, y, hps)
    tol = 2.0 if mode in ("sparseCG", "sparseMINRES", "sparseCGpre",
                          "sparseMINRESpre") else 1e-6
    assert abs(gp.log_likelihood() - oracle["lml"]) < tol
    xp = np.random.default_rng(3).uniform(0, 10, (5, 2))
    k = _np_matern_ard(x, xp, hps)
    mean_exp = np.mean(y) + k.T @ oracle["alpha"]
    np.testing.assert_allclose(gp.posterior_mean(xp)["m(x)"], mean_exp,
                               atol=1e-4)


def test_custom_linalg_callables(small_data):
    """Custom [factor, solve, logdet] mode (ref gp_kv.py:138-141)."""
    x, y = small_data
    calls = {"factor": 0, "solve": 0, "logdet": 0}

    def f_factor(KV):
        calls["factor"] += 1
        return np.asarray(KV)

    def f_solve(obj, b):
        calls["solve"] += 1
        return np.linalg.solve(obj, np.asarray(b))

    def f_logdet(obj):
        calls["logdet"] += 1
        return np.linalg.slogdet(obj)[1]

    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]),
            linalg_mode=[f_factor, f_solve, f_logdet])
    oracle = _np_gp_reference(x, y, np.array([1.0, 1.0, 1.0]))
    assert abs(gp.log_likelihood() - oracle["lml"]) < 1e-8
    assert calls["factor"] > 0 and calls["solve"] > 0 and calls["logdet"] > 0


def test_measured_noise_variances(small_data):
    x, y = small_data
    nv = np.full(len(y), 0.01)
    hps = np.array([1.0, 1.0, 1.0])
    gp = GP(x, y, init_hyperparameters=hps, noise_variances=nv)
    oracle = _np_gp_reference(x, y, hps, noise_level=nv)
    assert abs(gp.log_likelihood() - oracle["lml"]) < 1e-8


@pytest.mark.slow
def test_host_numpy_kernel(small_data):
    """A numpy user kernel takes the host path with FD gradients —
    the reference's arbitrary-kernel contract."""
    x, y = small_data
    hps = np.array([1.0, 1.0, 1.0])

    def np_kernel(x1, x2, h):
        return _np_matern_ard(np.asarray(x1), np.asarray(x2), np.asarray(h))

    gp = GP(x, y, init_hyperparameters=hps, kernel_function=np_kernel)
    assert not gp.prior.kernel_traceable
    oracle = _np_gp_reference(x, y, hps)
    assert abs(gp.log_likelihood() - oracle["lml"]) < 1e-8
    fd, an = gp.test_log_likelihood_gradient(hps, epsilon=1e-7)
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=1e-3)


@pytest.mark.slow
def test_update_gp_data_append_rank_n(small_data):
    """Appending with rank-n update must agree with a fresh GP on the
    union dataset (ref tests anchor: rank_n_update paths).

    Fixed measured noise: a rank-n factor update assumes the old K+V block
    is unchanged, which the data-dependent default noise level violates
    (true of the reference as well)."""
    x, y = small_data
    nv = np.full(len(y), 0.01)
    hps = np.array([1.0, 1.0, 1.0])
    gp = GP(x[:45], y[:45], init_hyperparameters=hps, noise_variances=nv[:45])
    gp.update_gp_data(x[45:], y[45:], noise_variances_new=nv[45:], append=True)
    gp_fresh = GP(x, y, init_hyperparameters=hps, noise_variances=nv)
    assert abs(gp.log_likelihood() - gp_fresh.log_likelihood()) < 1e-7
    xp = np.random.default_rng(3).uniform(0, 10, (5, 2))
    np.testing.assert_allclose(gp.posterior_mean(xp)["m(x)"],
                               gp_fresh.posterior_mean(xp)["m(x)"], atol=1e-7)


def test_update_gp_data_overwrite(small_data):
    x, y = small_data
    hps = np.array([1.0, 1.0, 1.0])
    gp = GP(x[:45], y[:45], init_hyperparameters=hps)
    gp.update_gp_data(x, y, append=False)
    gp_fresh = GP(x, y, init_hyperparameters=hps)
    assert abs(gp.log_likelihood() - gp_fresh.log_likelihood()) < 1e-8


def test_set_hyperparameters_refreshes_state(gp_and_oracle):
    gp, x, y, _ = gp_and_oracle
    hps2 = np.array([2.0, 1.5, 0.9])
    gp.set_hyperparameters(hps2)
    oracle = _np_gp_reference(x, y, hps2)
    assert abs(gp.log_likelihood() - oracle["lml"]) < 1e-8
    np.testing.assert_allclose(np.asarray(gp.K), oracle["K"], atol=1e-10)


def test_pickling_roundtrip(gp_and_oracle):
    import pickle
    gp, x, y, hps = gp_and_oracle
    blob = pickle.dumps(gp)
    gp2 = pickle.loads(blob)
    assert abs(gp2.log_likelihood() - gp.log_likelihood()) < 1e-10
    xp = np.random.default_rng(3).uniform(0, 10, (4, 2))
    np.testing.assert_allclose(gp2.posterior_mean(xp)["m(x)"],
                               gp.posterior_mean(xp)["m(x)"], atol=1e-10)


def test_default_bounds_and_validation(small_data):
    x, y = small_data
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]))
    b = gp._get_default_hyperparameter_bounds()
    assert b.shape == (3, 2)
    assert np.all(b[:, 1] > b[:, 0])
    with pytest.raises(Exception):
        GP(x, y[:10])  # length mismatch
    xn = x.copy()
    yn = y.copy()
    yn[0] = np.nan
    with pytest.raises(Exception):
        GP(xn, yn, init_hyperparameters=np.array([1.0, 1.0, 1.0]))


@pytest.mark.slow
def test_posterior_probability_gaussian_fusion_oracle(small_data):
    """posterior_probability == the brute-force precision-form Gaussian
    fusion (the reference's formulation, ref gp_posterior.py:529-552),
    computed here with explicit numpy inverses as the oracle."""
    x, y = small_data
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]))
    xp = np.random.default_rng(5).uniform(0, 10, (6, x.shape[1]))
    m_c = np.linspace(-0.5, 0.5, 6)
    A = np.random.default_rng(6).standard_normal((6, 6))
    S_c = A @ A.T / 6.0 + 0.5 * np.eye(6)

    out = gp.posterior_probability(xp, m_c, S_c)

    m_gp = gp.posterior_mean(xp)["m(x)"]
    S_gp = gp.posterior_covariance(xp, add_noise=True)["S"]
    P1 = np.linalg.inv(S_gp)
    P2 = np.linalg.inv(S_c)
    S = np.linalg.inv(P1 + P2)
    mu = S @ (P1 @ m_gp + P2 @ m_c)
    diff = m_gp - m_c
    T = S_gp + S_c
    p = np.exp(-0.5 * (diff @ np.linalg.solve(T, diff)
                       + np.linalg.slogdet(T)[1]
                       + len(diff) * np.log(2.0 * np.pi)))
    np.testing.assert_allclose(out["mu"], mu, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out["covariance"], S, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out["probability"], p, rtol=1e-8)


@pytest.mark.slow
def test_hessian_exact_on_traced_path_matches_fd():
    """neg_log_likelihood_hessian is the exact jax.hessian when the kernel
    is traceable (beyond the reference, which can only FD its gradient,
    ref gp_marginal_likelihood.py:312-336); it must agree with the
    FD-of-gradient engine and be symmetric."""
    from fvgp_tpu import GP
    rng = np.random.default_rng(8)
    x = rng.uniform(0, 10, (50, 2))
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(50)
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]))
    ml = gp.marginal_likelihood
    hps = np.array([0.8, 1.3, 0.9])
    H = ml.neg_log_likelihood_hessian(hyperparameters=hps)
    assert H.shape == (3, 3)
    np.testing.assert_allclose(H, H.T, rtol=1e-10)        # exactly symmetric
    # FD oracle of the gradient
    eps = 1e-5
    g0 = ml.neg_log_likelihood_gradient(hyperparameters=hps)
    H_fd = np.zeros((3, 3))
    for i in range(3):
        hp = hps.copy()
        hp[i] += eps
        H_fd[i] = (ml.neg_log_likelihood_gradient(hyperparameters=hp) - g0) / eps
    H_fd = (H_fd + H_fd.T) / 2
    np.testing.assert_allclose(H, H_fd, rtol=2e-3, atol=2e-3)


def test_update_gp_data_rejects_mismatched_shapes(small_data):
    """Mismatched noise lengths / y column counts must be rejected BEFORE
    any mutation — GPdata vstacks x first, so a later y failure would
    leave the dataset half-updated."""
    x, y = small_data
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]),
            noise_variances=np.full(len(y), 1e-2))
    rng = np.random.default_rng(0)
    x_new = rng.uniform(0, 10, (5, x.shape[1]))
    n_before = gp.data.point_number
    with pytest.raises(AssertionError, match="same lengths"):
        gp.update_gp_data(x_new, np.zeros(5), np.full(3, 1e-2))
    with pytest.raises(AssertionError, match="column"):
        gp.update_gp_data(x_new, np.zeros((5, 2)), np.full(5, 1e-2))
    assert gp.data.point_number == n_before
    assert len(np.asarray(gp.x_data)) == n_before


def test_picp_rejects_column_vector_y(small_data):
    """(M,1) y_true would broadcast to an (M,M) comparison and silently
    average M^2 cross pairs."""
    x, y = small_data
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]))
    xt = x[:8]
    with pytest.raises(AssertionError, match="shape"):
        gp.picp(xt, np.sin(xt[:, 0])[:, None])
    cov = gp.picp(xt, np.sin(xt[:, 0]))
    assert 0.0 <= cov <= 1.0


@pytest.mark.slow
def test_async_linalg_gate_lives_with_the_run(small_data):
    """The sequential-state gate must stay applied for the WHOLE async run
    and restore only when the actor finishes — not when train() returns."""
    import time as _time
    x, y = small_data
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]),
            args={"sparse_krylov_warm_start": True})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt = gp.train(method="adam", asynchronous=True, max_iter=300,
                       hyperparameter_bounds=np.array([[0.1, 10.0]] * 3))
        # while the background run is alive the unsafe setting is disabled
        assert gp.args["sparse_krylov_warm_start"] is False
        gp.stop_training(opt)
        for _ in range(200):
            if opt.actor.is_done():
                break
            _time.sleep(0.05)
        opt.actor.join(5)
    assert gp.args["sparse_krylov_warm_start"] is True


def test_traced_lml_program_survives_same_shape_data_update():
    """x/y/noise are jit ARGUMENTS of the traced dense LML, not closure
    constants: a same-shape update_gp_data refreshes the data tuple and
    REUSES the live compiled program (round 5 — constants churned the
    compile-cache key and recompiled the N×N pipeline per dataset)."""
    rng = np.random.default_rng(8)
    x = rng.uniform(0, 10, (60, 2))
    y = np.sin(x[:, 0])
    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0, 1.0]),
            linalg_mode="Chol")
    ml = gp.marginal_likelihood
    l1 = gp.log_likelihood(gp.hyperparameters)
    prog = ml._lml_on
    x2 = rng.uniform(0, 10, (60, 2))
    y2 = np.cos(x2[:, 0])
    gp.update_gp_data(x2, y2, append=False)
    l2 = gp.log_likelihood(gp.hyperparameters)
    assert ml._lml_on is prog, "same-shape update must not rebuild the program"
    assert abs(l1 - l2) > 1e-6          # and the data really changed
    gp_fresh = GP(x2, y2, init_hyperparameters=np.array([1.0, 1.0, 1.0]),
                  linalg_mode="Chol")
    np.testing.assert_allclose(
        l2, gp_fresh.log_likelihood(gp_fresh.hyperparameters), rtol=1e-12)
    # value_and_grad agrees with the fresh model too (the vg program is
    # also reused)
    v, g = ml.log_likelihood_value_and_gradient(gp.hyperparameters)
    v2, g2 = gp_fresh.marginal_likelihood.log_likelihood_value_and_gradient(
        gp_fresh.hyperparameters)
    np.testing.assert_allclose(v, v2, rtol=1e-12)
    np.testing.assert_allclose(g, g2, rtol=1e-10)


def test_args_consuming_kernel_flush_idiom():
    """A 4-arg kernel reads args AT TRACE TIME; after in-place args
    mutation the documented flush (update_gp_data) must rebuild the traced
    program — program reuse applies only when args never enters the trace
    (review finding on the round-5 program cache)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    x = rng.uniform(0, 10, (40, 2))
    y = np.sin(x[:, 0])

    def kern4(x1, x2, h, args):
        d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2 / h[1] ** 2).sum(-1)
        return args["amp"] * h[0] * jnp.exp(-0.5 * d2)

    gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]),
            kernel_function=kern4, linalg_mode="Chol", args={"amp": 1.0})
    l1 = gp.log_likelihood(gp.hyperparameters)
    gp.args["amp"] = 2.0                     # in-place mutation
    gp.update_gp_data(x, y, append=False)    # the documented flush
    l2 = gp.log_likelihood(gp.hyperparameters)
    gp2 = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]),
             kernel_function=kern4, linalg_mode="Chol", args={"amp": 2.0})
    np.testing.assert_allclose(l2, gp2.log_likelihood(gp2.hyperparameters),
                               rtol=1e-12)
    assert abs(l1 - l2) > 1e-8               # the new amp really landed

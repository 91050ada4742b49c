"""fvGP — multi-task GP facade (parity target: /root/reference/fvgp/fvgp.py).

A multi-task GP over X × {0..No-1} is a single-task GP over the Cartesian
product of input and output space: each (V, No) observation row is flattened
into task-augmented points [x, task], skipping NaN entries (missing tasks,
ref fvgp.py:589-623).  Everything else — training, posteriors, metrics —
is inherited from GP; posterior reshapes are task-major
(k = point + V*task).
"""

import numpy as np

from .gp import GP


class fvGP(GP):
    """Multi-task Gaussian process (ref fvgp.py:5-634).

    Models ``No`` correlated outputs per input by flattening the problem
    into a single-task GP on the product space: every observed
    ``y_data[j, i]`` becomes one task-augmented training point
    ``[x_data[j], i]``, and the kernel sees the task index as an extra
    (last) input column — so a single kernel over D+1 dimensions encodes
    both spatial and cross-task correlation.  Entries of ``y_data`` that
    are ``np.nan`` are simply skipped: tasks may be observed at different
    subsets of inputs with no imputation.

    Parameters (differences from :class:`GP`)
    -----------------------------------------
    x_data : np.ndarray ``(V, D)``, or a list of V arbitrary objects for
        the non-Euclidean path (each augmented point is then the pair
        ``[object, task_index]``).
    y_data : np.ndarray ``(V, No)`` with ``No >= 2`` (use :class:`GP` for
        one output).  ``np.nan`` marks a missing task at that input.
    noise_variances : np.ndarray ``(V, No)``, optional — aligned with
        ``y_data``; NaN positions are dropped together with their y.
    init_hyperparameters : required in practice for custom kernels; the
        default kernel sees index_set_dim = D+1 and gets D+2 default
        hyperparameters.

    Everything else — training, posteriors, metrics, gp2Scale, pickling —
    is inherited.  Posterior methods accept ``x_out`` (1-D array of task
    indices, e.g. ``np.arange(No)``); results are reshaped task-major:
    ``posterior_mean(...)['m(x)'][v, t]`` is input v, task t, and the
    multi-task covariance block is ``(V, V, No, No)``.

    The untransformed data remain available as :attr:`fvgp_x_data`,
    :attr:`fvgp_y_data`, :attr:`fvgp_noise_variances`; ``x_data``/``y_data``
    show the flattened product-space view the model actually trains on.
    """

    def __init__(self, x_data, y_data, init_hyperparameters=None,
                 noise_variances=None, compute_device="cpu",
                 kernel_function=None, kernel_function_grad=None,
                 noise_function=None, noise_function_grad=None,
                 prior_mean_function=None, prior_mean_function_grad=None,
                 gp2Scale=False, dask_client=None, gp2Scale_batch_size=10000,
                 gp2Scale_distribution="blockwise", linalg_mode=None,
                 ram_economy=False, args=None):
        if isinstance(y_data, np.ndarray) and y_data.ndim == 1:
            raise ValueError("The output number is 1, you can use the GP class "
                             "for single-task GPs")
        self.output_num = y_data.shape[1]
        if len(x_data) != len(y_data):
            raise AssertionError("x_data and y_data have different lengths")

        fvgp_x_data = x_data
        fvgp_y_data = y_data
        fvgp_noise_variances = noise_variances
        x_data, y_data, noise_variances = self._transform_index_set2(
            x_data, y_data, noise_variances)

        super().__init__(
            x_data, y_data, init_hyperparameters=init_hyperparameters,
            noise_variances=noise_variances, compute_device=compute_device,
            kernel_function=kernel_function,
            kernel_function_grad=kernel_function_grad,
            prior_mean_function=prior_mean_function,
            prior_mean_function_grad=prior_mean_function_grad,
            noise_function=noise_function,
            noise_function_grad=noise_function_grad,
            gp2Scale=gp2Scale, dask_client=dask_client,
            gp2Scale_batch_size=gp2Scale_batch_size,
            gp2Scale_distribution=gp2Scale_distribution,
            linalg_mode=linalg_mode, ram_economy=ram_economy, args=args)

        self.data.set_fvgp_data(fvgp_x_data, fvgp_y_data, fvgp_noise_variances,
                                np.arange(0, self.output_num))

    @property
    def fvgp_x_data(self):
        """Multi-task input data (without the task column), shape (V, D)."""
        return self.data.fvgp_x_data

    @property
    def fvgp_y_data(self):
        """Observed values in multi-task layout, shape (V, No)."""
        return self.data.fvgp_y_data

    @property
    def fvgp_noise_variances(self):
        """Point-wise noise variances in multi-task layout, or None."""
        return self.data.fvgp_noise_variances

    # ------------------------------------------------------------------
    def update_gp_data(self, x_new, y_new, noise_variances_new=None,
                       append=True, rank_n_update=None):
        """Append/overwrite multi-task data; NaN entries in ``y_new`` mark
        missing tasks (ref fvgp.py:514-586)."""
        if not isinstance(x_new, (np.ndarray, list)):
            raise AssertionError("Wrong format in x_new.")
        if not isinstance(y_new, np.ndarray):
            raise AssertionError("Wrong format in y_new.")
        if len(x_new) != len(y_new):
            raise AssertionError("updated x and y do not have the same lengths.")
        if append and noise_variances_new is not None \
                and not isinstance(noise_variances_new, np.ndarray):
            raise AssertionError("noise_variances_new must be np.ndarray")
        # transform + base update FIRST — if base validation raises (e.g.
        # noise provided at init but absent here) the multi-task bookkeeping
        # must stay untouched (round-1 advisor finding: inconsistent state)
        x_data, y_data, noise_variances = self._transform_index_set2(
            x_new, y_new, noise_variances_new)
        super().update_gp_data(x_data, y_data, noise_variances, append=append,
                               rank_n_update=rank_n_update)
        if append:
            if noise_variances_new is not None:
                fvgp_noise_variances = np.vstack([self.fvgp_noise_variances,
                                                  noise_variances_new])
            else:
                fvgp_noise_variances = self.fvgp_noise_variances
            if isinstance(x_new, np.ndarray):
                fvgp_x_data = np.vstack([self.fvgp_x_data, x_new])
            else:
                fvgp_x_data = self.fvgp_x_data + x_new
            fvgp_y_data = np.vstack([self.fvgp_y_data, y_new])
        else:
            fvgp_noise_variances = noise_variances_new
            fvgp_x_data = x_new
            fvgp_y_data = y_new
        self.data.set_fvgp_data(fvgp_x_data, fvgp_y_data, fvgp_noise_variances,
                                np.arange(0, self.output_num))

    # ------------------------------------------------------------------
    def _transform_index_set2(self, x_data, y_data, noise_variances):
        """Flatten (V, No) observations into task-augmented points [x, task],
        skipping NaNs (ref fvgp.py:589-623)."""
        if not isinstance(x_data, (np.ndarray, list)):
            raise AssertionError("x_data must be np.ndarray or list")
        if not isinstance(y_data, np.ndarray):
            raise AssertionError("y_data must be np.ndarray")
        if len(x_data) != len(y_data):
            raise AssertionError("x_data and y_data have different lengths")
        if noise_variances is not None and len(noise_variances) != len(y_data):
            raise AssertionError("noise_variances and y_data have different lengths")
        if not (y_data.ndim == 2 and y_data.shape[1] == self.output_num):
            raise AssertionError(
                f"y_data must be (V, {self.output_num}) for output_num="
                f"{self.output_num}; got shape {y_data.shape}")
        if noise_variances is not None and not (
                noise_variances.ndim == 2
                and noise_variances.shape[1] == self.output_num):
            raise AssertionError(
                f"noise_variances must be (V, {self.output_num}); got shape "
                f"{np.shape(noise_variances)}")
        # NaN marks a missing task.  Task-major flattening order (all
        # surviving points of task 0, then task 1, ...) — the loop order of
        # ref fvgp.py:589-623.  nonzero on the transposed mask yields
        # exactly that order, so the ndarray ingest is three vectorized
        # gathers instead of a V*No python loop (minutes at N~1M).
        task_i, point_j = np.nonzero(~np.isnan(y_data).T)
        new_y_data = y_data[point_j, task_i]
        new_variances = (None if noise_variances is None
                         else np.asarray(noise_variances)[point_j, task_i])
        if isinstance(x_data, np.ndarray):
            new_x_data = np.column_stack(
                [x_data[point_j], task_i.astype(np.result_type(
                    x_data.dtype, np.float64), copy=False)])
        else:           # non-Euclidean points: [object, task] pairs
            new_x_data = [[x_data[j], int(i)]
                          for i, j in zip(task_i, point_j)]
        return new_x_data, new_y_data, new_variances

    def __getstate__(self):
        state = dict(output_num=self.output_num)
        state.update(super().__getstate__())
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)

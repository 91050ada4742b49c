"""Deep kernel warping networks
(parity target: /root/reference/fvgp/deep_kernel_network.py).

The reference ships two small torch MLPs whose flattened weights ride in the
GP hyperparameter vector and warp the inputs of a stationary kernel.  Here
they are pure-jnp modules (no framework dependency — the parameter layout
must match the hyperparameter-vector contract exactly), so a deep kernel is
jit-traceable end-to-end and its weights train by ``jax.grad`` through the
marginal likelihood, multi-started by ``method='hgdl'``.

Layout contract (ref deep_kernel_network.py:5-35): three dense layers
in→W1→W2→out with biases, parameters flattened in layer order
(W1, b1, W2, b2, W3, b3), and
``number_of_hps = iw*(id+1) + w2*(w1+1) + od*(w2+1) [+ extra kernel hps]``.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["Network", "WarpNet", "get_number_of_hps"]


def get_number_of_hps(input_dim, layer1_width, layer2_width, output_dim):
    """Number of flattened MLP parameters (ref deep_kernel_network.py:24)."""
    return (layer1_width * (input_dim + 1)
            + layer2_width * (layer1_width + 1)
            + output_dim * (layer2_width + 1))


class Network:
    """3-layer ReLU MLP whose parameters live in a flat hyperparameter
    slice (ref deep_kernel_network.py:5)."""

    def __init__(self, input_dim, layer1_width, layer2_width, output_dim):
        self.dims = (input_dim, layer1_width, layer2_width, output_dim)
        self.number_of_hps = get_number_of_hps(input_dim, layer1_width,
                                               layer2_width, output_dim)

    def unflatten(self, hps):
        """Split a flat vector into (W1, b1, W2, b2, W3, b3)."""
        d, w1, w2, o = self.dims
        hps = jnp.asarray(hps)
        i = 0
        W1 = hps[i:i + w1 * d].reshape(w1, d); i += w1 * d
        b1 = hps[i:i + w1]; i += w1
        W2 = hps[i:i + w2 * w1].reshape(w2, w1); i += w2 * w1
        b2 = hps[i:i + w2]; i += w2
        W3 = hps[i:i + o * w2].reshape(o, w2); i += o * w2
        b3 = hps[i:i + o]; i += o
        return W1, b1, W2, b2, W3, b3

    def __call__(self, x, hps):
        W1, b1, W2, b2, W3, b3 = self.unflatten(hps)
        x = jnp.asarray(x)
        h = jnp.maximum(x @ W1.T + b1, 0.0)
        h = jnp.maximum(h @ W2.T + b2, 0.0)
        return h @ W3.T + b3

    forward = __call__

    def set_weights(self, hps):
        """API-parity shim: the network is stateless; returns hps."""
        return np.asarray(hps)

    def get_weights(self, hps):
        return np.asarray(hps)


class WarpNet(Network):
    """Input-warping variant with a bounded output layer
    (ref deep_kernel_network.py:43): tanh head keeps warped coordinates in
    a box, which stabilizes length-scale learning."""

    def __call__(self, x, hps):
        W1, b1, W2, b2, W3, b3 = self.unflatten(hps)
        x = jnp.asarray(x)
        h = jnp.tanh(x @ W1.T + b1)
        h = jnp.tanh(h @ W2.T + b2)
        return jnp.tanh(h @ W3.T + b3)

    forward = __call__


def make_deep_kernel(network, base_kernel=None, n_extra_hps=2):
    """A ready-to-use deep kernel: warp both inputs through ``network`` and
    apply a stationary base kernel with trailing hyperparameters.

    hps layout: [network weights..., signal variance, length scale]
    (or ``n_extra_hps`` trailing values consumed by ``base_kernel``).
    """
    from ..kernels import get_distance_matrix, matern_kernel_diff2

    if base_kernel is None:
        def base_kernel(d, extra):
            return extra[0] * matern_kernel_diff2(d, extra[1])

    n_w = network.number_of_hps

    def kernel(x1, x2, hps):
        w = hps[:n_w]
        extra = hps[n_w:n_w + n_extra_hps]
        z1 = network(x1, w)
        z2 = network(x2, w)
        return base_kernel(get_distance_matrix(z1, z2), extra)

    kernel.number_of_hps = n_w + n_extra_hps
    return kernel

"""Cross-framework numerical parity: the SR-GAN loss stack re-implemented
independently in PyTorch (CPU) must match the JAX implementation on
identical weights/inputs — including the gradient penalty's input
gradients AND the discriminator parameter gradients (the double
backward).

SURVEY.md §4 calls for numerical parity against the (PyTorch) reference;
the reference mount is empty, so this is the strongest available
substitute: the same behavioral spec implemented twice, compared
stream-by-stream. A sign/scale/exponent mistake in either implementation
would break the agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from srgan_tpu import losses
from srgan_tpu.models.mlp import CoefficientGenerator, CoefficientMLP

B, OBS, HID, Z = 8, 10, 16, 10
GP_MULT = 10.0
UNL_MULT, FAKE_MULT = 1.0, 1.0


def _dense_params(params, name):
    leaf = params["params"][name]
    return np.asarray(leaf["kernel"]), np.asarray(leaf["bias"])


class TorchMLP:
    """Torch mirror of CoefficientMLP built from the flax parameters."""

    def __init__(self, flax_params):
        self.layers = []
        for i in range(3):
            k, b = _dense_params(flax_params, f"Dense_{i}")
            self.layers.append((torch.tensor(k, dtype=torch.float64),
                                torch.tensor(b, dtype=torch.float64)))

    def __call__(self, x):
        h = x
        for k, b in self.layers[:2]:
            h = F.leaky_relu(h @ k + b, 0.01)
        features = h
        k, b = self.layers[2]
        pred = (features @ k + b).squeeze(-1)
        return pred, features


def torch_feature_distance(a, b, order):
    diff = (a.mean(dim=0) - b.mean(dim=0)).abs()
    if order == 1.0:
        return diff.sum()
    return torch.sqrt((diff ** 2).sum() + 1e-12)


def _setup():
    d = CoefficientMLP(hidden_size=HID)
    g = CoefficientGenerator(observation_count=OBS, hidden_size=HID)
    key = jax.random.key(0)
    d_params = d.init(key, jnp.zeros((1, OBS)))
    g_params = g.init(key, jnp.zeros((1, Z)))

    rng = np.random.default_rng(0)
    labeled = rng.standard_normal((B, OBS)).astype(np.float64)
    labels = rng.standard_normal((B,)).astype(np.float64)
    unlabeled = rng.standard_normal((B, OBS)).astype(np.float64)
    z = rng.standard_normal((B, Z)).astype(np.float64)
    alpha = rng.uniform(0, 1, (B,)).astype(np.float64)
    return d, g, d_params, g_params, labeled, labels, unlabeled, z, alpha


def _jax_streams(d, d_params, fake, labeled, labels, unlabeled, alpha):
    pred_l, f_l = d.apply(d_params, jnp.asarray(labeled, jnp.float32))
    _, f_u = d.apply(d_params, jnp.asarray(unlabeled, jnp.float32))
    _, f_f = d.apply(d_params, jnp.asarray(fake, jnp.float32))
    l_loss = losses.labeled_loss(pred_l, jnp.asarray(labels, jnp.float32))
    u_loss = losses.unlabeled_loss(f_l, f_u, UNL_MULT, order=2.0)
    f_loss = losses.fake_loss(f_u, f_f, FAKE_MULT, order=1.0,
                              distance_function="log")
    interp = losses.interpolate_inputs(
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(unlabeled, jnp.float32),
        jnp.asarray(fake, jnp.float32))
    f_u_const = jax.lax.stop_gradient(f_u)

    def interp_loss(x):
        _, f_i = d.apply(d_params, x)
        return losses.fake_loss(f_u_const, f_i, FAKE_MULT, order=1.0,
                                distance_function="log")

    grads_x = jax.grad(interp_loss)(interp)
    gp = losses.gradient_penalty(grads_x, GP_MULT)
    return l_loss, u_loss, f_loss, gp, grads_x


def _torch_streams(td, fake, labeled, labels, unlabeled, alpha):
    tl = torch.tensor(labeled)
    tu = torch.tensor(unlabeled)
    tf_ = torch.tensor(fake, dtype=torch.float64)
    pred_l, f_l = td(tl)
    _, f_u = td(tu)
    _, f_f = td(tf_)
    l_loss = ((pred_l - torch.tensor(labels)) ** 2).mean()
    u_loss = torch_feature_distance(f_l, f_u, 2.0) * UNL_MULT
    f_loss = -torch.log(
        torch_feature_distance(f_u, f_f, 1.0) + 1.0) * FAKE_MULT
    a = torch.tensor(alpha).unsqueeze(-1)
    interp = (a * tu + (1 - a) * tf_).requires_grad_(True)
    _, f_i = td(interp)
    interp_loss = -torch.log(
        torch_feature_distance(f_u.detach(), f_i, 1.0) + 1.0) * FAKE_MULT
    (grads_x,) = torch.autograd.grad(interp_loss, interp,
                                     create_graph=True)
    norms = torch.sqrt((grads_x ** 2).sum(dim=1) + 1e-12)
    gp = ((norms - 1.0) ** 2).mean() * GP_MULT
    return l_loss, u_loss, f_loss, gp, grads_x


def test_stream_values_match():
    d, g, d_params, g_params, labeled, labels, unlabeled, z, alpha = \
        _setup()
    fake = np.asarray(g.apply(g_params, jnp.asarray(z, jnp.float32)),
                      np.float64)
    jl, ju, jf, jgp, jgrads = _jax_streams(d, d_params, fake, labeled,
                                           labels, unlabeled, alpha)
    td = TorchMLP(d_params)
    tl, tu, tf_, tgp, tgrads = _torch_streams(td, fake, labeled, labels,
                                              unlabeled, alpha)
    np.testing.assert_allclose(float(jl), tl.item(), rtol=1e-4)
    np.testing.assert_allclose(float(ju), tu.item(), rtol=1e-4)
    np.testing.assert_allclose(float(jf), tf_.item(), rtol=1e-4)
    np.testing.assert_allclose(float(jgp), tgp.item(), rtol=1e-3)
    # per-element input gradients of the contrasting loss at interpolates
    np.testing.assert_allclose(np.asarray(jgrads, np.float64),
                               tgrads.detach().numpy(), rtol=1e-3,
                               atol=1e-7)


def test_parameter_gradients_match_double_backward():
    """d(total)/d(D params) — including through the gradient penalty's
    double backward — agrees between jax.grad and torch.autograd."""
    d, g, d_params, g_params, labeled, labels, unlabeled, z, alpha = \
        _setup()
    fake = np.asarray(g.apply(g_params, jnp.asarray(z, jnp.float32)),
                      np.float64)

    def total_loss(params):
        l, u, f, gp, _ = _jax_streams(d, params, fake, labeled, labels,
                                      unlabeled, alpha)
        return l + u + f + gp

    jax_grads = jax.grad(total_loss)(d_params)

    td = TorchMLP(d_params)
    for k, b in td.layers:
        k.requires_grad_(True)
        b.requires_grad_(True)
    tl, tu, tf_, tgp, _ = _torch_streams(td, fake, labeled, labels,
                                         unlabeled, alpha)
    total = tl + tu + tf_ + tgp
    total.backward()

    for i in range(3):
        jk = np.asarray(jax_grads["params"][f"Dense_{i}"]["kernel"],
                        np.float64)
        jb = np.asarray(jax_grads["params"][f"Dense_{i}"]["bias"],
                        np.float64)
        tk, tb = td.layers[i]
        np.testing.assert_allclose(jk, tk.grad.numpy(), rtol=2e-3,
                                   atol=1e-6,
                                   err_msg=f"kernel grad layer {i}")
        np.testing.assert_allclose(jb, tb.grad.numpy(), rtol=2e-3,
                                   atol=1e-6,
                                   err_msg=f"bias grad layer {i}")


def test_generator_loss_matches():
    d, g, d_params, g_params, labeled, labels, unlabeled, z, alpha = \
        _setup()
    fake = np.asarray(g.apply(g_params, jnp.asarray(z, jnp.float32)),
                      np.float64)
    _, f_u = d.apply(d_params, jnp.asarray(unlabeled, jnp.float32))
    _, f_f = d.apply(d_params, jnp.asarray(fake, jnp.float32))
    j_g = float(losses.generator_loss(f_u, f_f, order=2.0))
    td = TorchMLP(d_params)
    _, tf_u = td(torch.tensor(unlabeled))
    _, tf_f = td(torch.tensor(fake, dtype=torch.float64))
    t_g = torch_feature_distance(tf_u, tf_f, 2.0).item()
    np.testing.assert_allclose(j_g, t_g, rtol=1e-4)

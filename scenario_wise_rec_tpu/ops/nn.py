"""Functional NN building blocks with explicit parameter/state pytrees.

TPU-native re-design of the reference's basic blocks
(reference: scenario_wise_rec/basic/layers.py). Everything here is a pure
function of ``(params, state, inputs)`` so the whole train step jits into one
XLA program:

- ``linear_*``        — y = x @ W + b, W stored (in, out) for MXU-friendly GEMMs
- ``batchnorm_*``     — torch BatchNorm1d semantics (batch stats in train,
                        running stats in eval, unbiased-var running update)
- ``layernorm_*``     — torch LayerNorm semantics (used by M3oE's Mlp_N)
- ``MLP``             — [Linear -> BN -> act -> Dropout]* (+ optional (·,1) head)
                        (reference layers.py:231-264)
- ``GateNU``          — PEPNet gate: 2-layer net, 2*sigmoid (layers.py:307-320)
- ``Pruner``          — AdaSparse pruner with Binarization/Scaling/Fusion forms
                        (layers.py:270-305)
- ``domain_norm``     — STAR/HAMUR batch-statistics normalization
                        (star.py:95-100, hamur.py:191-195)
- ``stacked_init/apply`` — vmap helpers that turn the reference's per-domain
                        Python loops into one batched computation over a
                        leading domain/expert axis (the main idiomatic win:
                        D towers become a single [D, B, ·] einsum on the MXU).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import config as compute_config
from ..core import init as initializers
from ..core.activations import activation as activation_factory

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# --------------------------------------------------------------------------
# Linear
# --------------------------------------------------------------------------


def linear_init(rng, in_dim: int, out_dim: int):
    return initializers.linear_params(rng, in_dim, out_dim)


def linear_apply(params, x):
    return compute_config.matmul(x, params["w"]) + params["b"]


# --------------------------------------------------------------------------
# BatchNorm1d (torch semantics)
# --------------------------------------------------------------------------


def batchnorm_init(dim: int):
    params = {
        "gamma": jnp.ones((dim,), jnp.float32),
        "beta": jnp.zeros((dim,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }
    return params, state


def batch_stats(x, w):
    """(mean, biased var, n) over axis 0, excluding rows with ``w == 0``.

    Static-shape batches are padded with weight-0 rows (data/dataset.py);
    the reference never sees those rows, so every batch-statistics op must
    exclude them or train/eval semantics diverge on ragged batches (the
    bundled 100-row Ali-CCP sample pads 97% of a 4096 batch).
    """
    if w is None:
        mean = jnp.mean(x, axis=0)
        var = jnp.mean((x - mean) ** 2, axis=0)
        return mean, var, jnp.float32(x.shape[0])
    wc = w.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    n = jnp.maximum(jnp.sum(wc), 1.0)
    mean = jnp.sum(x * wc, axis=0) / n
    var = jnp.sum(((x - mean) ** 2) * wc, axis=0) / n
    return mean, var, n


def batchnorm_apply(params, state, x, train: bool, w=None):
    """torch BatchNorm1d: batch stats (biased var) normalize in train mode;
    running stats updated with *unbiased* var; eval uses running stats.
    ``w``: optional [B] 0/1 mask — padded rows are excluded from the stats
    (their outputs are garbage and must be discarded by the caller)."""
    if train:
        mean, var, n = batch_stats(x, w)
        y = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        y = (x - state["mean"]) * jax.lax.rsqrt(state["var"] + BN_EPS)
        new_state = state
    return y * params["gamma"] + params["beta"], new_state


# --------------------------------------------------------------------------
# LayerNorm (torch semantics; used by M3oE Mlp_N, m3oe.py:59)
# --------------------------------------------------------------------------


def layernorm_init(dim: int):
    return {
        "gamma": jnp.ones((dim,), jnp.float32),
        "beta": jnp.zeros((dim,), jnp.float32),
    }


def layernorm_apply(params, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params["gamma"] + params["beta"]


# --------------------------------------------------------------------------
# Domain norm with on-the-fly batch statistics (STAR star.py:95-100,
# HAMUR hamur.py:191-195 — used at train AND eval time, deliberately).
# ``unbiased``: HAMUR uses torch ``.var()`` (unbiased); STAR computes the
# biased mean-square. eps likewise differs (1e-6 vs 1e-5).
# --------------------------------------------------------------------------


def domain_norm(x, gamma, beta, eps: float, unbiased: bool = False, w=None):
    """``w``: optional [B] 0/1 mask — padded rows excluded from the batch
    stats (this norm uses CURRENT-batch statistics even at eval, so the
    mask matters on every ragged batch)."""
    mean, var, n = batch_stats(x, w)
    if unbiased:
        var = var * (n / jnp.maximum(n - 1.0, 1.0))
    x_norm = (x - mean) * jax.lax.rsqrt(var + eps)
    return gamma * x_norm + beta


# --------------------------------------------------------------------------
# Dropout (torch semantics: inverted scaling at train time)
# --------------------------------------------------------------------------


def dropout(rng, x, p: float, train: bool):
    if not train or p <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


# --------------------------------------------------------------------------
# MLP: [Linear -> BatchNorm1d -> activation -> Dropout]* + optional head
# --------------------------------------------------------------------------


class MLP:
    """Functional MLP matching the reference block (layers.py:231-264).

    ``init(rng) -> (params, state)``;
    ``apply(params, state, x, train, rng) -> (y, new_state)``.
    """

    def __init__(
        self,
        input_dim: int,
        dims: Optional[Sequence[int]] = None,
        output_layer: bool = True,
        activation: str = "relu",
        dropout: float = 0.0,
    ):
        self.input_dim = int(input_dim)
        self.dims = tuple(dims or ())
        self.output_layer = bool(output_layer)
        self.act = activation_factory(activation)
        self.dropout_p = float(dropout)
        self.output_dim = 1 if self.output_layer else (
            self.dims[-1] if self.dims else self.input_dim
        )

    def init(self, rng):
        params = {"layers": [], "out": None}
        state = {"layers": []}
        in_dim = self.input_dim
        for d in self.dims:
            rng, kl, ka = jax.random.split(rng, 3)
            bn_p, bn_s = batchnorm_init(d)
            params["layers"].append(
                {"lin": linear_init(kl, in_dim, d), "bn": bn_p, "act": self.act.init(ka)}
            )
            state["layers"].append(bn_s)
            in_dim = d
        if self.output_layer:
            rng, ko = jax.random.split(rng)
            params["out"] = linear_init(ko, in_dim, 1)
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None, w=None):
        new_bn = []
        for i, layer in enumerate(params["layers"]):
            x = linear_apply(layer["lin"], x)
            x, bn_s = batchnorm_apply(layer["bn"], state["layers"][i], x,
                                      train, w)
            new_bn.append(bn_s)
            x = self.act.apply(layer["act"], x)
            if self.dropout_p > 0 and train:
                rng, kd = jax.random.split(rng)
                x = dropout(kd, x, self.dropout_p, train)
        if self.output_layer:
            x = linear_apply(params["out"], x)
        return x, {"layers": new_bn}


# --------------------------------------------------------------------------
# LR + PredictionLayer (parity with layers.py:149-171, :7-24; rarely used)
# --------------------------------------------------------------------------


class LR:
    def __init__(self, input_dim: int, sigmoid: bool = False):
        self.input_dim = input_dim
        self.sigmoid = sigmoid

    def init(self, rng):
        return linear_init(rng, self.input_dim, 1)

    def apply(self, params, x):
        y = linear_apply(params, x)
        return jax.nn.sigmoid(y) if self.sigmoid else y


def prediction_layer(x, task_type: str = "classification"):
    if task_type not in ("classification", "regression"):
        raise ValueError("task_type must be classification or regression")
    return jax.nn.sigmoid(x) if task_type == "classification" else x


# --------------------------------------------------------------------------
# GateNU (PEPNet; layers.py:307-320)
# --------------------------------------------------------------------------


class GateNU:
    def __init__(self, input_dim: int, output_dim: int, hidden_dim: Optional[int] = None,
                 gemma: float = 2.0):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.hidden_dim = output_dim if hidden_dim is None else hidden_dim
        self.gemma = gemma

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "l1": linear_init(k1, self.input_dim, self.hidden_dim),
            "l2": linear_init(k2, self.hidden_dim, self.output_dim),
        }

    def apply(self, params, x):
        h = jax.nn.relu(linear_apply(params["l1"], x))
        return self.gemma * jax.nn.sigmoid(linear_apply(params["l2"], h))


# --------------------------------------------------------------------------
# AdaSparse Pruner (layers.py:270-305)
# --------------------------------------------------------------------------


class Pruner:
    """Domain-adaptive pruner producing (possibly hard-thresholded) weights.

    ``sign(v - eps)`` is kept exactly as the reference computes it — including
    its non-differentiability; gradients flow through the sigmoid branch only
    where the reference's autograd would route them (sign has zero grad).
    """

    FORMS = ("Binarization", "Scaling", "Fusion")

    def __init__(self, sce_dims: int, agn_dims: int, form: str = "Binarization",
                 epsilon: float = 1e-2, beta: float = 2.0):
        if form not in self.FORMS:
            raise ValueError(f"The input 'form' must be one of {list(self.FORMS)}")
        self.sce_dims = sce_dims
        self.agn_dims = agn_dims
        self.form = form
        self.epsilon = epsilon
        self.beta = beta

    def init(self, rng):
        # bias=False linear (layers.py:283)
        p = initializers.linear_params(rng, self.sce_dims + self.agn_dims, self.agn_dims)
        return {"w": p["w"]}

    def apply(self, params, sce, agn, alpha):
        vin = jnp.concatenate([sce, agn], axis=1) @ params["w"]
        if self.form == "Binarization":
            vout = jax.nn.sigmoid(vin * alpha)
            return jnp.sign(vout - self.epsilon)
        if self.form == "Scaling":
            vout = self.beta * jax.nn.sigmoid(vin)
            return vout * jax.lax.stop_gradient(jnp.sign(vout - self.epsilon))
        vout = self.beta * jax.nn.sigmoid(vin * alpha)
        return vout * jax.lax.stop_gradient(jnp.sign(vout - self.epsilon))


# --------------------------------------------------------------------------
# Stacking helpers: replace per-domain/per-expert Python loops with a leading
# axis + vmap. ``stacked_init(module.init, rng, n)`` returns the same pytree
# with every leaf gaining a leading ``n`` axis.
# --------------------------------------------------------------------------


def stacked_init(init_fn, rng, n: int):
    keys = jax.random.split(rng, n)
    return jax.vmap(init_fn)(keys)


def stacked_batchnorm_init(dim: int, n: int):
    """n independent BatchNorm1d's as arrays with leading axis n."""
    params = {
        "gamma": jnp.ones((n, dim), jnp.float32),
        "beta": jnp.zeros((n, dim), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((n, dim), jnp.float32),
        "var": jnp.ones((n, dim), jnp.float32),
    }
    return params, state


def stacked_batchnorm_apply(params, state, x, train: bool, w=None):
    """vmapped BatchNorm over leading axis: x is [n, B, dim]; ``w`` ([B])
    is shared across members."""
    fn = lambda p, s, xi: batchnorm_apply(p, s, xi, train, w)
    return jax.vmap(fn)(params, state, x)


def stacked_mlp_init(mlp: MLP, rng, n: int):
    keys = jax.random.split(rng, n)
    return jax.vmap(mlp.init)(keys)


def stacked_mlp_apply(mlp: MLP, params, state, x, train: bool = False, rng=None,
                      per_member_x: bool = False, w=None):
    """Run ``n`` stacked MLPs on the (shared or per-member) batch.

    Returns ``(y[n, B, out], new_state)``. ``per_member_x=True`` feeds
    ``x[n, B, in]`` member-wise (PLE fan-through, ple.py:107-118).
    ``w`` ([B] padding mask) is shared across members.
    """
    n = jax.tree_util.tree_leaves(params)[0].shape[0]
    if rng is None:
        keys = None
        rng_axis = None
    else:
        keys = jax.random.split(rng, n)
        rng_axis = 0
    x_axis = 0 if per_member_x else None

    def one(p, s, xi, k):
        return mlp.apply(p, s, xi, train, k, w)

    return jax.vmap(one, in_axes=(0, 0, x_axis, rng_axis))(params, state, x, keys)

"""Activation functions as (init, apply) pairs.

Parity surface: reference basic/activation.py:5-54 — sigmoid / relu / dice /
prelu / softmax(dim=1) / leakyrelu(0.1). Dice and PReLU carry learnable
parameters, so every activation is modeled uniformly as a spec with
``init(rng) -> params`` and ``apply(params, x) -> y``; stateless activations
return ``{}`` params. This keeps stacked/vmapped MLPs uniform pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Activation:
    def __init__(self, name, init_fn, apply_fn):
        self.name = name
        self.init = init_fn
        self.apply = apply_fn

    def __repr__(self):  # pragma: no cover
        return f"<Activation {self.name}>"


def _no_params(rng):
    return {}


def _dice_init(rng):
    # reference Dice: alpha = nn.Parameter(torch.randn(1)) (activation.py:13)
    return {"alpha": jax.random.normal(rng, (1,), dtype=jnp.float32)}


def _dice_apply(params, x, epsilon: float = 1e-3):
    """Dice from the DIN paper, replicating the reference's exact math.

    Reference (activation.py:16-25): var is the *sum* over features of
    ``(x - mean)^2 + eps`` (note: eps added per-element before the sum, and no
    division by feature count) — reproduced as-is for metric parity.
    """
    avg = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.sum((x - avg) ** 2 + epsilon, axis=1, keepdims=True)
    ps = jax.nn.sigmoid((x - avg) / jnp.sqrt(var))
    return ps * x + (1 - ps) * params["alpha"] * x


def _prelu_init(rng):
    # torch nn.PReLU default: single weight initialised to 0.25
    return {"alpha": jnp.full((1,), 0.25, dtype=jnp.float32)}


def _prelu_apply(params, x):
    return jnp.where(x >= 0, x, params["alpha"] * x)


_REGISTRY = {
    "sigmoid": Activation("sigmoid", _no_params, lambda p, x: jax.nn.sigmoid(x)),
    "relu": Activation("relu", _no_params, lambda p, x: jax.nn.relu(x)),
    "dice": Activation("dice", _dice_init, _dice_apply),
    "prelu": Activation("prelu", _prelu_init, _prelu_apply),
    # reference nn.Softmax(dim=1) — always applied to 2-D gate logits
    "softmax": Activation("softmax", _no_params, lambda p, x: jax.nn.softmax(x, axis=1)),
    "leakyrelu": Activation(
        "leakyrelu", _no_params, lambda p, x: jnp.where(x >= 0, x, 0.1 * x)
    ),
}


def activation(name: str) -> Activation:
    """String -> Activation factory (reference activation.py:28-54)."""
    if isinstance(name, Activation):
        return name
    key = name.lower()
    if key not in _REGISTRY:
        raise NotImplementedError(f"activation '{name}' not supported")
    return _REGISTRY[key]

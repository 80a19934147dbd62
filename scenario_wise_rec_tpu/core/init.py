"""Parameter initializers.

Each initializer is a function ``(rng, shape) -> jnp.ndarray`` (f32).
Distribution families replicate torch defaults so training dynamics match the
reference (basic/initializers.py:4-92 and torch's nn.Linear/kaiming defaults),
while the actual draws use JAX's counter-based PRNG — bit-exactness with torch
RNG is neither possible nor needed; parity tests compare distributions and
end-metric behavior instead.

torch fan convention for a 2-D tensor: ``fan_in = shape[1]``,
``fan_out = shape[0]``. Several reference models store weight matrices as
``(in, out)`` and call torch initializers on them (e.g. star.py:68-76), which
makes torch's "fan_in" actually the *output* dim — `kaiming_uniform_torch`
reproduces that quirk on purpose.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def random_normal(mean: float = 0.0, std: float = 1.0):
    def _init(rng, shape):
        return mean + std * jax.random.normal(rng, shape, dtype=jnp.float32)

    return _init


def random_uniform(minval: float = 0.0, maxval: float = 1.0):
    def _init(rng, shape):
        return jax.random.uniform(
            rng, shape, dtype=jnp.float32, minval=minval, maxval=maxval
        )

    return _init


def _torch_fans(shape):
    """torch _calculate_fan_in_and_fan_out for 2-D tensors."""
    assert len(shape) >= 2, "fan init needs >= 2 dims"
    fan_in = shape[1]
    fan_out = shape[0]
    if len(shape) > 2:
        receptive = math.prod(shape[2:])
        fan_in *= receptive
        fan_out *= receptive
    return fan_in, fan_out


def xavier_normal(gain: float = 1.0):
    def _init(rng, shape):
        fan_in, fan_out = _torch_fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(rng, shape, dtype=jnp.float32)

    return _init


def xavier_uniform(gain: float = 1.0):
    def _init(rng, shape):
        fan_in, fan_out = _torch_fans(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(
            rng, shape, dtype=jnp.float32, minval=-bound, maxval=bound
        )

    return _init


def kaiming_uniform_torch(a: float = 0.0):
    """torch ``init.kaiming_uniform_`` with fan computed torch-style.

    Default ``a=0`` + leaky_relu gain = sqrt(2) -> bound = sqrt(6 / fan) where
    ``fan = shape[1]`` (star.py:69-75 applies this to ``(in, out)`` matrices,
    so "fan" is the layer's output width — preserved deliberately).
    """

    def _init(rng, shape):
        fan = _torch_fans(shape)[0]
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(
            rng, shape, dtype=jnp.float32, minval=-bound, maxval=bound
        )

    return _init


def pretrained(weight, freeze: bool = True):
    """Initializer returning a fixed pretrained table.

    ``freeze=True`` is honored by CTRTrainer in EVERY update mode
    (train/freeze.py): the dense optax chain's final updates are masked
    on the frozen rows, and the row-sparse/streaming embedding updates
    drop frozen ids from their write-backs — the table stays bit-identical
    through ``fit()`` (tests/test_freeze.py). Reference:
    ``nn.Embedding.from_pretrained(..., freeze=True)``,
    basic/initializers.py:76-92.
    """
    weight = jnp.asarray(weight, dtype=jnp.float32)

    def _init(rng, shape):
        assert tuple(shape) == tuple(weight.shape), (
            f"pretrained weight shape {weight.shape} != requested {shape}"
        )
        return weight

    _init.freeze = freeze  # type: ignore[attr-defined]
    return _init


# ---- torch.nn.Linear default init (kaiming_uniform(a=sqrt(5)) + bias bound) --


def linear_params(rng, in_dim: int, out_dim: int):
    """Weight ``(in, out)`` + bias ``(out,)`` matching torch.nn.Linear defaults.

    torch: W ~ U(-1/sqrt(in), 1/sqrt(in)), b ~ U(-1/sqrt(in), 1/sqrt(in)).
    We store W as (in, out) so forward is ``x @ W + b`` (row-major batch on
    the MXU); the distribution uses the true input fan.
    """
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim) if in_dim > 0 else 0.0
    w = jax.random.uniform(
        kw, (in_dim, out_dim), dtype=jnp.float32, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(
        kb, (out_dim,), dtype=jnp.float32, minval=-bound, maxval=bound
    )
    return {"w": w, "b": b}

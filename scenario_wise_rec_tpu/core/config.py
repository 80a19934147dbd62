"""Global compute configuration.

``compute_dtype``: when set to ``jnp.bfloat16``, matmul/einsum inputs are
cast to bf16 and accumulated in f32 on the MXU (2x MXU throughput, halved
weight-side HBM traffic). Parameters stay f32. Default ``None`` keeps full
f32 everywhere — the parity configuration.

Set it BEFORE building/jitting a model (the flag is read at trace time):

    from scenario_wise_rec_tpu.core import config
    config.set_compute_dtype(jnp.bfloat16)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_compute_dtype = None

# How embedding-table gradients are accumulated (ops/embedding.py):
#   "auto"    — one-hot matmul on accelerators, XLA scatter-add on CPU
#   "onehot"  — always the MXU one-hot matmul segment-sum
#   "scatter" — always XLA scatter-add (the autodiff default)
# On TPU (v5e, measured through axon) XLA lowers scatter-add to a serialized
# per-row loop: 5.7 ms for the flagship batch vs 0.27 ms for the one-hot
# matmul — a 21x difference that dominates the whole train step. The one-hot
# path is numerically exact in f32 (the one-hot factor is 0/1).
_embedding_grad_mode = "auto"

# Per-feature vocab ceiling for the one-hot backward under "auto": its cost
# is O(ids · vocab · D) MXU FLOPs per feature and grows linearly in vocab,
# while the scatter-add's serialized per-row cost is O(ids) and roughly
# vocab-independent. Measured on v5e b4096 (README "production vocab"
# table): one-hot wins 21x at 20k/feature, but at 467k/feature the program
# does not even finish the remote XLA compile in 25 min — features above
# the ceiling fall back to the scatter transpose (ops/embedding.py splits
# the packed gather by group). At that scale the right tool is
# sparse_embedding_updates=True, which materializes nothing O(vocab).
_onehot_vocab_ceiling = 100_000


def set_compute_dtype(dtype: Optional[jnp.dtype]) -> None:
    global _compute_dtype
    _compute_dtype = dtype


def get_compute_dtype():
    return _compute_dtype


def set_embedding_grad_mode(mode: str) -> None:
    assert mode in ("auto", "onehot", "scatter"), mode
    global _embedding_grad_mode
    _embedding_grad_mode = mode


def get_embedding_grad_mode() -> str:
    return _embedding_grad_mode


def set_onehot_vocab_ceiling(vocab: int) -> None:
    global _onehot_vocab_ceiling
    _onehot_vocab_ceiling = int(vocab)


def get_onehot_vocab_ceiling() -> int:
    return _onehot_vocab_ceiling


def use_onehot_embedding_grad(max_span_vocab: Optional[int] = None) -> bool:
    """Resolve the embedding-grad mode at trace time.

    ``max_span_vocab``: the largest per-feature vocab the gather touches;
    under "auto" a feature group above the ceiling uses the scatter
    transpose instead (forced "onehot" ignores the ceiling).
    """
    import jax

    if _embedding_grad_mode == "auto":
        if jax.default_backend() == "cpu":
            return False
        return (max_span_vocab is None
                or max_span_vocab <= _onehot_vocab_ceiling)
    return _embedding_grad_mode == "onehot"


def matmul(x, w):
    """x @ w honoring the compute dtype (f32 accumulation on the MXU)."""
    if _compute_dtype is not None:
        return jnp.dot(x.astype(_compute_dtype), w.astype(_compute_dtype),
                       preferred_element_type=jnp.float32)
    return x @ w


def einsum(spec: str, *args):
    """einsum honoring the compute dtype (f32 accumulation)."""
    if _compute_dtype is not None:
        args = tuple(a.astype(_compute_dtype) for a in args)
        return jnp.einsum(spec, *args, preferred_element_type=jnp.float32)
    return jnp.einsum(spec, *args)


def enable_persistent_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a local directory.

    The axon remote-compile service costs 3-15 MINUTES per distinct XLA
    program; the persistent cache cuts a warm re-run of bench.py from ~10min
    to ~24s (measured). No-op if the user already configured a cache dir
    (``JAX_COMPILATION_CACHE_DIR`` env or jax.config) or opted out with
    ``SWR_NO_COMPILE_CACHE=1``. Safe on every backend.
    """
    import os

    import jax

    if os.environ.get("SWR_NO_COMPILE_CACHE") == "1":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.path.expanduser("~/.cache/scenario_wise_rec_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)

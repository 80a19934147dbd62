"""torch-parity Transformer (post-norm encoder/decoder).

Exists solely for M2M, which feeds its flat ``[B, D]`` embedding to
``nn.Transformer(d_model=input_dim, nhead=4, 2 enc / 2 dec, ff=16)``
(reference m2m.py:21,48). torch treats the 2-D input as an *unbatched
sequence of length B* — attention mixes information **across examples in the
batch**. That quirk is load-bearing for metric parity and is reproduced
deliberately: this module operates on a single ``[L, E]`` sequence.

Semantics matched to torch defaults: post-norm (norm_first=False), ReLU
feed-forward, dropout 0.1 (attention weights + residual branches), final
LayerNorm on both stacks, xavier-uniform init for every matrix
(nn.Transformer._reset_parameters), zero attention biases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import init as initializers
from .nn import dropout as dropout_fn, layernorm_apply, layernorm_init


def _mha_init(rng, d_model: int):
    k1, k2 = jax.random.split(rng)
    xavier = initializers.xavier_uniform()
    return {
        "in_w": xavier(k1, (3 * d_model, d_model)),
        "in_b": jnp.zeros((3 * d_model,), jnp.float32),
        "out_w": xavier(k2, (d_model, d_model)),
        "out_b": jnp.zeros((d_model,), jnp.float32),
    }


def _mha_apply(params, q_in, kv_in, nhead: int, p_drop: float, train: bool, rng,
               key_mask=None):
    """Multi-head attention on unbatched [L, E] sequences (torch semantics).

    ``key_mask``: optional [S] 0/1 mask — positions with 0 (static-shape
    batch padding, data/dataset.py) are excluded from attention, as if the
    row did not exist (the reference's batches never contain them).
    """
    L, E = q_in.shape
    S = kv_in.shape[0]
    hd = E // nhead
    w_q, w_k, w_v = jnp.split(params["in_w"], 3, axis=0)
    b_q, b_k, b_v = jnp.split(params["in_b"], 3, axis=0)
    q = (q_in @ w_q.T + b_q).reshape(L, nhead, hd).transpose(1, 0, 2)
    k = (kv_in @ w_k.T + b_k).reshape(S, nhead, hd).transpose(1, 0, 2)
    v = (kv_in @ w_v.T + b_v).reshape(S, nhead, hd).transpose(1, 0, 2)
    attn = jnp.einsum("hld,hsd->hls", q, k) / jnp.sqrt(hd).astype(q.dtype)
    if key_mask is not None:
        neg = jnp.finfo(attn.dtype).min
        attn = jnp.where(key_mask[None, None, :] > 0, attn, neg)
    attn = jax.nn.softmax(attn, axis=-1)
    if train and p_drop > 0:
        rng, kd = jax.random.split(rng)
        attn = dropout_fn(kd, attn, p_drop, train)
    out = jnp.einsum("hls,hsd->hld", attn, v).transpose(1, 0, 2).reshape(L, E)
    return out @ params["out_w"].T + params["out_b"]


def _ff_init(rng, d_model: int, d_ff: int):
    k1, k2 = jax.random.split(rng)
    return {
        "l1": initializers.linear_params(k1, d_model, d_ff),
        "l2": initializers.linear_params(k2, d_ff, d_model),
    }


class Transformer:
    """Full encoder-decoder stack; ``apply`` maps ``(src[L,E], tgt[L,E])`` to
    the decoded ``[L, E]``."""

    def __init__(self, d_model: int, nhead: int = 4, num_encoder_layers: int = 2,
                 num_decoder_layers: int = 2, dim_feedforward: int = 16,
                 dropout: float = 0.1):
        assert d_model % nhead == 0, "d_model must divide nhead"
        self.d_model = d_model
        self.nhead = nhead
        self.n_enc = num_encoder_layers
        self.n_dec = num_decoder_layers
        self.d_ff = dim_feedforward
        self.p = dropout

    def init(self, rng):
        xavier = initializers.xavier_uniform()
        params = {"enc": [], "dec": []}
        keys = jax.random.split(rng, self.n_enc * 2 + self.n_dec * 3 + 2)
        ki = 0
        for _ in range(self.n_enc):
            params["enc"].append({
                "attn": _mha_init(keys[ki], self.d_model),
                "ff": _ff_init(keys[ki + 1], self.d_model, self.d_ff),
                "norm1": layernorm_init(self.d_model),
                "norm2": layernorm_init(self.d_model),
            })
            ki += 2
        for _ in range(self.n_dec):
            params["dec"].append({
                "self_attn": _mha_init(keys[ki], self.d_model),
                "cross_attn": _mha_init(keys[ki + 1], self.d_model),
                "ff": _ff_init(keys[ki + 2], self.d_model, self.d_ff),
                "norm1": layernorm_init(self.d_model),
                "norm2": layernorm_init(self.d_model),
                "norm3": layernorm_init(self.d_model),
            })
            ki += 3
        # xavier the FF matrices too (nn.Transformer._reset_parameters hits
        # every dim>1 parameter)
        def _rexavier(tree, key):
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            ks = jax.random.split(key, len(leaves))
            new = [xavier(k, l.shape) if l.ndim > 1 else l
                   for k, l in zip(ks, leaves)]
            return jax.tree_util.tree_unflatten(treedef, new)

        params = _rexavier(params, keys[ki])
        params["enc_norm"] = layernorm_init(self.d_model)
        params["dec_norm"] = layernorm_init(self.d_model)
        return params

    def _ff(self, ff, x, train, rng):
        h = jax.nn.relu(x @ ff["l1"]["w"] + ff["l1"]["b"])
        if train and self.p > 0:
            rng, kd = jax.random.split(rng)
            h = dropout_fn(kd, h, self.p, train)
        return h @ ff["l2"]["w"] + ff["l2"]["b"]

    def _res(self, x, sub, train, rng):
        if train and self.p > 0:
            rng, kd = jax.random.split(rng)
            sub = dropout_fn(kd, sub, self.p, train)
        return x + sub

    def apply(self, params, src, tgt, train: bool = False, rng=None, w=None):
        """``w``: optional [L] 0/1 padding mask over the (batch-as-sequence)
        positions — padded rows are masked out as attention KEYS everywhere
        (self- and cross-attention), matching the reference where they do
        not exist. Their own outputs are garbage and must be discarded."""
        if rng is None:
            rng = jax.random.PRNGKey(0)  # eval: dropout disabled, key unused
        keys = jax.random.split(rng, (self.n_enc + self.n_dec) * 8)
        ki = 0

        h = src
        for layer in params["enc"]:
            a = _mha_apply(layer["attn"], h, h, self.nhead, self.p, train,
                           keys[ki], key_mask=w)
            h = layernorm_apply(layer["norm1"],
                                self._res(h, a, train, keys[ki + 1]))
            f = self._ff(layer["ff"], h, train, keys[ki + 2])
            h = layernorm_apply(layer["norm2"],
                                self._res(h, f, train, keys[ki + 3]))
            ki += 4
        memory = layernorm_apply(params["enc_norm"], h)

        t = tgt
        for layer in params["dec"]:
            a = _mha_apply(layer["self_attn"], t, t, self.nhead, self.p, train,
                           keys[ki], key_mask=w)
            t = layernorm_apply(layer["norm1"],
                                self._res(t, a, train, keys[ki + 1]))
            c = _mha_apply(layer["cross_attn"], t, memory, self.nhead, self.p,
                           train, keys[ki + 2], key_mask=w)
            t = layernorm_apply(layer["norm2"],
                                self._res(t, c, train, keys[ki + 3]))
            f = self._ff(layer["ff"], t, train, keys[ki + 4])
            t = layernorm_apply(layer["norm3"],
                                self._res(t, f, train, keys[ki + 5]))
            ki += 6
        return layernorm_apply(params["dec_norm"], t)

"""HAMUR: per-domain MLP backbones with hyper-network-generated adapters.

TPU-native rebuild of reference hamur.py:8-378 (plus the file's unused MLP
baselines, hamur.py:380-547, as :class:`MlpNLayer`):

- per-domain backbone: N x [Linear -> BN -> ReLU] + Linear(·, 1), stacked on
  a leading domain axis (hamur.py:25-58 / :262-273);
- a *shared* hyper-network maps the instance embedding to a ``k x k`` matrix
  (hamur.py:77-86). The reference calls it once per domain branch on the same
  input — identical outputs, but its BatchNorm running stats get updated D
  times per forward; replicated exactly via the closed-form D-fold EMA
  update;
- adapter cells (hamur.py:156-198): down-proj ``U·H·V`` einsum, sigmoid,
  up-proj, **batch-statistics domain-norm** (unbiased var, eps 1e-5, shared
  gamma/beta across domains), residual. Large: adapters after blocks 6 and 7;
  Small: one adapter after block 2;
- u/v adapter factors initialized to ones (hamur.py:66-74), biases zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import config as compute_config
from ..core import init as initializers
from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import (
    BN_MOMENTUM,
    batchnorm_apply,
    batchnorm_init,
    domain_norm,
    linear_apply,
    linear_init,
    stacked_batchnorm_apply,
    stacked_batchnorm_init,
)
from ..ops.select import domain_select
from .base import Model, domain_ids


class _Hamur(Model):
    """Shared implementation; ``adapter_after`` = 1-indexed block positions."""

    ADAPTER_MID = 32  # down-projection width (hamur.py:66-74)

    def __init__(self, features, domain_num: int, fcn_dims, hyper_dims, k: int,
                 adapter_after):
        self.features = tuple(features)
        self.input_dim = sum_embed_dims(features)
        self.fcn_dim = [self.input_dim] + list(fcn_dims)
        self.n_blocks = len(fcn_dims)
        self.domain_num = domain_num
        self.k = k
        self.adapter_after = tuple(adapter_after)
        self.hyper_dims = list(hyper_dims) + [k * k]
        self.embedding = EmbeddingCollection(features)

    def init(self, rng):
        D = self.domain_num
        n_keys = 2 + self.n_blocks + len(self.hyper_dims) + len(self.adapter_after)
        keys = jax.random.split(rng, n_keys)
        params = {"embedding": self.embedding.init(keys[0]), "blocks": [],
                  "hyper": [], "adapters": []}
        state = {"blocks": [], "hyper": []}

        # per-domain backbone blocks (stacked on D)
        for i in range(self.n_blocks):
            din, dout = self.fcn_dim[i], self.fcn_dim[i + 1]
            lin = jax.vmap(lambda kk: linear_init(kk, din, dout))(
                jax.random.split(keys[2 + i], D)
            )
            bn_p, bn_s = stacked_batchnorm_init(dout, D)
            params["blocks"].append({"lin": lin, "bn": bn_p})
            state["blocks"].append(bn_s)
        final = jax.vmap(lambda kk: linear_init(kk, self.fcn_dim[-1], 1))(
            jax.random.split(keys[1], D)
        )
        params["final"] = final

        # shared hyper-network: [Linear -> BN -> ReLU -> Dropout(0)]*
        hin = self.input_dim
        for i, hdim in enumerate(self.hyper_dims):
            bn_p, bn_s = batchnorm_init(hdim)
            params["hyper"].append({
                "lin": linear_init(keys[2 + self.n_blocks + i], hin, hdim),
                "bn": bn_p,
            })
            state["hyper"].append(bn_s)
            hin = hdim

        # adapters (u/v ones, b zeros, domain-norm gamma/beta)
        for j, blk in enumerate(self.adapter_after):
            w = self.fcn_dim[blk]
            mid = self.ADAPTER_MID
            params["adapters"].append({
                "u_down": jnp.ones((w, self.k), jnp.float32),
                "v_down": jnp.ones((self.k, mid), jnp.float32),
                "b_down": jnp.zeros((mid,), jnp.float32),
                "u_up": jnp.ones((mid, self.k), jnp.float32),
                "v_up": jnp.ones((self.k, w), jnp.float32),
                "b_up": jnp.zeros((w,), jnp.float32),
                "gamma": jnp.ones((w,), jnp.float32),
                "beta": jnp.zeros((w,), jnp.float32),
            })
        return params, state

    def _hyper_apply(self, params, state, emb, train, w=None):
        """Shared hyper-net; BN state gets the closed-form D-fold EMA update
        (the reference runs the hyper-net once per domain branch)."""
        h = emb
        new_state = []
        for i, layer in enumerate(params["hyper"]):
            h = linear_apply(layer["lin"], h)
            h, bn_s1 = batchnorm_apply(layer["bn"], state["hyper"][i], h, train,
                                       w)
            if train:
                # s_D = (1-m)^D s_0 + (1-(1-m)^D) b  ==  D identical updates
                decay = (1 - BN_MOMENTUM) ** self.domain_num
                one_step = 1 - BN_MOMENTUM
                bn_sD = jax.tree_util.tree_map(
                    lambda s0, s1: ((decay * s0 + (1 - decay) *
                                     (s1 - one_step * s0) / BN_MOMENTUM)),
                    state["hyper"][i], bn_s1,
                )
                new_state.append(bn_sD)
            else:
                new_state.append(bn_s1)
            h = jax.nn.relu(h)
        return h.reshape(-1, self.k, self.k), new_state

    def _adapter(self, a, h, hyper_out, w=None):
        """One adapter cell on [B, w] (hamur.py:156-198).

        The contraction is re-associated ``((h·U)·H_b)·V`` — identical
        math to the reference's materialized per-row ``U·H_b·V`` weight
        up to f32 association, at O(B·(w·k + k² + k·m)) FLOPs instead of
        O(B·w·m·k²), and EXACTLY the association the fused Pallas kernel
        uses (ops/pallas/hamur_infer.py), so the fused-vs-XLA eval diff is
        tile-order only instead of being amplified through the chained
        batch-stat domain norms (PROFILE.md round-3 hamurlarge 3.5e-2)."""
        ein = compute_config.einsum  # bf16 compute mode covers these
        p = ein("bf,fi->bi", h, a["u_down"])
        q = ein("bi,bij->bj", p, hyper_out)
        t = jax.nn.sigmoid(ein("bj,jn->bn", q, a["v_down"]) + a["b_down"])
        p = ein("bf,fi->bi", t, a["u_up"])
        q = ein("bi,bij->bj", p, hyper_out)
        t = ein("bj,jn->bn", q, a["v_up"]) + a["b_up"]
        t = domain_norm(t, a["gamma"], a["beta"], eps=1e-5, unbiased=True,
                        w=w)
        return t + h

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        if self.adapter_after:
            hyper_out, hyper_s = self._hyper_apply(params, state, emb, train, w)
        else:  # MlpNLayer baseline: no adapters, hyper-net unused
            hyper_out, hyper_s = None, state["hyper"]

        D = self.domain_num
        h = jnp.broadcast_to(emb[None], (D,) + emb.shape)  # [D, B, in]
        new_bn = []
        adapters = {blk: j for j, blk in enumerate(self.adapter_after)}
        for i in range(self.n_blocks):
            blk = params["blocks"][i]
            h = compute_config.einsum("dbi,dio->dbo", h, blk["lin"]["w"]) \
                + blk["lin"]["b"][:, None, :]
            h, bn_s = stacked_batchnorm_apply(blk["bn"], state["blocks"][i], h,
                                              train, w)
            new_bn.append(bn_s)
            h = jax.nn.relu(h)
            if (i + 1) in adapters:
                a = params["adapters"][adapters[i + 1]]
                h = jax.vmap(lambda hd: self._adapter(a, hd, hyper_out, w))(h)
        h = compute_config.einsum("dbi,dio->dbo", h, params["final"]["w"]) \
            + params["final"]["b"][:, None, :]
        ys = jax.nn.sigmoid(h)  # [D, B, 1]
        out = domain_select(ys, did)
        return out, {"blocks": new_bn, "hyper": hyper_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the segmented Pallas kernels — equal to
        ``apply(train=False)`` up to float reassociation (the adapter
        contraction is re-associated ``((h·U)·H_b)·V``; per-block BN folded;
        the adapter norms' batch stats are computed in XLA between segments
        on the full batch, exactly as apply does; ops/pallas/hamur_infer.py).
        """
        from ..ops.nn import BN_EPS
        from ..ops.pallas.hamur_infer import hamur_fused_infer

        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)

        def fold_block(i):
            blk = params["blocks"][i]
            bn_s = state["blocks"][i]
            scale = blk["bn"]["gamma"] * jax.lax.rsqrt(bn_s["var"] + BN_EPS)
            w = blk["lin"]["w"] * scale[:, None, :]
            b = (blk["lin"]["b"] - bn_s["mean"]) * scale + blk["bn"]["beta"]
            return w, b

        hyper_stages = []
        for i, layer in enumerate(params["hyper"]):
            bn_s = state["hyper"][i]
            scale = layer["bn"]["gamma"] * jax.lax.rsqrt(bn_s["var"] + BN_EPS)
            hyper_stages.append((
                layer["lin"]["w"] * scale[None, :],
                (layer["lin"]["b"] - bn_s["mean"]) * scale
                + layer["bn"]["beta"],
            ))

        segments, seg = [], []
        bounds = set(self.adapter_after)
        for i in range(self.n_blocks):
            seg.append(fold_block(i))
            if (i + 1) in bounds:
                segments.append(seg)
                seg = []
        segments.append(seg)  # trailing (possibly empty) pre-final segment
        return hamur_fused_infer(
            emb, did, hyper_stages, self.k, segments,
            list(params["adapters"]),
            (params["final"]["w"], params["final"]["b"]), w=w,
        )


class HamurLarge(_Hamur):
    """7-block backbone with 2 adapter cells (hamur.py:8-238)."""

    def __init__(self, features, domain_num, fcn_dims, hyper_dims, k):
        assert len(fcn_dims) == 7, "HamurLarge expects 7 fcn dims"
        super().__init__(features, domain_num, fcn_dims, hyper_dims, k,
                         adapter_after=(6, 7))


class HamurSmall(_Hamur):
    """2-block backbone with 1 adapter cell (hamur.py:241-378)."""

    def __init__(self, features, domain_num, fcn_dims, hyper_dims, k):
        assert len(fcn_dims) == 2, "HamurSmall expects 2 fcn dims"
        super().__init__(features, domain_num, fcn_dims, hyper_dims, k,
                         adapter_after=(2,))


class MlpNLayer(Model):
    """Per-domain plain MLP baseline (reference Mlp_2_Layer / Mlp_7_Layer,
    hamur.py:380-547 — unused by any script, kept for API completeness)."""

    def __init__(self, features, domain_num, fcn_dims):
        self._impl = _Hamur(features, domain_num, fcn_dims, hyper_dims=[8],
                            k=2, adapter_after=())
        self.domain_num = domain_num

    def init(self, rng):
        return self._impl.init(rng)

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        return self._impl.apply(params, state, x, train, rng, w)

"""M3oE: STAR-style fusion front-end + multi-expert balance stage.

TPU-native rebuild of reference m3oe.py:8-198:

- 3-layer STAR-style fusion: shared ⊙ per-domain slot weights + skip MLP
  (m3oe.py:93-110,145-150), then LayerNorm MLP;
- expert stage: ``expert_num`` shared + per-domain experts (LayerNorm MLPs,
  m3oe.py:45-68), per-domain softmax gates computed on a **stop-gradient**
  copy of the fused embedding (m3oe.py:152-153);
- learnable scalar mixing weights: the reference's ``Weights`` module with
  ``softmax_type=3`` reduces to ``sigmoid(scalar)`` (m3oe.py:40-42; all
  other types hit ``assert 0``). Its tau annealing is dead under type 3,
  so no tau state is carried (documented deviation: none in behavior);
- cross-domain balance mixing (m3oe.py:173-179) and the expert fusion
  ``gate·experts + w·domain_expert`` (m3oe.py:188-190);
- per-domain towers (Linear-LN-ReLU-Linear) -> sigmoid -> per-row select.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import config as compute_config
from ..core import init as initializers
from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import layernorm_apply, layernorm_init, linear_apply, linear_init
from ..ops.select import domain_select
from .base import Model, domain_ids


def _mlp_n_init(rng, dims):
    """Mlp_N: [Linear -> LayerNorm -> ReLU] per dim pair (m3oe.py:45-68)."""
    layers = []
    keys = jax.random.split(rng, max(len(dims) - 1, 1))
    for i in range(len(dims) - 1):
        layers.append({
            "lin": linear_init(keys[i], dims[i], dims[i + 1]),
            "ln": layernorm_init(dims[i + 1]),
        })
    return layers


def _mlp_n_apply(layers, x):
    for layer in layers:
        x = jax.nn.relu(layernorm_apply(layer["ln"],
                                        linear_apply(layer["lin"], x)))
    return x


class M3oE(Model):
    def __init__(self, features, domain_num: int, fcn_dims, expert_num: int,
                 exp_d, exp_t, bal_d, bal_t, tau: float = 1.0,
                 task_num: int = 1, tau_step: float = 0.00005,
                 softmax_type: int = 3, device: str = ""):
        assert softmax_type == 3, "only softmax_type=3 is reachable in reference"
        self.features = tuple(features)
        self.input_dim = sum_embed_dims(features)
        fcn = [self.input_dim] + list(fcn_dims)
        assert len(fcn) > 3, (
            "too few layers assigned, must larger than 3. Star owns 3 layers, "
            "mmoe owns the rest."
        )
        self.star_dim = fcn[:3]
        self.fcn_dim = fcn[3:]
        self.domain_num = domain_num
        self.task_num = task_num
        self.expert_num = expert_num
        self.embedding = EmbeddingCollection(features)
        self.exp_d, self.exp_t = exp_d, exp_t
        self.bal_d, self.bal_t = bal_d, bal_t

    def init(self, rng):
        D, E = self.domain_num, self.expert_num
        keys = jax.random.split(rng, 10)
        xavier = initializers.xavier_uniform()
        s0, s1, s2 = self.star_dim
        params = {
            "embedding": self.embedding.init(keys[0]),
            # scalar mixing weights (m3oe.py:17-27; initial value = arg)
            "w_exp_d": jnp.full((1,), float(self.exp_d), jnp.float32),
            "w_exp_t": jnp.full((1,), float(self.exp_t), jnp.float32),
            "w_bal_d": jnp.full((1,), float(self.bal_d), jnp.float32),
            "w_bal_t": jnp.full((1,), float(self.bal_t), jnp.float32),
            "skip": _mlp_n_init(keys[1], [s0, s2]),
            "shared_w": xavier(keys[2], (s0, s1)),
            "shared_b": jnp.zeros((s1,), jnp.float32),
            "slot_w": jax.vmap(lambda k: xavier(k, (s0, s1)))(
                jax.random.split(keys[3], D)
            ),
            "slot_b": jnp.zeros((D, s1), jnp.float32),
            "star_mlp": _mlp_n_init(keys[4], [s1, s2]),
        }
        # experts (shared + per-domain), gates, towers
        ek = jax.random.split(keys[5], E)
        params["experts"] = [_mlp_n_init(k, self.fcn_dim) for k in ek]
        dk = jax.random.split(keys[6], D)
        params["domain_experts"] = [_mlp_n_init(k, self.fcn_dim) for k in dk]
        gk = jax.random.split(keys[7], D)
        params["gates"] = [linear_init(k, self.fcn_dim[0], E) for k in gk]
        tk = jax.random.split(keys[8], D * 2).reshape(D, 2, -1)
        h = self.fcn_dim[-1]
        params["towers"] = [
            {"l1": linear_init(tk[d, 0], h, h), "ln": layernorm_init(h),
             "l2": linear_init(tk[d, 1], h, 1)}
            for d in range(D)
        ]
        return params, {}

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):  # noqa: ARG002 — per-row math only (LayerNorm), no
        # batch statistics anywhere, so the padding mask is irrelevant here
        did = domain_ids(x)
        D, E = self.domain_num, self.expert_num
        input_emb = self.embedding.apply(params["embedding"], x, self.features,
                                         squeeze_dim=True)

        # STAR fusion front-end (m3oe.py:145-150)
        skip = _mlp_n_apply(params["skip"], input_emb)
        w_slot = params["slot_w"] * params["shared_w"][None]  # [D, s0, s1]
        star = compute_config.einsum("bi,dio->dbo", input_emb, w_slot) \
            + params["slot_b"][:, None, :] + params["shared_b"][None, None, :]
        emb = jnp.einsum(
            "bd,dbo->bo",
            jax.nn.one_hot(jnp.clip(did, 0, D - 1), D, dtype=star.dtype), star,
        )
        emb = _mlp_n_apply(params["star_mlp"], emb) + skip  # [B, s2]

        # gates on detached emb (m3oe.py:152-153)
        emb_sg = jax.lax.stop_gradient(emb)
        gate_value = jnp.stack([
            jax.nn.softmax(linear_apply(params["gates"][d], emb_sg), axis=1)
            for d in range(D)
        ])  # [D, B, E]

        fea = jnp.stack([_mlp_n_apply(p, emb) for p in params["experts"]],
                        axis=1)  # [B, E, h]
        domain_fea = jnp.stack(
            [_mlp_n_apply(p, emb) for p in params["domain_experts"]], axis=1
        )  # [B, D, h]

        # cross-domain balance mixing (m3oe.py:173-179)
        w_bal = jax.nn.sigmoid(params["w_bal_d"])[0]
        total = jnp.sum(domain_fea, axis=1)  # [B, h]
        if D > 1:
            off = (1 - w_bal) / (D - 1)
            weighted = (w_bal - off) * domain_fea + off * total[:, None, :]
        else:
            weighted = w_bal * domain_fea
        # [B, D, h] where weighted[:, i] = w*fea_i + sum_{j!=i} off*fea_j

        w_exp = jax.nn.sigmoid(params["w_exp_d"])[0]
        fused = jnp.einsum("dbe,beh->dbh", gate_value, fea) \
            + w_exp * weighted.transpose(1, 0, 2)  # [D, B, h]

        ys = []
        for d in range(D):
            t = params["towers"][d]
            h = jax.nn.relu(layernorm_apply(t["ln"],
                                            linear_apply(t["l1"], fused[d])))
            ys.append(jax.nn.sigmoid(linear_apply(t["l2"], h))[:, 0])
        out = domain_select(jnp.stack(ys), did)
        return out, state

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — numerically equal
        to ``apply(train=False)`` (all per-row math: LayerNorm, not
        BatchNorm; ops/pallas/m3oe_infer.py). Stacks the per-member Mlp_N
        layer lists on leading axes; the learnable sigmoid mixing scalars
        ride into the kernel as [1,1] operands (they stay traced)."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.m3oe_infer import m3oe_fused_infer

        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)

        def plain(layers):
            return [(l["lin"]["w"], l["lin"]["b"], l["ln"]["gamma"],
                     l["ln"]["beta"]) for l in layers]

        def stacked(members):
            n_layers = len(members[0])
            return [
                tuple(jnp.stack([plain(m)[i][j] for m in members])
                      for j in range(4))
                for i in range(n_layers)
            ]

        star = (params["slot_w"] * params["shared_w"][None],
                params["slot_b"] + params["shared_b"][None])
        gates = (jnp.stack([g["w"] for g in params["gates"]]),
                 jnp.stack([g["b"] for g in params["gates"]]))
        towers = (
            jnp.stack([t["l1"]["w"] for t in params["towers"]]),
            jnp.stack([t["l1"]["b"] for t in params["towers"]]),
            jnp.stack([t["ln"]["gamma"] for t in params["towers"]]),
            jnp.stack([t["ln"]["beta"] for t in params["towers"]]),
            jnp.stack([t["l2"]["w"] for t in params["towers"]]),
            jnp.stack([t["l2"]["b"] for t in params["towers"]]),
        )
        return m3oe_fused_infer(
            emb, did, star, plain(params["skip"]), plain(params["star_mlp"]),
            gates, stacked(params["experts"]),
            stacked(params["domain_experts"]), towers,
            w_exp=jax.nn.sigmoid(params["w_exp_d"]),
            w_bal=jax.nn.sigmoid(params["w_bal_d"]),
        )

"""Serving throughput: fused Pallas inference kernel vs op-by-op XLA eval.

Flagship Ali-CCP shape (same as bench.py), eval path only. ``SWR_MODEL``
picks the model (mmoe | sharedbottom | ple | epnet | ppnet | adasparse |
sarnet | star | hamur | hamurlarge | adaptdhm | m3oe | m2m — each has a
fused Pallas eval path, ops/pallas/; M2M's cross-example transformer stays
in XLA with everything after it fused). Prints one JSON line per variant.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("SWR_BATCH", 4096))
N_SPARSE, N_DENSE, DOMAINS = 23, 8, 3
VOCAB = int(os.environ.get("SWR_VOCAB", 20_000))
STEPS = int(os.environ.get("SWR_STEPS", 50))
MODEL = os.environ.get("SWR_MODEL", "mmoe").lower()


def _build_model(features):
    from scenario_wise_rec_tpu.core import SparseFeature
    from scenario_wise_rec_tpu.models import (MMOE, PLE, AdaSparse, AdaptDHM,
                                              EPNet, HamurLarge, HamurSmall,
                                              M3oE, PPNet, Sarnet,
                                              SharedBottom, Star)

    # gated-family splits mirror the Ali-CCP scenario-emb / ppnet loader
    # variants (run_ali_ccp…py:37-74, :76-115)
    sce = [SparseFeature("domain_indicator", vocab_size=DOMAINS, embed_dim=16)]
    sparse = [f for f in features if isinstance(f, SparseFeature)]
    if MODEL == "epnet":
        return EPNet(sce_features=sce, agn_features=features,
                     fcn_dims=[256, 128, 64, 32, 16, 8])
    if MODEL == "ppnet":
        return PPNet(id_features=sparse[:2], agn_features=features,
                     domain_num=DOMAINS, fcn_dims=[256, 128, 64, 32, 16, 8])
    if MODEL == "adasparse":
        return AdaSparse(sce_features=sce, agn_features=sparse,
                         form="Fusion",
                         mlp_params={"dims": [256, 128, 64, 32, 16, 8],
                                     "dropout": 0.2, "activation": "relu"})
    if MODEL == "sarnet":
        return Sarnet(features, DOMAINS, domain_shared_expert_num=8,
                      domain_specific_expert_num=2)
    if MODEL == "mmoe":
        return MMOE(features, DOMAINS, n_expert=DOMAINS,
                    expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                    tower_params={"dims": [16]})
    if MODEL == "sharedbottom":
        return SharedBottom(features, DOMAINS,
                            bottom_params={"dims": [256, 128, 64, 32, 16, 8]},
                            tower_params={"dims": [16]})
    if MODEL == "ple":
        # reference Ali-CCP PLE ladder (run_ali_ccp…py:142-146)
        return PLE(features, DOMAINS, n_level=1, n_expert_specific=2,
                   n_expert_shared=2,
                   expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                   tower_params={"dims": [16]})
    # Ali-CCP ladders (run_ali_ccp…py:134-163)
    if MODEL == "star":
        return Star(features, DOMAINS, fcn_dims=[256, 128, 64, 32, 16, 8],
                    aux_dims=[16])
    if MODEL == "hamur":  # HamurSmall (the kuairand/douban/mind ladder)
        return HamurSmall(features, DOMAINS, fcn_dims=[256, 128],
                          hyper_dims=[64], k=35)
    if MODEL == "hamurlarge":
        return HamurLarge(features, DOMAINS,
                          fcn_dims=[256, 128, 64, 64, 32, 16, 8],
                          hyper_dims=[64], k=65)
    if MODEL == "adaptdhm":
        return AdaptDHM(features=sparse + sce,
                        fcn_dims=[256, 128, 64, 32, 16, 8],
                        cluster_num=3, beta=0.9)
    if MODEL == "m3oe":
        return M3oE(features, DOMAINS, fcn_dims=[512, 256, 256, 64],
                    expert_num=4, exp_d=1, exp_t=1, bal_d=1, bal_t=1)
    if MODEL == "m2m":
        # domain feature is part of the embedded inputs (configs ali_ccp m2m)
        from scenario_wise_rec_tpu.models import M2M
        return M2M(features + sce, domain_feature=sce, domain_num=DOMAINS)
    raise SystemExit(f"unknown SWR_MODEL={MODEL}")


def main():
    import jax
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature

    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=16)
              for i in range(N_SPARSE)]
    dense = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    model = _build_model(dense + sparse)
    r = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(r.integers(0, VOCAB, BATCH).astype(np.int32))
         for i in range(N_SPARSE)}
    x.update({f"d{i}": jnp.asarray(r.normal(size=BATCH).astype(np.float32))
              for i in range(N_DENSE)})
    x["domain_indicator"] = jnp.asarray(
        r.integers(0, DOMAINS, BATCH).astype(np.int32))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))

    @jax.jit
    def eval_xla(params, state, x):
        probs, _ = model.apply(params, state, x, train=False, rng=None)
        return probs

    eval_fused = jax.jit(model.apply_fused_eval)

    def sync(v):
        # real barrier: jax.block_until_ready is a no-op on the axon platform
        return float(np.asarray(v).ravel()[-1])

    results = {}
    for name, fn in (("xla_opbyop", eval_xla), ("pallas_fused", eval_fused)):
        out = fn(params, state, x)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(params, state, x)
        sync(out)
        dt = time.perf_counter() - t0
        results[name] = STEPS * BATCH / dt
        print(json.dumps({
            "metric": f"infer_throughput_{MODEL}_{name}",
            "value": round(results[name], 1),
            "unit": "examples/s/chip",
        }), flush=True)

    # what "auto" mode would pick for this model (trainer default guidance)
    from scenario_wise_rec_tpu.ops.pallas import fused_inference_auto
    print(json.dumps({"metric": f"infer_auto_gate_{MODEL}",
                      "value": 1.0 if fused_inference_auto(model) else 0.0,
                      "unit": "bool(fused wins)"}), flush=True)

    # numerical agreement on the real device (not just interpret mode)
    a = np.asarray(eval_xla(params, state, x))
    b = np.asarray(eval_fused(params, state, x))
    err = float(np.max(np.abs(a - b)))
    print(json.dumps({"metric": f"infer_fused_max_abs_err_{MODEL}",
                      "value": err, "unit": "prob"}), flush=True)


if __name__ == "__main__":
    main()

"""On-TPU numerics + throughput artifact for all 12 fused inference kernels.

For each model (flagship Ali-CCP shape, batch 4096): run the op-by-op XLA
eval and the fused Pallas eval ON THE REAL CHIP, report max|diff| between
them and both throughputs. Output: one JSON line per model on stdout
(collected into PROFILE.md by the round's measurement session).

Uses bench_infer's model builders so the XLA programs match the ones the
serving bench already compiled (persistent-cache hits).

Usage: python tpu_numerics_profile.py [models...]   (default: all 12)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ALL = ["mmoe", "sharedbottom", "ple", "epnet", "ppnet", "adasparse",
       "sarnet", "star", "hamur", "hamurlarge", "adaptdhm", "m3oe", "m2m"]


def main():
    models = sys.argv[1:] or ALL
    import jax
    import jax.numpy as jnp

    import bench_infer

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature

    batch = bench_infer.BATCH
    vocab = bench_infer.VOCAB
    nd = bench_infer.N_DENSE
    ns = bench_infer.N_SPARSE
    doms = bench_infer.DOMAINS

    for model_name in models:
        bench_infer.MODEL = model_name
        sparse = [SparseFeature(f"s{i}", vocab_size=vocab, embed_dim=16)
                  for i in range(ns)]
        dense = [DenseFeature(f"d{i}") for i in range(nd)]
        try:
            model = bench_infer._build_model(dense + sparse)
        except Exception as e:
            print(json.dumps({"model": model_name, "error": str(e)[:200]}),
                  flush=True)
            continue
        rng = np.random.default_rng(0)
        x = {f"s{i}": jnp.asarray(
            rng.integers(0, vocab, batch).astype(np.int32))
            for i in range(ns)}
        x.update({f"d{i}": jnp.asarray(
            rng.normal(size=batch).astype(np.float32)) for i in range(nd)})
        x["domain_indicator"] = jnp.asarray(
            rng.integers(0, doms, batch).astype(np.int32))
        w = jnp.ones((batch,), jnp.float32)

        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
        if (model_name in ("hamur", "hamurlarge")
                and os.environ.get("SWR_RAND_ADAPTERS", "0") == "1"):
            # The reference initializes every adapter u/v factor to ONES
            # (hamur.py:66-74): all rows of the adapter pre-norm output are
            # then near-identical, the batch-stat domain-norm's sigma is
            # tiny, and rsqrt amplifies ANY evaluation-order difference
            # (fused-vs-XLA here, torch-vs-XLA in the parity tests, which
            # randomize for the same reason). This mode measures the
            # fused-vs-XLA diff at sane adapter magnitudes — the regime of
            # any trained model.
            ks = jax.random.split(jax.random.PRNGKey(7), 8)
            ki = 0
            for a in params["adapters"]:
                for name in ("u_down", "v_down", "u_up", "v_up"):
                    a[name] = 0.1 * jax.random.normal(ks[ki % 8],
                                                      a[name].shape)
                    ki += 1

        @jax.jit
        def xla_eval(p, s, xx, ww):
            probs, _ = model.apply(p, s, xx, train=False, rng=None, w=ww)
            return probs

        @jax.jit
        def fused_eval(p, s, xx, ww):
            return model.apply_fused_eval(p, s, xx, w=ww)

        def timed(fn):
            out = fn(params, state, x, w)
            float(np.asarray(out[0]))           # real barrier (bench.py)
            t0 = time.perf_counter()
            reps = 30
            for _ in range(reps):
                out = fn(params, state, x, w)
            float(np.asarray(out[0]))
            return np.asarray(out), (time.perf_counter() - t0) / reps

        try:
            ref, t_xla = timed(xla_eval)
            fused, t_fused = timed(fused_eval)
        except Exception as e:
            print(json.dumps({"model": model_name,
                              "error": str(e).splitlines()[0][:200]}),
                  flush=True)
            continue
        print(json.dumps({
            "model": model_name,
            "max_abs_diff": float(np.max(np.abs(ref - fused))),
            "xla_ms": round(t_xla * 1e3, 3),
            "fused_ms": round(t_fused * 1e3, 3),
            "speedup": round(t_xla / t_fused, 2),
            "batch": batch,
        }), flush=True)


if __name__ == "__main__":
    main()

"""On-chip numerics check: the sorted streaming kernel vs its XLA
reference formulation ON THE REAL TPU (the CPU interpreter tests pin the
logic; this pins the Mosaic lowering — layout packing, work-list scalar
prefetch, one-hot MXU matmuls, aliasing).

Runs several steps of sorted_dense_adam_update twice (use_pallas=True /
False) at a mid-size shape with duplicates and empty blocks, and reports
max|diff| on table/mu/nu. Also checks packed_row_gather against a plain
host-side gather. Prints JSON lines.

Usage: python verify_sorted_onchip.py    (TPU)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.ops.pallas.sorted_adam import (
        packed_row_gather, unpack_rows)
    from scenario_wise_rec_tpu.train.optim import (sorted_dense_adam_init,
                                                   sorted_dense_adam_update)

    d = 16
    n_owner, per_vocab, per_seg = 8, 30_000, 1024
    v = n_owner * per_vocab
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32) * 0.1)
    # ids per owner span; owner 7 capped so its tail blocks stay empty
    ids_np = np.concatenate([
        rng.integers(o * per_vocab,
                     o * per_vocab + (3000 if o == 7 else per_vocab),
                     per_seg).astype(np.int32)
        for o in range(n_owner)])
    ids_np[1] = ids_np[5]  # duplicates
    ids = jnp.asarray(ids_np)
    k = ids_np.shape[0]
    segments = tuple((f"s{o}", o * per_seg, per_seg)
                     for o in range(n_owner))
    offsets = {f"s{o}": o * per_vocab for o in range(n_owner)}

    for dtype, tol in ((None, 1e-5), ("bf16", 2e-2)):  # f32: hi/lo-split residual ~2^-18 rel
        jdt = jnp.bfloat16 if dtype == "bf16" else None
        s_pal = sorted_dense_adam_init(table, dtype=jdt)
        s_ref = dict(s_pal)
        for t in range(3):
            g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
            s_pal = sorted_dense_adam_update(s_pal, g, ids, segments,
                                             offsets, d, use_pallas=True)
            s_ref = sorted_dense_adam_update(s_ref, g, ids, segments,
                                             offsets, d, use_pallas=False)
        diffs = {}
        for kk in ("table", "mu", "nu"):
            a = np.asarray(s_pal[kk].astype(jnp.float32))
            b = np.asarray(s_ref[kk].astype(jnp.float32))
            diffs[kk] = float(np.max(np.abs(a - b)))
        ok = all(x <= tol for x in diffs.values())
        print(json.dumps({"check": "sorted_kernel_vs_xla_ref_onchip",
                          "dtype": dtype or "f32", "steps": 3,
                          "vocab": v, "k": k, **diffs,
                          "tol": tol, "ok": ok}), flush=True)
        assert ok, diffs

    # packed gather vs host truth
    s = sorted_dense_adam_init(table)
    rows = np.asarray(packed_row_gather(s["table"], ids, d))
    truth = np.asarray(table)[ids_np]
    gd = float(np.max(np.abs(rows - truth)))
    print(json.dumps({"check": "packed_row_gather_onchip",
                      "max_abs_diff": gd, "ok": gd == 0.0}), flush=True)
    assert gd == 0.0
    # unpack round trip
    ud = float(np.max(np.abs(
        np.asarray(unpack_rows(s["table"], v, d)) - np.asarray(table))))
    print(json.dumps({"check": "unpack_rows_onchip", "max_abs_diff": ud,
                      "ok": ud == 0.0}), flush=True)
    assert ud == 0.0
    print(json.dumps({"check": "ALL", "ok": True}))


if __name__ == "__main__":
    main()

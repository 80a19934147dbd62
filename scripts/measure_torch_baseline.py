"""Measure the PyTorch reference's training throughput on this host's CPU.

Runs the reference's own MMOE (imported from /root/reference, unmodified) on
the same synthetic Ali-CCP-shaped batch bench.py uses, and records
examples/s into BASELINE_MEASURED.json for bench.py's ``vs_baseline``.
The reference supports only cpu/cuda (ctr_trainer.py:49); no CUDA here, so
CPU is its achievable baseline on this machine.
"""

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from scenario_wise_rec.basic.features import DenseFeature, SparseFeature  # noqa: E402
from scenario_wise_rec.models.multi_domain import MMOE  # noqa: E402

BATCH = 4096
N_SPARSE, N_DENSE, DOMAINS = 23, 8, 3
VOCAB = 20_000
STEPS = 10


def main():
    torch.manual_seed(0)
    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=16)
              for i in range(N_SPARSE)]
    dense = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    model = MMOE(dense + sparse, DOMAINS, n_expert=DOMAINS,
                 expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                 tower_params={"dims": [16]})
    rng = np.random.default_rng(0)
    x = {f"s{i}": torch.tensor(rng.integers(0, VOCAB, BATCH))
         for i in range(N_SPARSE)}
    x.update({f"d{i}": torch.tensor(rng.normal(size=BATCH).astype(np.float32))
              for i in range(N_DENSE)})
    x["domain_indicator"] = torch.tensor(rng.integers(0, DOMAINS, BATCH))
    y = torch.tensor(rng.integers(0, 2, BATCH).astype(np.float32))

    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5)
    crit = torch.nn.BCELoss()
    model.train()

    def step():
        y_pred = model(x)
        loss = crit(y_pred, y)
        model.zero_grad()
        loss.backward()
        opt.step()

    for _ in range(2):
        step()  # warmup
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = time.perf_counter() - t0
    eps = STEPS * BATCH / dt
    out = {
        "torch_mmoe_examples_per_s": round(eps, 1),
        "host": os.uname().nodename,
        "torch_threads": torch.get_num_threads(),
        "config": {"batch": BATCH, "n_sparse": N_SPARSE, "vocab": VOCAB,
                   "expert_dims": [256, 128, 64, 32, 16, 8]},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

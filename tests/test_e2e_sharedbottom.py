"""End-to-end: SharedBottom + MMOE train on the bundled Ali-CCP sample.

This is SURVEY §7 step 5: the minimum slice — schema -> embedding -> model ->
train loop -> per-domain eval. Uses the reference's bundled sample CSVs
(scripts/data/ali-ccp, 100/50/50 rows) as smoke fixtures.
"""

import numpy as np
import pandas as pd
import pytest

import scenario_wise_rec_tpu as swr
from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.data import DataGenerator
from scenario_wise_rec_tpu.models import MMOE, SharedBottom
from scenario_wise_rec_tpu.train import CTRTrainer

SAMPLE_DIR = "/root/reference/scripts/data/ali-ccp"


@pytest.fixture(scope="module")
def ali_ccp_sample():
    df_train = pd.read_csv(SAMPLE_DIR + "/ali_ccp_train_sample.csv")
    df_val = pd.read_csv(SAMPLE_DIR + "/ali_ccp_val_sample.csv")
    df_test = pd.read_csv(SAMPLE_DIR + "/ali_ccp_test_sample.csv")
    train_idx, val_idx = len(df_train), len(df_train) + len(df_val)
    data = pd.concat([df_train, df_val, df_test], axis=0)
    data["domain_indicator"] = data["301"].map({1: 0, 2: 1, 3: 2})
    dense_cols = ["D109_14", "D110_14", "D127_14", "D150_14", "D508", "D509",
                  "D702", "D853"]
    sparse_cols = [c for c in data.columns
                   if c not in dense_cols + ["click", "purchase",
                                             "domain_indicator"]]
    dense_feas = [DenseFeature(c) for c in dense_cols]
    sparse_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                   for c in sparse_cols]
    y = data["click"]
    x = data.drop(columns=["click"])
    return (dense_feas, sparse_feas,
            x[:train_idx], y[:train_idx],
            x[train_idx:val_idx], y[train_idx:val_idx],
            x[val_idx:], y[val_idx:])


def _run(model, x_tr, y_tr, x_va, y_va, x_te, y_te, model_path="/tmp"):
    dg = DataGenerator(x_tr, y_tr)
    train_dl, val_dl, test_dl = dg.generate_dataloader(
        x_val=x_va, y_val=y_va, x_test=x_te, y_test=y_te, batch_size=32
    )
    trainer = CTRTrainer(model, "aliccp-sample", n_epoch=1,
                         earlystop_patience=2, seed=2022,
                         model_path=model_path)
    trainer.fit(train_dl, val_dl)
    dll, dauc, ll, auc = trainer.evaluate_multi_domain_loss(model, test_dl, 3)
    assert 0.0 <= auc <= 1.0 and ll > 0
    assert len(dauc) == 3 and len(dll) == 3
    # sample has rows in all 3 domains
    for d in range(3):
        assert dauc[d] is None or 0.0 <= dauc[d] <= 1.0
    return auc, ll


def test_sharedbottom_e2e(ali_ccp_sample, tmp_path):
    dense, sparse, *splits = ali_ccp_sample
    model = SharedBottom(dense + sparse, 3, bottom_params={"dims": [64]},
                         tower_params={"dims": [32, 16]})
    auc, ll = _run(model, *splits, model_path=str(tmp_path))
    assert np.isfinite(ll)


def test_mmoe_e2e(ali_ccp_sample, tmp_path):
    dense, sparse, *splits = ali_ccp_sample
    model = MMOE(dense + sparse, 3, n_expert=3,
                 expert_params={"dims": [64, 32]}, tower_params={"dims": [16]})
    auc, ll = _run(model, *splits, model_path=str(tmp_path))
    assert np.isfinite(ll)


def test_checkpoint_roundtrip(ali_ccp_sample, tmp_path):
    import jax

    dense, sparse, *splits = ali_ccp_sample
    x_tr, y_tr, x_va, y_va, x_te, y_te = splits
    model = SharedBottom(dense + sparse, 3, bottom_params={"dims": [16]},
                         tower_params={"dims": [8]})
    dg = DataGenerator(x_tr, y_tr)
    train_dl, val_dl, test_dl = dg.generate_dataloader(
        x_val=x_va, y_val=y_va, x_test=x_te, y_test=y_te, batch_size=32
    )
    trainer = CTRTrainer(model, "ck", n_epoch=1, model_path=str(tmp_path))
    trainer.fit(train_dl, val_dl)
    p1 = trainer.predict(model, test_dl)

    trainer2 = CTRTrainer(model, "ck2", n_epoch=1, model_path=str(tmp_path))
    ckpts = list(tmp_path.glob("*.npz"))
    assert ckpts, "fit should have written a checkpoint"
    trainer2.load(str(ckpts[0]))
    p2 = trainer2.predict(model, test_dl)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)

"""Template run script for user-defined models (reference run_example.py).

Demonstrates the integration path documented in the reference README
(README.md:164-176): subclass the ``Base`` template
(scenario_wise_rec_tpu/models/base.py, mirroring base_example.py:11-77),
register it, and train on the Ali-CCP sample.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from _runner import standard_argparser
from run_ali_ccp import get_ali_ccp_data_dict

from scenario_wise_rec_tpu.core.features import sum_embed_dims
from scenario_wise_rec_tpu.data import DataGenerator
from scenario_wise_rec_tpu.models.base import Model, domain_ids, split_rng
from scenario_wise_rec_tpu.ops import (
    EmbeddingCollection,
    MLP,
    domain_select,
    stacked_mlp_apply,
    stacked_mlp_init,
)
from scenario_wise_rec_tpu.train import CTRTrainer


class MyModel(Model):
    """Example: embed -> one per-domain MLP tower -> sigmoid -> select."""

    def __init__(self, features, num_domains):
        self.features = tuple(features)
        self.num_domains = num_domains
        self.embedding = EmbeddingCollection(features)
        # Part 1: scenario-shared / Part 2: scenario-specific modules
        self.tower = MLP(sum_embed_dims(features), dims=[64, 32])

    def init(self, rng):
        ke, kt = jax.random.split(rng)
        towers_p, towers_s = stacked_mlp_init(self.tower, kt, self.num_domains)
        return ({"embedding": self.embedding.init(ke), "towers": towers_p},
                {"towers": towers_s})

    def apply(self, params, state, x, train=False, rng=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        (kt,) = split_rng(rng, 1)
        ys, towers_s = stacked_mlp_apply(self.tower, params["towers"],
                                         state["towers"], emb, train, kt)
        return domain_select(jax.nn.sigmoid(ys), did), {"towers": towers_s}


def main(args):
    d = get_ali_ccp_data_dict(args.dataset_path)
    dg = DataGenerator(d["x_train"], d["y_train"])
    train_dl, val_dl, test_dl = dg.generate_dataloader(
        x_val=d["x_val"], y_val=d["y_val"], x_test=d["x_test"],
        y_test=d["y_test"], batch_size=args.batch_size,
    )
    model = MyModel(d["dense_feas"] + d["sparse_feas"], d["domain_num"])
    trainer = CTRTrainer(
        model, "Aliccp",
        optimizer_params={"lr": args.learning_rate,
                          "weight_decay": args.weight_decay},
        n_epoch=args.epoch, earlystop_patience=5, model_path=args.save_dir,
        seed=args.seed,
    )
    trainer.fit(train_dl, val_dl)
    dll, dauc, ll, auc = trainer.evaluate_multi_domain_loss(
        trainer.model, test_dl, d["domain_num"]
    )
    print(f"test auc: {auc} | test logloss: {ll}")


if __name__ == "__main__":
    main(standard_argparser("/root/reference/scripts/data/ali-ccp").parse_args())

"""Shared run-script skeleton: trainer setup, fit, per-domain eval, CSV.

Factors out the tail every reference script repeats (e.g.
run_kuairand…py:151-169): CTRTrainer construction with per-dataset
early-stop/scheduler settings, fit, ``evaluate_multi_domain_loss``, and the
``{model}_{dataset}_{seed}.csv`` artifact with per-domain columns.
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scenario_wise_rec_tpu.configs import build_model  # noqa: E402
from scenario_wise_rec_tpu.data import DataGenerator  # noqa: E402
from scenario_wise_rec_tpu.train import CTRTrainer  # noqa: E402


def apply_device(device: str) -> None:
    """Honor the reference's ``--device`` flag (ctr_trainer.py:49): an empty
    value keeps JAX's default platform (the TPU when present); "cpu" forces
    the CPU backend (must run before any backend initialization)."""
    if device and device.lower() in ("cpu", "tpu", "axon"):
        import jax

        jax.config.update("jax_platforms",
                          "axon" if device.lower() == "tpu" else device.lower())


def trainer_kwargs_from_args(args, model) -> dict:
    """The TPU-native CTRTrainer kwargs carried by standard_argparser,
    with the sorted-impl embed-dim guard (shared by every run script)."""
    impl = getattr(args, "sparse_update_impl", "sorted")
    if getattr(args, "sparse_embedding_updates", False) and impl == "sorted":
        # the sorted streaming kernel needs the packed embed_dim to divide
        # 128 (ops/pallas/sorted_adam.py tile layout); models that don't
        # qualify fall back to the best LAZY impl instead of asserting
        emb = getattr(model, "embedding", None)
        pd = getattr(emb, "packed_dim", 0) if emb is not None else 0
        if not pd or 128 % pd != 0:
            print(f"sparse_update_impl='sorted' needs packed embed_dim | "
                  f"128 (got {pd}); falling back to 'occurrence'")
            impl = "occurrence"
    return dict(
        scan_steps=getattr(args, "scan_steps", 1),
        sparse_embedding_updates=getattr(args, "sparse_embedding_updates",
                                         False),
        sparse_update_impl=impl,
        fused_inference=getattr(args, "fused_inference", False),
        sorted_dtype=getattr(args, "sorted_dtype", None),
        sorted_precision=getattr(args, "sorted_precision", None),
        resident_gather=getattr(args, "resident_gather", "step"),
    )


def run(dataset_key: str, dataset_name: str, data: dict, model_name: str,
        epoch: int, learning_rate: float, batch_size: int, weight_decay: float,
        device: str, save_dir: str, seed: int, earlystop_patience: int,
        scheduler_params: dict, split_ratio=None, args=None):
    """Train + evaluate one model; returns (auc, logloss, per-domain lists).

    ``args``: the parsed standard_argparser namespace — carries the opt-in
    TPU-native flags (--scan_steps, --sparse_embedding_updates,
    --sparse_update_impl, --fused_inference, --device_resident). Every
    default reproduces the reference protocol exactly.
    """
    apply_device(device)
    dg = DataGenerator(data["x_train"], data["y_train"])
    if split_ratio is not None:
        train_dl, val_dl, test_dl = dg.generate_dataloader(
            split_ratio=split_ratio, batch_size=batch_size, seed=seed
        )
    else:
        train_dl, val_dl, test_dl = dg.generate_dataloader(
            x_val=data["x_val"], y_val=data["y_val"], x_test=data["x_test"],
            y_test=data["y_test"], batch_size=batch_size, seed=seed,
        )
    model = build_model(dataset_key, model_name, data)
    domain_num = data["domain_num"]
    trainer = CTRTrainer(
        model, dataset_name,
        optimizer_params={"lr": learning_rate, "weight_decay": weight_decay},
        n_epoch=epoch, earlystop_patience=earlystop_patience, device=device,
        model_path=save_dir, seed=seed, scheduler_params=scheduler_params,
        **trainer_kwargs_from_args(args, model),
    )
    if getattr(args, "device_resident", False):
        from scenario_wise_rec_tpu.data.device import DeviceResidentLoader

        # same shuffle stream as the BatchIterable it replaces (unless
        # --device_shuffle opts into the on-TPU permutation stream)
        train_dl = DeviceResidentLoader(
            train_dl.dataset, batch_size, seed=seed,
            device_shuffle=getattr(args, "device_shuffle", False))
    trainer.fit(train_dl, val_dl)
    domain_logloss, domain_auc, logloss, auc = trainer.evaluate_multi_domain_loss(
        trainer.model, test_dl, domain_num,
        on_device=getattr(args, "device_eval", False),
    )
    print(f"test auc: {auc} | test logloss: {logloss}")
    for d in range(domain_num):
        print(f"test domain {d} auc: {domain_auc[d]} | "
              f"test domain {d} logloss: {domain_logloss[d]}")

    os.makedirs(save_dir, exist_ok=True)
    out = os.path.join(save_dir,
                       model_name + "_" + dataset_name + "_" + str(seed) + ".csv")
    with open(out, "w", newline="") as f:
        writer = csv.writer(f)
        header = ["model", "seed", "auc", "log"]
        row = [model_name, str(seed), auc, logloss]
        for d in range(domain_num):
            header += [f"auc{d}", f"log{d}"]
            row += [domain_auc[d], domain_logloss[d]]
        writer.writerow(header)
        writer.writerow(row)
    print("wrote", out)
    return auc, logloss, domain_auc, domain_logloss


def standard_argparser(default_path: str):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", default=default_path)
    parser.add_argument("--model_name", default="star")
    parser.add_argument("--epoch", type=int, default=1)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--weight_decay", type=float, default=1e-5)
    parser.add_argument("--device", default="")
    parser.add_argument("--save_dir", default="./")
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--synthetic", action="store_true",
                        help="use a small synthetic dataset with the right "
                             "schema (for datasets whose raw files are not "
                             "bundled)")
    # opt-in TPU-native options (defaults reproduce the reference protocol)
    parser.add_argument("--scan_steps", type=int, default=1,
                        help="optimizer steps per device dispatch (lax.scan)")
    parser.add_argument("--sparse_embedding_updates", action="store_true",
                        help="rows-differentiated embedding updates (the "
                             "production-vocab path)")
    parser.add_argument("--sparse_update_impl", default="sorted",
                        choices=["dense", "winner", "occurrence", "sorted"],
                        help="embedding update formulation (see README). "
                             "Default 'sorted' = the measured production "
                             "winner (exact dense Adam, zero scatters); "
                             "models whose packed embed_dim does not divide "
                             "128 fall back to 'occurrence' automatically")
    parser.add_argument("--sorted_dtype", default=None,
                        choices=["bf16", "float32"],
                        help="sorted-impl authority storage dtype; bf16 "
                             "halves the streaming floor (documented "
                             "parity-ledger deviation)")
    parser.add_argument("--sorted_precision", default=None,
                        choices=["fast", "split", "highest"],
                        help="sorted-kernel segment-sum precision (measured "
                             "tradeoff table in ops/pallas/sorted_adam.py; "
                             "default: split for f32 storage, fast for bf16)")
    parser.add_argument("--resident_gather", default="step",
                        choices=["step", "dispatch"],
                        help="device-resident batch assembly granularity "
                             "(PROFILE.md SS4; 'step' measured faster)")
    def _fused_inference_value(v):
        # reject anything but "auto" AT PARSE TIME: nargs="?" would
        # otherwise swallow a following token (e.g. a typo'd flag value)
        # and fail only later, deep in CTRTrainer (ADVICE r4)
        if v != "auto":
            raise argparse.ArgumentTypeError(
                f"--fused_inference takes no value or 'auto', got {v!r}")
        return v

    parser.add_argument("--fused_inference", nargs="?", const=True,
                        default=False, type=_fused_inference_value,
                        help="Pallas fused eval kernels: flag alone forces "
                             "on; '--fused_inference auto' consults the "
                             "measured per-model win table (PROFILE.md)")
    parser.add_argument("--device_resident", action="store_true",
                        help="device-resident epochs: batches assembled on "
                             "the TPU (data/device.py)")
    parser.add_argument("--device_shuffle", action="store_true",
                        help="with --device_resident: generate epoch "
                             "permutations ON the TPU (jax.random stream — "
                             "not BatchIterable's numpy stream; zero host "
                             "RNG pass and zero permutation upload)")
    parser.add_argument("--device_eval", action="store_true",
                        help="score AUC/logloss on device (static-shape "
                             "per-domain masks; for large eval sets)")
    return parser

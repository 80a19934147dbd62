"""Pallas TPU kernels for the hot paths.

- ``folding``: eval-time Linear→BatchNorm constant folding (precondition for
  the fused kernels).
- ``mmoe_infer``: the flagship fused inference kernel — the entire
  post-embedding MMOE stack (E experts × layers, D gates, mixture, towers,
  sigmoid, domain select) in ONE kernel out of VMEM.

Kernels run compiled on TPU and in interpreter mode elsewhere (tests pin
numerical equality with the reference-parity ``model.apply`` path).
"""

# Per-model fused-vs-XLA serving outcome, measured on the TPU v5e
# (PROFILE.md SS1, regenerated each round by scripts/tpu_numerics_profile.py):
# fusion wins for the gate/mixture families — their expert/gate/tower
# stacks stay resident in VMEM — and loses for the adapter/hyper families
# (hamur/m2m/epnet/ppnet/ple), whose per-domain slice-heavy segments and
# inter-segment batch-stat reductions XLA schedules better than a kernel
# chain can. ``CTRTrainer(fused_inference="auto")`` consults this set.
FUSED_INFERENCE_WINS = frozenset({
    "MMOE", "Sarnet", "M3oE", "Star", "AdaptDHM", "SharedBottom"})


def fused_inference_auto(model) -> bool:
    """True iff the measured per-model table says fusion wins for this
    model class (and it has a fused eval path at all)."""
    return (type(model).__name__ in FUSED_INFERENCE_WINS
            and hasattr(model, "apply_fused_eval"))


from .adaptdhm_infer import adaptdhm_fused_infer
from .folding import fold_bn_linear_eval, fold_stacked_mlp_eval
from .hamur_infer import hamur_fused_infer
from .gated_infer import (adasparse_fused_infer, epnet_fused_infer,
                          ppnet_fused_infer)
from .m3oe_infer import m3oe_fused_infer
from .mmoe_infer import mmoe_fused_infer
from .ple_infer import ple_fused_infer
from .sarnet_infer import sarnet_fused_infer
from .star_infer import star_fused_infer
from .tower_infer import trunk_towers_fused_infer

__all__ = ["FUSED_INFERENCE_WINS", "fused_inference_auto",
           "fold_bn_linear_eval", "fold_stacked_mlp_eval",
           "adasparse_fused_infer", "epnet_fused_infer", "ppnet_fused_infer",
           "mmoe_fused_infer", "ple_fused_infer", "sarnet_fused_infer",
           "star_fused_infer", "adaptdhm_fused_infer", "m3oe_fused_infer",
           "hamur_fused_infer",
           "trunk_towers_fused_infer"]

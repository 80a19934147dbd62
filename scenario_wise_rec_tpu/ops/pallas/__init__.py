"""Pallas TPU kernels for the hot paths.

- ``folding``: eval-time Linear→BatchNorm constant folding (precondition for
  the fused kernels).
- ``mmoe_infer``: the flagship fused inference kernel — the entire
  post-embedding MMOE stack (E experts × layers, D gates, mixture, towers,
  sigmoid, domain select) in ONE kernel out of VMEM.

Kernels run compiled on TPU and in interpreter mode elsewhere (tests pin
numerical equality with the reference-parity ``model.apply`` path).
"""

from .folding import fold_stacked_mlp_eval
from .mmoe_infer import mmoe_fused_infer
from .ple_infer import ple_fused_infer
from .tower_infer import trunk_towers_fused_infer

__all__ = ["fold_stacked_mlp_eval", "mmoe_fused_infer", "ple_fused_infer",
           "trunk_towers_fused_infer"]

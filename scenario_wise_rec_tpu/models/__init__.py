"""Model registry (reference models/multi_domain/__init__.py:1-12).

Model-name aliases normalize the reference scripts' inconsistent casing
("sharedbottom"/"Sharedbottom"/"SharedBottom", SURVEY §2.2 C14).
"""

from .adaptdhm import AdaptDHM
from .adasparse import AdaSparse
from .base import Base, Model
from .epnet import EPNet
from .hamur import HamurLarge, HamurSmall, MlpNLayer
from .m2m import M2M
from .m3oe import M3oE
from .mmoe import MMOE
from .ple import PLE
from .ppnet import PPNet
from .sarnet import Sarnet
from .sharedbottom import SharedBottom
from .star import Star

MODEL_REGISTRY = {
    "sharedbottom": SharedBottom,
    "sharebottom": SharedBottom,
    "mmoe": MMOE,
    "ple": PLE,
    "star": Star,
    "sarnet": Sarnet,
    "epnet": EPNet,
    "ppnet": PPNet,
    "adasparse": AdaSparse,
    "m2m": M2M,
    "adaptdhm": AdaptDHM,
    "hamur": HamurLarge,
    "hamurlarge": HamurLarge,
    "hamur_small": HamurSmall,
    "hamursmall": HamurSmall,
    "m3oe": M3oE,
    "mlpn": MlpNLayer,
    "base": Base,
}


def get_model(name: str):
    """Resolve a model class from any casing of its name."""
    key = name.lower().replace("-", "")
    if key in MODEL_REGISTRY:
        return MODEL_REGISTRY[key]
    key = key.replace("_", "")
    if key in MODEL_REGISTRY:
        return MODEL_REGISTRY[key]
    raise KeyError(f"unknown model '{name}' (known: {sorted(MODEL_REGISTRY)})")


__all__ = [
    "Model", "Base", "SharedBottom", "MMOE", "PLE", "Star", "Sarnet", "EPNet",
    "PPNet", "AdaSparse", "M2M", "AdaptDHM", "HamurLarge", "HamurSmall",
    "MlpNLayer", "M3oE", "MODEL_REGISTRY", "get_model",
]

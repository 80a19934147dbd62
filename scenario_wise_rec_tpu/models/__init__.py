"""Model registry (reference models/multi_domain/__init__.py:1-12).

Model-name aliases normalize the reference scripts' inconsistent casing
("sharedbottom"/"Sharedbottom"/"SharedBottom", SURVEY §2.2 C14).
"""

from .base import Base, Model
from .mmoe import MMOE
from .sharedbottom import SharedBottom

MODEL_REGISTRY = {
    "sharedbottom": SharedBottom,
    "mmoe": MMOE,
    "base": Base,
}


def get_model(name: str):
    """Resolve a model class from any casing of its name."""
    key = name.lower().replace("_", "").replace("-", "")
    if key in MODEL_REGISTRY:
        return MODEL_REGISTRY[key]
    raise KeyError(f"unknown model '{name}' (known: {sorted(MODEL_REGISTRY)})")


__all__ = ["Model", "Base", "SharedBottom", "MMOE", "MODEL_REGISTRY", "get_model"]

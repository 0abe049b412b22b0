"""Model zoo (L3 of the reference layer map, SURVEY.md §2.4)."""

from mammodissect.models.layers import (
    GeM,
    LinearClassifier,
    LinearProjectionHead,
    MLPProjectionHead,
    SqueezeExcite,
)
from mammodissect.models.efficientnet import EfficientNet, EfficientNetMammo

__all__ = [
    "GeM",
    "LinearClassifier",
    "LinearProjectionHead",
    "MLPProjectionHead",
    "SqueezeExcite",
    "EfficientNet",
    "EfficientNetMammo",
]

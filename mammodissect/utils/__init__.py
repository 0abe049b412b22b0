"""Misc utilities — natively provides the reference's *missing* external `utils` module
(`seed_all, AverageMeter, timeSince, get_Paths`; see SURVEY.md §0 "External, not-vendored
dependencies", reference `Classifiers/experiments.py:20`,
`Finetune/lumi_single_gpu_train_classifier.py:6`)."""

from mammodissect.utils.seed import seed_all, seed_everything
from mammodissect.utils.meters import AverageMeter, timeSince, asMinutes
from mammodissect.utils.paths import get_Paths
from mammodissect.utils.registry import Registry

__all__ = [
    "seed_all",
    "seed_everything",
    "AverageMeter",
    "timeSince",
    "asMinutes",
    "get_Paths",
    "Registry",
]

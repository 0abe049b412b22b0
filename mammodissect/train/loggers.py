"""Observability (SURVEY.md §2.9): master-only TensorBoard + optional wandb.

`MasterOnlyWriter` mirrors the reference's `DistSummaryWriter` (every public method
gated on master rank, `util/dist_summery_writer.py:6-31`); here 'master' is
jax.process_index()==0. TensorBoard via torch.utils.tensorboard when importable,
else a no-op. wandb likewise optional (zero-egress environments log locally)."""
from __future__ import annotations

from typing import Dict, Optional


class MasterOnlyWriter:
    def __init__(self, log_dir: Optional[str] = None, enabled: bool = True):
        import jax

        self._active = enabled and log_dir is not None and jax.process_index() == 0
        self._writer = None
        if self._active:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._active = False

    def add_scalar(self, tag: str, value, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), int(step))

    def add_scalars(self, scalars: Dict[str, float], step: int):
        for tag, v in scalars.items():
            self.add_scalar(tag, v, step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


class WandbLogger:
    """Optional wandb run (reference projects: 'broader_clip-dissect',
    'MammoCLIP_classifier_finetune'); silently disabled when wandb is unavailable or
    offline init fails."""

    def __init__(self, project: Optional[str] = None, name: Optional[str] = None,
                 config: Optional[dict] = None, enabled: bool = False):
        self._run = None
        if not enabled or project is None:
            return  # no jax import on the disabled path: a no-op logger must not
            # initialize the backend as a side effect
        import jax

        # master-only, like every reference wandb.init site (rank-0 gating,
        # `Classifiers/experiments.py:278,306`)
        if jax.process_index() != 0:
            return
        try:
            import wandb

            self._run = wandb.init(project=project, name=name, config=config or {},
                                   mode="offline")
        except Exception:
            self._run = None

    def log(self, data: Dict):
        if self._run is not None:
            self._run.log(data)

    def finish(self):
        if self._run is not None:
            self._run.finish()

"""Learning-rate schedules.

`linear_warmup_cosine_annealing` natively replaces the reference's external
`breastclip.scheduler.LinearWarmupCosineAnnealingLR` (imported at
`Classifiers/experiments.py:18`, constructed with
{'total_epochs', 'warmup_steps', 'total_steps'} at `experiments.py:150-156`):
linear warmup 0 → base_lr over `warmup_steps`, then cosine anneal base_lr → eta_min
over the remaining steps. Returned as an optax schedule (step -> lr)."""
from __future__ import annotations

import optax


def linear_warmup_cosine_annealing(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
) -> optax.Schedule:
    warmup_steps = max(int(warmup_steps), 0)
    decay_steps = max(int(total_steps) - warmup_steps, 1)
    warmup = optax.linear_schedule(
        init_value=warmup_start_lr, end_value=base_lr, transition_steps=max(warmup_steps, 1)
    )
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=decay_steps, alpha=eta_min / base_lr if base_lr else 0.0
    )
    if warmup_steps == 0:
        return cosine
    return optax.join_schedules([warmup, cosine], boundaries=[warmup_steps])

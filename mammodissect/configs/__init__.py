"""Typed config system (L0) — one mechanism replacing the reference's argparse +
hardcoded dicts + hydra/omegaconf trio (SURVEY.md §5 config row)."""

from mammodissect.configs.config import load_config, save_config, apply_overrides

__all__ = ["load_config", "save_config", "apply_overrides"]

"""BreastClip contrastive pretraining loop (the capability the reference imports from
the external Mammo-CLIP codebase — SURVEY.md §3.5: loss config {label_smoothing,
i2i_weight 1.0, t2t_weight 0.5} at `concept_vit/utils.py:443`).

pjit global-view DP (+ optional BERT tensor parallelism); per-step warmup-cosine;
orbax checkpoints with full optimizer state (resumable, unlike the reference)."""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mammodissect.models.breastclip import BreastClip, default_model_config
from mammodissect.parallel.mesh import make_mesh
from mammodissect.parallel.sharding import param_shardings, shard_batch
from mammodissect.train.checkpoints import save_checkpoint
from mammodissect.train.clip_trainer import jit_clip_train_step
from mammodissect.train.loggers import MasterOnlyWriter
from mammodissect.train.trainer import TrainerState, make_optimizer
from mammodissect.utils import AverageMeter, seed_all


@dataclass
class PretrainConfig:
    csv_file: str = ""
    root: str = ""
    img_dir: str = ""
    dataset: str = "vindr"
    prompts_json: Optional[str] = None
    vocab_file: Optional[str] = None
    epochs: int = 10
    batch_size: int = 16
    lr: float = 5.0e-5
    weight_decay: float = 1e-4
    warmup_steps: int = 100
    img_size: tuple = (1520, 912)
    text_max_length: int = 256
    label_smoothing: float = 0.0
    i2i_weight: float = 1.0
    t2t_weight: float = 0.5
    model_parallel: int = 1
    checkpoints: str = "./checkpoints_pretrain"
    tensorboard_path: str = "./tb_pretrain"
    seed: int = 10
    bert_layers: int = 12
    image_variant: str = "efficientnet-b5"
    dtype: str = "bfloat16"
    log_freq: int = 10
    ckpt_freq_steps: int = 500


def pretrain(cfg: PretrainConfig, dataset, log=print) -> Dict:
    """Run contrastive pretraining over an ImageTextDataset; returns final state info."""
    seed_all(cfg.seed)
    from mammodissect.models.tokenizers import WordPieceTokenizer

    tok = (WordPieceTokenizer(vocab_file=cfg.vocab_file) if cfg.vocab_file
           else WordPieceTokenizer.toy())

    model_config = default_model_config()
    model_config["image_encoder"]["variant"] = cfg.image_variant
    clip = BreastClip.create(
        model_config=model_config, tokenizer=tok,
        image_shape=(cfg.img_size[0], cfg.img_size[1], 1),
        bert_layers=cfg.bert_layers, vocab_size=len(tok.vocab), seed=cfg.seed,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
    module, variables = clip.module, clip.variables

    steps_per_epoch = max(len(dataset) // cfg.batch_size, 1)
    total_steps = steps_per_epoch * cfg.epochs
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.warmup_steps, total_steps)

    mesh = make_mesh(model_parallel=cfg.model_parallel)
    tp = cfg.model_parallel > 1
    step_fn = jit_clip_train_step(
        module, tx, mesh, tensor_parallel=tp, variables=variables,
        label_smoothing=cfg.label_smoothing, i2i_weight=cfg.i2i_weight,
        t2t_weight=cfg.t2t_weight,
        # the dataset declares its wire: u8 datasets ship post-transform uint8
        # and the step normalizes on device with the dataset's own constants
        input_wire=getattr(dataset, "wire", "f32"),
        norm_mean=getattr(dataset, "mean", 0.0),
        norm_std=getattr(dataset, "std", 1.0),
    )
    if tp:
        p_shard = param_shardings(mesh, variables["params"], tensor_parallel=True)
        s_shard = param_shardings(mesh, variables.get("batch_stats", {}), tensor_parallel=True)
        put = lambda t, s: jax.tree_util.tree_map(
            lambda x, sh: jax.device_put(jnp.array(x, copy=True), sh), t, s)
        params = put(variables["params"], p_shard)
        stats = put(variables["batch_stats"], s_shard)
    else:
        from mammodissect.parallel.sharding import replicate_tree

        params = replicate_tree(mesh, variables["params"])
        stats = replicate_tree(mesh, variables["batch_stats"])
    opt_state = tx.init(params)

    tb = MasterOnlyWriter(cfg.tensorboard_path)
    os.makedirs(cfg.checkpoints, exist_ok=True)
    key = jax.random.PRNGKey(cfg.seed)
    losses = AverageMeter()
    step = 0
    loss = jnp.nan  # len(dataset) < batch_size yields ZERO batches (drop_last)
    hi, hc = jax.process_index(), jax.process_count()

    def to_device(host_batch):
        """Single-process: pjit shards the full batch. Multi-host: each process
        contributes its local slice of the global contrastive batch (in-batch
        arange labels and the i2i/t2t terms see the GLOBAL batch)."""
        if hc == 1:
            return shard_batch(mesh, host_batch)
        from mammodissect.parallel.multihost import global_batch_from_local

        return global_batch_from_local(mesh, host_batch)

    with mesh:
        for epoch in range(cfg.epochs):
            for batch in dataset.batches(tok, cfg.batch_size,
                                         max_length=cfg.text_max_length,
                                         seed=cfg.seed + epoch,
                                         host_index=hi, host_count=hc):
                # numpy straight through: to_device shards/assembles itself, and
                # a jnp.asarray here would round-trip the ~40 MB image batch
                # device->host->device on multi-host (global_batch_from_local
                # starts from process-local NUMPY slices)
                device_batch = to_device({
                    k: v for k, v in batch.items()
                    if k not in ("texts", "texts2")
                })
                key, sub = jax.random.split(key)
                params, stats, opt_state, loss = step_fn(
                    params, stats, opt_state, device_batch, sub)
                step += 1
                if step % cfg.log_freq == 0:
                    lv = float(loss)
                    losses.update(lv)
                    tb.add_scalar("pretrain/loss", lv, step)
                    log(f"epoch {epoch} step {step}/{total_steps} loss {lv:.4f}")
                if step % cfg.ckpt_freq_steps == 0:
                    # collective: orbax save has internal all-host barriers, so
                    # EVERY process calls it (orbax elects the writer); a rank-0
                    # gate would deadlock the pod at the first checkpoint
                    save_checkpoint(
                        os.path.join(cfg.checkpoints, f"step_{step}"),
                        TrainerState(params, stats, opt_state, step), epoch, {})
    final = os.path.join(cfg.checkpoints, "final")
    save_checkpoint(final, TrainerState(params, stats, opt_state, step),
                    cfg.epochs, {})
    tb.close()
    return {"steps": step, "final_checkpoint": final, "last_loss": float(loss)}

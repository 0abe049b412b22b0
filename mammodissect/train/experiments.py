"""Fine-tune/eval experiment orchestration — parity with the reference's
`Classifiers/experiments.py` (DDP) + `single_gpu_experiments.py` (single device):
`do_experiments` handles fold splits, n_class mapping, the train loop with per-epoch
validation, patient-level aggregation, best-metric checkpointing, and the
inference / loaded-inference / unpretrained modes. One engine serves both single-chip
and multi-chip (the Mesh does what DDP + DistributedSampler did)."""
from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from mammodissect import metrics as M
from mammodissect.models.classifier import (
    BreastClipClassifierModule,
    arch_is_linear_probe,
    arch_variant,
    frozen_param_labels,
)
from mammodissect.parallel.mesh import make_mesh
from mammodissect.train.checkpoints import load_for_eval, save_checkpoint
from mammodissect.train.data import ClassifierDataset, class_balanced_weights, iter_epoch
from mammodissect.train.loggers import MasterOnlyWriter, WandbLogger
from mammodissect.train.trainer import Trainer, make_optimizer
from mammodissect.utils import AverageMeter, seed_all, timeSince


@dataclass
class FinetuneConfig:
    """Typed flag surface of `Finetune/lumi_single_gpu_train_classifier.py:14-79`."""

    csv_file: str = ""
    data_dir: str = ""
    image_col: str = "image_path"
    dataset: str = "vindr"  # vindr | rsna | csaw
    label: str = "cancer"  # density | birads | cancer_birads | cancer | Mass | ...
    arch: str = "upmc_breast_clip_det_b5_period_n_ft"
    clip_chk_pt_path: Optional[str] = None
    checkpoints: str = "./checkpoints"
    output_path: str = "./outputs"
    tensorboard_path: str = "./tb_logs"
    epochs: int = 30
    batch_size: int = 8
    lr: float = 5.0e-5
    weight_decay: float = 1e-4
    warmup_epochs: float = 1.0
    img_size: tuple = (1520, 912)
    mean: float = 0.3089279
    std: float = 0.25053555
    seed: int = 10
    n_folds: int = 1
    cur_fold: int = 0
    weighted_BCE: str = "n"
    BCE_weights: Dict[str, float] = field(default_factory=dict)
    balanced_dataloader: str = "n"
    sampler_weights: Dict[int, float] = field(default_factory=dict)
    data_frac: float = 1.0
    running_interactive: bool = False
    inference_mode: str = "n"  # n | y | load | train_un_mammopretrained
    finetuned_ckpt_path: Optional[str] = None
    model_parallel: int = 1
    dtype: str = "bfloat16"
    # host->device image wire. 'u8' (default): post-transform uint8 batches,
    # min-max + mean/std on device — 4x fewer wire bytes AND closer to the
    # reference than 'f32' (the reference resizes in uint8 and normalizes at
    # tensor conversion, Datasets/dataset_concepts.py:206-215; our f32 path
    # resizes in float). 'f32': host-normalized float batches.
    input_wire: str = "u8"
    bn_momentum: float = 0.99  # lower for short fine-tunes so running stats converge
    pad_mode: str = "static"  # reference-faithful static SAME; "same" for toy geometries
    remat: bool = False  # rematerialize conv blocks: bigger batches at 1520x912
    resume_from: Optional[str] = None  # checkpoint path: restore params+opt_state+epoch
    train_eval: bool = True  # also eval the train folds per epoch (`experiments.py:200-217`)
    print_freq: int = 50
    log_freq: int = 10
    wandb: bool = False
    model_base_name: str = "mammodissect_clf"
    VER: str = "1"

    @property
    def n_class(self) -> int:
        # `experiments.py:122-129`
        lab = self.label.lower()
        return {"density": 4, "cancer_birads": 5, "birads": 3}.get(lab, 1)

    @property
    def multiclass(self) -> bool:
        return self.n_class > 1


def split_folds(cfg: FinetuneConfig, df: pd.DataFrame):
    """Fold logic (`experiments.py:43-61`): RSNA by fold col, VinDr/CSAW by split col."""
    ds = cfg.dataset.lower()
    if ds == "rsna" and "fold" in df.columns:
        train_folds = df[df["fold"] != cfg.cur_fold].reset_index(drop=True)
        valid_folds = df[df["fold"] == cfg.cur_fold].reset_index(drop=True)
    elif "split" in df.columns:
        train_split = "training" if (df["split"] == "training").any() else "train"
        train_folds = df[df["split"] == train_split].reset_index(drop=True)
        valid_folds = df[df["split"] != train_split].reset_index(drop=True)
    else:
        cut = int(len(df) * 0.8)
        train_folds, valid_folds = df.iloc[:cut].reset_index(drop=True), df.iloc[cut:].reset_index(drop=True)
    if cfg.data_frac < 1.0:
        train_folds = train_folds.sample(frac=cfg.data_frac, random_state=1).reset_index(drop=True)
    if cfg.running_interactive:  # smoke mode (`experiments.py:110-114`)
        train_folds = train_folds.sample(min(1000, len(train_folds)), random_state=1).reset_index(drop=True)
        valid_folds = valid_folds.sample(min(1000, len(valid_folds)), random_state=1).reset_index(drop=True)
    return train_folds, valid_folds


def aggregate_patient_level(cfg: FinetuneConfig, folds: pd.DataFrame) -> pd.DataFrame:
    """Patient/laterality aggregation before metrics (`experiments.py:208-217`)."""
    ds = cfg.dataset.lower()
    if ds == "rsna" and {"patient_id", "laterality"} <= set(folds.columns):
        return folds[["patient_id", "laterality", cfg.label, "prediction"]].groupby(
            ["patient_id", "laterality"]).mean().reset_index()
    if ds == "csaw" and "anon_filename" in folds.columns:
        return folds[["anon_filename", cfg.label, "prediction"]].groupby(
            ["anon_filename"]).mean().reset_index()
    return folds


def build_model(cfg: FinetuneConfig):
    """BreastClipClassifier from arch string + optional Mammo-CLIP ckpt
    (`breast_clip_classifier.py:6-51`)."""
    module = BreastClipClassifierModule(
        variant=arch_variant(cfg.arch),
        n_class=cfg.n_class,
        pad_mode=cfg.pad_mode,
        freeze_encoder=arch_is_linear_probe(cfg.arch),
        bn_momentum=cfg.bn_momentum,
        remat=cfg.remat,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
    h, w = cfg.img_size
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(cfg.seed), jnp.ones((1, h, w, 1), jnp.float32)
    )
    variables = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    if cfg.clip_chk_pt_path:
        from mammodissect.utils.torch_convert import (
            efficientnet_torch_to_flax,
            merge_into,
            torch_load_state_dict,
        )

        sd, _ = torch_load_state_dict(cfg.clip_chk_pt_path)
        enc_params, enc_stats, _ = efficientnet_torch_to_flax(sd, prefix="image_encoder.")
        updates = {
            "params": {"image_encoder": {"backbone": enc_params}},
            "batch_stats": {"image_encoder": {"backbone": enc_stats}},
        }
        variables, mismatches = merge_into(variables, updates)
        if mismatches:
            print(f"[build_model] strict=False load: {len(mismatches)} unmatched")
    return module, variables


def _epoch_metrics(cfg: FinetuneConfig, folds: pd.DataFrame, predictions: np.ndarray) -> Dict:
    folds = folds.copy()
    folds["prediction"] = predictions[: len(folds)]
    agg = aggregate_patient_level(cfg, folds)
    out: Dict[str, float] = {}
    if cfg.multiclass:
        out["accuracy"] = float((agg[cfg.label] == agg["prediction"]).mean())
        out["f1"] = M.f1_macro(agg[cfg.label].values, agg["prediction"].values)
    else:
        out["auroc"] = M.auroc(agg[cfg.label].values, agg["prediction"].values)
        out["pr_auc"] = M.pr_auc(agg[cfg.label].values, agg["prediction"].values)
        out["pfbeta"] = M.pfbeta(agg[cfg.label].values, agg["prediction"].values)
    return out


def _mem_postfix() -> str:
    """Device-memory log postfix (the reference's tqdm CUDA-Mem/Util readout,
    `experiments.py:440-447`); empty when the backend exposes no stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use")
        limit = stats.get("bytes_limit")
        if used is not None and limit:
            return f" [hbm {used / 1e9:.2f}/{limit / 1e9:.1f} GB]"
    except Exception:
        pass
    return ""


def _run_eval(trainer, dataset, batch_size: int, label_dtype) -> tuple:
    """Eval pass; on multi-host runs each process scores its contiguous shard and
    the predictions are allgathered + trimmed to the true dataset length — the
    reference's dist.all_gather-and-trim (`Classifiers/experiments.py:554-564`)."""
    hi, hc = jax.process_index(), jax.process_count()
    losses = AverageMeter()
    preds = []
    for batch in iter_epoch(dataset, batch_size, shuffle=False,
                            label_dtype=label_dtype, host_index=hi, host_count=hc):
        loss, p = trainer.eval_batch(batch.images, batch.labels, batch.n_valid)
        losses.update(loss, batch.n_valid)
        preds.append(p[: batch.n_valid])
    local = np.concatenate(preds) if preds else np.zeros(0)
    if hc > 1:
        from mammodissect.parallel.multihost import gather_predictions

        return losses.avg, gather_predictions(local, total=len(dataset))
    return losses.avg, local


def train_loop(cfg: FinetuneConfig, train_folds: pd.DataFrame, valid_folds: pd.DataFrame,
               log=print) -> pd.DataFrame:
    """Parity with `experiments.py:97-310` train_loop."""
    seed_all(cfg.seed)
    module, variables = build_model(cfg)

    label_dtype = np.int32 if cfg.multiclass else np.float32
    mk_ds = lambda df, train: ClassifierDataset(
        df, image_col=cfg.image_col, label_col=cfg.label, root=cfg.data_dir,
        size_hw=tuple(cfg.img_size), mean=cfg.mean, std=cfg.std, train=train, seed=cfg.seed,
        wire=cfg.input_wire,
    )
    train_ds, valid_ds = mk_ds(train_folds, True), mk_ds(valid_folds, False)

    hi, hc = jax.process_index(), jax.process_count()
    # per-host steps (multi-host shards the epoch; the scheduler sees local steps,
    # matching the reference's per-rank DistributedSampler epoch length). Ceil on
    # the batch division too: iter_epoch yields the padded tail batch, and an
    # undercounted total would park the cosine tail at the terminal LR.
    shard_len = -(-len(train_ds) // hc)
    steps_per_epoch = max(-(-shard_len // cfg.batch_size), 1)
    # warmup_steps logic (`experiments.py:144-150`)
    if cfg.warmup_epochs == 0.1:
        warmup_steps = cfg.epochs
    elif cfg.warmup_epochs == 1:
        warmup_steps = steps_per_epoch
    else:
        warmup_steps = 10
    labels_tree = frozen_param_labels(variables["params"], arch_is_linear_probe(cfg.arch))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, warmup_steps,
                        steps_per_epoch * cfg.epochs, param_labels=labels_tree)

    pos_weight = None
    if cfg.weighted_BCE == "y" and not cfg.multiclass:
        pos_weight = float(cfg.BCE_weights.get(f"fold{cfg.cur_fold}", 1.0))

    mesh = make_mesh(model_parallel=cfg.model_parallel) if jax.device_count() > 1 else None
    trainer = Trainer(module, variables, tx,
                      loss_kind="ce" if cfg.multiclass else "bce",
                      pos_weight=pos_weight, mesh=mesh, seed=cfg.seed,
                      input_wire=cfg.input_wire,
                      norm_mean=cfg.mean, norm_std=cfg.std)
    start_epoch = 0
    if cfg.resume_from:
        from mammodissect.train.checkpoints import load_checkpoint

        ckpt = load_checkpoint(cfg.resume_from)
        trainer.restore(ckpt)
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        log(f"[resume] restored step {trainer.state.step}, continuing at epoch "
            f"{start_epoch}")

    tb = MasterOnlyWriter(os.path.join(cfg.tensorboard_path, f"fold{cfg.cur_fold}"))
    wb = WandbLogger("MammoCLIP_classifier_finetune", enabled=cfg.wandb,
                     config=dataclasses.asdict(cfg))

    balanced = None
    if cfg.balanced_dataloader == "y":
        balanced = class_balanced_weights(
            train_folds[cfg.label].values.astype(np.int64), cfg.sampler_weights or None
        )

    os.makedirs(cfg.checkpoints, exist_ok=True)
    ckpt_path = os.path.join(
        cfg.checkpoints,
        f"{cfg.model_base_name}_seed_{cfg.seed}_fold{cfg.cur_fold}_best_{cfg.label}_ver{cfg.VER}",
    )
    best_metric = -np.inf
    if start_epoch > 0 and os.path.exists(ckpt_path):
        # resuming into a dir that already holds a best checkpoint: start from
        # ITS watch metric — resetting to -inf would let the first post-resume
        # epoch overwrite a BETTER saved best with a worse one. A fresh
        # checkpoints dir records its own best from scratch.
        m = load_for_eval(ckpt_path)["metrics"] or {}
        best_metric = float(m.get("accuracy", m.get("auroc", -np.inf)))
        log(f"[resume] standing best at {ckpt_path}: {best_metric:.4f}")
    start = time.time()
    step = trainer.state.step
    for epoch in range(start_epoch, cfg.epochs):
        losses = AverageMeter()
        for batch in iter_epoch(train_ds, cfg.batch_size, shuffle=True,
                                seed=cfg.seed + epoch, balanced_weights=balanced,
                                label_dtype=label_dtype,
                                host_index=hi, host_count=hc):
            loss = trainer.train_batch(batch.images, batch.labels, batch.n_valid)
            losses.update(loss, batch.n_valid)
            step += 1
            if step % cfg.log_freq == 0:
                tb.add_scalar("train/iter_loss", loss, step)
            if step % cfg.print_freq == 0:
                log(f"epoch {epoch} step {step} loss {loss:.4f} "
                    f"{timeSince(start, (epoch + 1) / cfg.epochs)}{_mem_postfix()}")

        val_loss, predictions = _run_eval(trainer, valid_ds, cfg.batch_size, label_dtype)
        metrics = _epoch_metrics(cfg, valid_folds, predictions)
        tb.add_scalar("train/epoch", losses.avg, epoch + 1)
        tb.add_scalar("valid/iter_loss", val_loss, epoch + 1)
        for k, v in metrics.items():
            tb.add_scalar(f"valid/{cfg.label}/{k}", v, epoch + 1)
        train_metrics = {}
        if cfg.train_eval:
            # eval-mode pass over the train folds (reference's train_eval_loader +
            # train_agg metrics, `experiments.py:200-217,229-230,256`)
            train_eval_ds = mk_ds(train_folds, False)
            _, tr_predictions = _run_eval(trainer, train_eval_ds, cfg.batch_size,
                                          label_dtype)
            train_metrics = {
                f"train_{k}": v
                for k, v in _epoch_metrics(cfg, train_folds, tr_predictions).items()
            }
        wb.log({"epoch": epoch + 1, "train_loss": losses.avg, "valid_loss": val_loss,
                **metrics, **train_metrics})

        watch = metrics.get("accuracy", metrics.get("auroc", 0.0))
        if not np.isnan(watch) and watch > best_metric:
            best_metric = watch
            # every host reaches the same decision (predictions are allgathered
            # identically) and ALL must call save: orbax's save is a collective
            # with internal sync_global_processes barriers — rank-0-only gating
            # would deadlock a multi-host run. Orbax itself elects the writer
            # (the reference's rank-0 torch.save, `experiments.py:232,258`).
            save_checkpoint(ckpt_path, trainer.state, epoch, metrics, predictions)
            log(f"epoch {epoch + 1}: new best {watch:.4f} -> {ckpt_path}")
        log(f"epoch {epoch + 1}: train {losses.avg:.4f} valid {val_loss:.4f} "
            f"{metrics} {train_metrics}")

    tb.close()
    wb.finish()
    valid_folds = valid_folds.copy()
    if os.path.exists(ckpt_path):
        best = load_for_eval(ckpt_path)
        if best["predictions"] is not None:
            valid_folds["prediction"] = np.asarray(best["predictions"])[: len(valid_folds)]
    return valid_folds


def inference_loop(cfg: FinetuneConfig, valid_folds: pd.DataFrame, log=print) -> pd.DataFrame:
    """Rebuild classifier from ckpt(s) and re-run validation
    (`single_gpu_experiments.py:296-372`)."""
    module, variables = build_model(cfg)
    if cfg.finetuned_ckpt_path:
        best = load_for_eval(cfg.finetuned_ckpt_path)
        variables = best["variables"]
    tx = make_optimizer(cfg.lr, cfg.weight_decay, 1, 10)
    # same mesh policy as train_loop: a 1-device default would evaluate on one
    # chip of a multi-chip host, and on a pod the host-sharded eval dataset
    # would assemble a global batch over a mesh with no addressable shards on
    # processes != 0 (crash)
    mesh = make_mesh(model_parallel=cfg.model_parallel) if jax.device_count() > 1 else None
    trainer = Trainer(module, variables, tx,
                      loss_kind="ce" if cfg.multiclass else "bce", mesh=mesh,
                      seed=cfg.seed, input_wire=cfg.input_wire,
                      norm_mean=cfg.mean, norm_std=cfg.std)
    ds = ClassifierDataset(valid_folds, image_col=cfg.image_col, label_col=cfg.label,
                           root=cfg.data_dir, size_hw=tuple(cfg.img_size),
                           mean=cfg.mean, std=cfg.std, train=False,
                           wire=cfg.input_wire)
    label_dtype = np.int32 if cfg.multiclass else np.float32
    _, predictions = _run_eval(trainer, ds, cfg.batch_size, label_dtype)
    metrics = _epoch_metrics(cfg, valid_folds, predictions)
    log(f"[inference] {metrics}")
    out = valid_folds.copy()
    out["prediction"] = predictions[: len(out)]
    return out


def loaded_inference_loop(cfg: FinetuneConfig, valid_folds: pd.DataFrame, log=print):
    """Re-score saved predictions + optimal-threshold FP/FN dump
    (`single_gpu_experiments.py:593-616`, `experiments.py:677-715`)."""
    best = load_for_eval(cfg.finetuned_ckpt_path)
    predictions = np.asarray(best["predictions"])
    out = valid_folds.copy()
    out["prediction"] = predictions[: len(out)]
    metrics = _epoch_metrics(cfg, valid_folds, predictions)
    if not cfg.multiclass:
        th = M.optimal_roc_threshold(out[cfg.label].values, out["prediction"].values)
        out["pred_binary"] = (out["prediction"] >= th).astype(int)
        fp = out[(out["pred_binary"] == 1) & (out[cfg.label] == 0)]
        fn = out[(out["pred_binary"] == 0) & (out[cfg.label] == 1)]
        os.makedirs(cfg.output_path, exist_ok=True)
        fp.to_csv(os.path.join(cfg.output_path, f"fold{cfg.cur_fold}_false_positives.csv"),
                  index=False)
        fn.to_csv(os.path.join(cfg.output_path, f"fold{cfg.cur_fold}_false_negatives.csv"),
                  index=False)
        metrics["optimal_threshold"] = th
    log(f"[loaded_inference] {metrics}")
    return out, metrics


def do_experiments(cfg: FinetuneConfig, log=print) -> pd.DataFrame:
    """Entry mirroring `do_experiments(args, device)` (`experiments.py:23-94`)."""
    # run-metadata dump beside outputs (the reference pickles args,
    # `lumi_single_gpu_train_classifier.py:153`)
    os.makedirs(cfg.output_path, exist_ok=True)
    from mammodissect.configs import save_config

    save_config(cfg, os.path.join(cfg.output_path, "run_config.json"))
    df = pd.read_csv(cfg.csv_file)
    oof = []
    for fold in range(max(cfg.n_folds, 1)):
        cfg = dataclasses.replace(cfg, cur_fold=fold)
        train_folds, valid_folds = split_folds(cfg, df)
        if cfg.inference_mode == "y":
            result = inference_loop(cfg, valid_folds, log=log)
        elif cfg.inference_mode == "load":
            result, _ = loaded_inference_loop(cfg, valid_folds, log=log)
        elif cfg.inference_mode == "train_un_mammopretrained":
            # random-init encoder baseline (`single_gpu_experiments.py:64,619-672`)
            cfg_un = dataclasses.replace(cfg, clip_chk_pt_path=None)
            result = train_loop(cfg_un, train_folds, valid_folds, log=log)
        else:
            result = train_loop(cfg, train_folds, valid_folds, log=log)
        oof.append(result)
    oof_df = pd.concat(oof, ignore_index=True)
    # out-of-fold CV metric for RSNA (`experiments.py:73-94`)
    if not cfg.multiclass and "prediction" in oof_df.columns:
        agg = aggregate_patient_level(cfg, oof_df)
        log(f"[cv] auroc={M.auroc(agg[cfg.label].values, agg['prediction'].values):.4f}")
        os.makedirs(cfg.output_path, exist_ok=True)
        oof_df.to_csv(os.path.join(cfg.output_path, "oof_predictions.csv"), index=False)
    return oof_df

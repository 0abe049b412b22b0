"""Concept–neuron similarity scoring ops, TPU-first.

Re-implements the five scoring functions of the reference (`concept_vit/similarity.py`):
soft_wpmi (:49), wpmi (:75), rank_reorder (:99), cos_similarity (:33),
cos_similarity_cubed (:7) — same math, same hyperparameter defaults, but as jitted,
batched JAX programs instead of per-neuron Python loops.

Shapes (same contract as the reference, SURVEY.md §2.3):
  clip_feats   [N_images, N_concepts]  — dissector image-embs @ text-embs.T (pre-normalized)
  target_feats [N_images, N_neurons]   — pooled activations of the target layer
  returns      [N_neurons, N_concepts] — higher is better

Design notes (TPU):
  * The reference's hot loop is a per-neuron Python `for` with gather+log-reduce
    (`similarity.py:59-65`). Here each neuron's work is a row program mapped with
    `lax.map(..., batch_size=unit_batch)`: XLA sees one fused gather → elementwise →
    reduce kernel per chunk, keeping the [unit_batch, top_k, N_concepts] gather tile in
    VMEM-sized pieces instead of materializing [N_neurons, top_k, N_concepts].
  * All scoring is float32: bf16 matmuls happen upstream in the encoders; scoring must
    match the torch fp32 reference to ≥99% top-1 agreement (BASELINE.md north-star).
  * top-k uses `lax.top_k`, which breaks ties by lowest index — deterministic across
    runs/devices (torch's tie order is unspecified; we document and stabilize).
  * A fused Pallas kernel for the soft-wpmi gather+log-reduce lives in
    `mammodissect/ops/pallas_wpmi.py` and is used automatically on TPU for large inputs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _f32(x) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.float32)


# --------------------------------------------------------------------------- soft_wpmi
@partial(jax.jit, static_argnames=("top_k", "unit_batch", "use_pallas"))
def soft_wpmi(
    clip_feats,
    target_feats,
    top_k: int = 100,
    a: float = 10.0,
    lam: float = 1.0,
    min_prob: float = 1e-7,
    p_start: float = 0.998,
    p_end: float = 0.97,
    unit_batch: int = 128,
    use_pallas: bool = False,
):
    """Soft weighted pointwise mutual information (reference `similarity.py:49-73`).

    p(d|e) = Σ_k log(1 + p_k·(softmax(a·clip)_{top_k(e), d} − 1) + ε) with image-inclusion
    probability p decaying linearly p_start→p_end over the k most-activating images of each
    neuron e; score = p(d|e) − λ·log p(d), log p(d) via logsumexp over neurons."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    k = min(top_k, target_feats.shape[0])

    prob_d_given_e = _soft_wpmi_pde(
        clip_feats, target_feats, k, top_k, a, min_prob, p_start, p_end,
        unit_batch, use_pallas,
    )
    prob_d = jax.nn.logsumexp(prob_d_given_e, axis=0, keepdims=True) - jnp.log(
        jnp.float32(prob_d_given_e.shape[0])
    )
    return prob_d_given_e - lam * prob_d


def _soft_wpmi_pde(clip_feats, target_feats, k, top_k, a, min_prob, p_start, p_end,
                   unit_batch, use_pallas):
    """p(d|e) for every unit: [U, C]. Per-unit independent — shared by the per-layer
    and the segmented (all-layers-in-one-program) entry points."""
    clip_sm = jax.nn.softmax(a * clip_feats, axis=1)  # [N, C]
    # indices of the k most-activating images per neuron: [k, U] -> map over U
    _, inds = lax.top_k(target_feats.T, k)  # [U, k]
    p_in = p_start - (jnp.arange(k, dtype=jnp.float32) / top_k) * (p_start - p_end)  # [k]

    if use_pallas:
        from mammodissect.ops.pallas_wpmi import soft_wpmi_gather_logsum

        return soft_wpmi_gather_logsum(clip_sm, inds, p_in, min_prob)

    def unit_fn(ind_row):  # [k] -> [C]
        rows = clip_sm[ind_row]  # gather [k, C]
        v = 1.0 + p_in[:, None] * (rows - 1.0)
        return jnp.sum(jnp.log(v + min_prob), axis=0)

    return lax.map(unit_fn, inds, batch_size=unit_batch)  # [U, C]


def _segment_logsumexp_mean(x, segment_ids, num_segments):
    """Per-segment logsumexp(x, axis=0) − log(segment size), broadcast back to rows:
    the per-LAYER `log p(d)` of soft_wpmi/wpmi when many layers' units are concatenated
    into one [U_total, C] program (kills the per-unit-width recompiles; VERDICT round 1)."""
    seg_max = jax.ops.segment_max(x, segment_ids, num_segments=num_segments)  # [S, C]
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    sums = jax.ops.segment_sum(
        jnp.exp(x - seg_max[segment_ids]), segment_ids, num_segments=num_segments
    )
    counts = jax.ops.segment_sum(
        jnp.ones((x.shape[0], 1), jnp.float32), segment_ids, num_segments=num_segments
    )
    prob_d = seg_max + jnp.log(sums) - jnp.log(jnp.clip(counts, 1.0))  # [S, C]
    return prob_d[segment_ids]


@partial(jax.jit, static_argnames=("num_segments", "top_k", "unit_batch", "use_pallas"))
def soft_wpmi_segmented(
    clip_feats,
    target_feats,
    segment_ids,
    num_segments: int,
    top_k: int = 100,
    a: float = 10.0,
    lam: float = 1.0,
    min_prob: float = 1e-7,
    p_start: float = 0.998,
    p_end: float = 0.97,
    unit_batch: int = 128,
    use_pallas: bool = False,
):
    """soft_wpmi over MANY layers in one program: target_feats is the [N, U_total]
    concatenation of per-layer activation matrices, segment_ids [U_total] maps each unit
    to its layer. Math identical to calling `soft_wpmi` once per layer — p(d|e) is
    per-unit; log p(d)'s logsumexp runs within each unit's own layer segment."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    k = min(top_k, target_feats.shape[0])
    prob_d_given_e = _soft_wpmi_pde(
        clip_feats, target_feats, k, top_k, a, min_prob, p_start, p_end,
        unit_batch, use_pallas,
    )
    prob_d = _segment_logsumexp_mean(prob_d_given_e, segment_ids, num_segments)
    return prob_d_given_e - lam * prob_d


@partial(jax.jit, static_argnames=("num_segments", "top_k", "unit_batch"))
def wpmi_segmented(
    clip_feats,
    target_feats,
    segment_ids,
    num_segments: int,
    top_k: int = 28,
    a: float = 2.0,
    lam: float = 0.6,
    min_prob: float = 1e-7,
    unit_batch: int = 128,
):
    """wpmi over many layers in one program (see soft_wpmi_segmented)."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    prob_d_given_e = _wpmi_pde(clip_feats, target_feats, top_k, a, min_prob,
                               unit_batch)
    prob_d = _segment_logsumexp_mean(prob_d_given_e, segment_ids, num_segments)
    return prob_d_given_e - lam * prob_d


# -------------------------------------------------------------------------------- wpmi
def _wpmi_pde(clip_feats, target_feats, top_k, a, min_prob, unit_batch):
    """Shared p(d|e) body for wpmi / wpmi_segmented (hard top-k log-prob sum) —
    one implementation so the per-layer and segmented entry points cannot
    diverge."""
    k = min(top_k, target_feats.shape[0])
    clip_sm = jax.nn.softmax(a * clip_feats, axis=1)
    _, inds = lax.top_k(target_feats.T, k)  # [U, k]

    def unit_fn(ind_row):
        rows = clip_sm[ind_row]  # [k, C]
        return jnp.sum(jnp.log(rows + min_prob), axis=0)

    return lax.map(unit_fn, inds, batch_size=unit_batch)  # [U, C]


@partial(jax.jit, static_argnames=("top_k", "unit_batch"))
def wpmi(
    clip_feats,
    target_feats,
    top_k: int = 28,
    a: float = 2.0,
    lam: float = 0.6,
    min_prob: float = 1e-7,
    unit_batch: int = 128,
):
    """Hard-top-k WPMI (reference `similarity.py:75-97`)."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    prob_d_given_e = _wpmi_pde(clip_feats, target_feats, top_k, a, min_prob,
                               unit_batch)
    prob_d = jax.nn.logsumexp(prob_d_given_e, axis=0, keepdims=True) - jnp.log(
        jnp.float32(prob_d_given_e.shape[0])
    )
    return prob_d_given_e - lam * prob_d


# ------------------------------------------------------------------------ rank_reorder
@partial(jax.jit, static_argnames=("p", "top_fraction", "scale_p", "unit_batch", "n_perms"))
def rank_reorder(
    clip_feats,
    target_feats,
    p: int = 3,
    top_fraction: float = 0.05,
    scale_p: float = 0.5,
    key: jax.Array | None = None,
    unit_batch: int = 64,
    n_perms: int = 5,
):
    """Rank-reorder score (reference `similarity.py:99-132`).

    For each neuron: take the top 5% activating images; rank the concept scores on those
    images (double argsort); measure how badly sorting the neuron's activations by each
    concept's rank order reorders them (mean |target − reorg|^p), normalized by the same
    error under `n_perms` random permutations, scaled by mean clip score^scale_p.
    Returns negative error (higher = better). The torch original draws unseeded
    `randperm`s; we take an explicit PRNG `key` (default: PRNGKey(0)) for determinism."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    if key is None:
        key = jax.random.PRNGKey(0)
    n_images, n_units = target_feats.shape
    top_n = max(int(n_images * top_fraction), 1)

    vals, inds = lax.top_k(target_feats.T, top_n)  # [U, top_n] descending
    unit_keys = jax.random.split(key, n_units)

    def unit_fn(args):
        val_row, ind_row, k = args
        clip_rows = clip_feats[ind_row]  # [top_n, C]
        avg_clip = jnp.mean(clip_rows, axis=0)  # [C]
        ranks = jnp.argsort(jnp.argsort(clip_rows, axis=0), axis=0)  # [top_n, C]
        target = val_row  # descending [top_n]
        sorted_target = target[::-1]  # ascending
        perm_keys = jax.random.split(k, n_perms)
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, sorted_target))(perm_keys)
        baseline = jnp.mean(jnp.abs(sorted_target[None, :] - perms) ** p)
        reorg = sorted_target[ranks]  # [top_n, C]
        err = jnp.mean(jnp.abs(target[:, None] - reorg) ** p, axis=0) / baseline
        # The torch reference computes (avg_clip)**0.5 directly (`similarity.py:129`),
        # which is NaN whenever a concept's mean clip score over the top images is
        # negative (raw clip feats are cosine scores in [-1, 1]). We clamp instead:
        # a negative-mean concept gets a huge error scale and ranks last, never NaN.
        return err / (jnp.clip(avg_clip, 1e-6, None) ** scale_p)

    errors = lax.map(unit_fn, (vals, inds, unit_keys), batch_size=unit_batch)  # [U, C]
    return -errors


# ---------------------------------------------------------------------- cos similarity
@jax.jit
def cos_similarity(clip_feats, target_feats):
    """Column-normalized `target.T @ clip` (reference `similarity.py:33-47`). The torch
    original manually tiles 10k-column batches; one XLA matmul maps straight onto the MXU."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    clip_n = clip_feats / jnp.linalg.norm(clip_feats, axis=0, keepdims=True)
    target_n = target_feats / jnp.linalg.norm(target_feats, axis=0, keepdims=True)
    # HIGHEST: scoring must be true fp32 on TPU (MXU default would be bf16 inputs),
    # required for the >=99% top-concept agreement target (BASELINE.md).
    return jnp.dot(
        target_n.T, clip_n, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
    )


@partial(jax.jit, static_argnames=("min_norm",))
def cos_similarity_cubed(clip_feats, target_feats, min_norm: float = 1e-3):
    """Mean-center → cube → column-normalize → matmul (reference `similarity.py:7-31`)."""
    clip_feats = _f32(clip_feats)
    target_feats = _f32(target_feats)
    clip_c = clip_feats - jnp.mean(clip_feats, axis=0, keepdims=True)
    target_c = target_feats - jnp.mean(target_feats, axis=0, keepdims=True)
    clip_c = clip_c**3
    target_c = target_c**3
    clip_c = clip_c / jnp.clip(jnp.linalg.norm(clip_c, axis=0, keepdims=True), min_norm)
    target_c = target_c / jnp.clip(jnp.linalg.norm(target_c, axis=0, keepdims=True), min_norm)
    return jnp.dot(
        target_c.T, clip_c, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
    )


SIMILARITY_FNS = {
    "soft_wpmi": soft_wpmi,
    "wpmi": wpmi,
    "rank_reorder": rank_reorder,
    "cos_similarity": cos_similarity,
    "cos_similarity_cubed": cos_similarity_cubed,
}

# Entry points for scoring MANY layers' concatenated units in ONE program. Only the
# wpmi family couples units through log p(d)'s per-layer logsumexp and needs explicit
# segmentation; the other three are per-unit independent (column-wise normalize /
# center / rank), so the plain fn on the [N, U_total] concatenation matches the
# per-layer results — exactly for cos/cos³; for rank_reorder up to each unit's random
# baseline scalar (the per-unit PRNG stream depends on the unit's global position, so
# raw CSV values differ from per-layer scoring while rankings are invariant — what
# test_concat_scoring_per_unit_independent asserts).
SEGMENTED_FNS = {
    "soft_wpmi": soft_wpmi_segmented,
    "wpmi": wpmi_segmented,
}


def get_similarity_fn(name: str):
    """Registry lookup replacing the reference's `eval("similarity.{}".format(name))`
    dispatch (`describe_broad_neurons.py:67`)."""
    if name not in SIMILARITY_FNS:
        raise KeyError(f"unknown similarity fn {name!r}; available: {sorted(SIMILARITY_FNS)}")
    return SIMILARITY_FNS[name]

"""Worker for tests/test_multihost_real.py: one REAL jax.distributed process.

Run as: python tests/_real_multihost_worker.py <pid> <nproc> <port> <out_npz> <ckpt_dir>

Initializes a genuine multi-process JAX job (gloo collectives on CPU — no
monkeypatching) and runs, in ONE process pair (spawning a second pair would pay
the ~2 min import+trace cycle twice):
  * the engine's u8 multi-host harvest AND the f32 fallback branch;
  * classifier training with per-host batch slices + the prediction gather;
  * contrastive pretrain steps + a COLLECTIVE orbax checkpoint save/restore
    (both processes call it; orbax elects the writer and barriers).
Process 0 writes every result to <out_npz>.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port, out, ckpt_dir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                                   sys.argv[4], sys.argv[5])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

from tests._cpu_cache import enable as _enable_cache  # noqa: E402

_enable_cache(jax)

import numpy as np  # noqa: E402

from mammodissect.data.probes import ArrayProbe  # noqa: E402
from mammodissect.dissect.engine import harvest_probe  # noqa: E402
from mammodissect.dissect.targets import get_target_model  # noqa: E402

LAYERS = ["blocks.0", "blocks.2"]

rng = np.random.default_rng(0)
u8_imgs = rng.integers(0, 256, size=(11, 64, 64, 1)).astype(np.uint8)

# u8 path: global-batch SPMD program over the process-spanning mesh
probe = ArrayProbe(images=u8_imgs, mean=0.3089279, std=0.25053)
target = get_target_model("tiny_cnn")
acc_u8, n_u8 = harvest_probe(target, probe, LAYERS, "avg", batch_size=4)

# f32 fallback: per-host local harvest + tiled allgather-and-trim. A fresh
# target — the u8 run attached the global mesh, and re-using it must trigger
# the engine's local-mesh replacement (covered by the warning path).
probe_f32 = ArrayProbe(images=np.stack([probe.image(i) for i in range(11)]).astype(np.float32))
target2 = get_target_model("tiny_cnn")
acc_f32, n_f32 = harvest_probe(target2, probe_f32, LAYERS, "avg", batch_size=4)

assert n_u8 == n_f32 == 11, (n_u8, n_f32)

# training: global batch assembled from per-host local slices, grads allreduced by
# GSPMD — two steps so the second loss also checks the first update's gradients
import jax.numpy as jnp  # noqa: E402

from mammodissect.models.classifier import BreastClipClassifierModule  # noqa: E402
from mammodissect.parallel.mesh import make_mesh  # noqa: E402
from mammodissect.parallel.multihost import gather_predictions  # noqa: E402
from mammodissect.train.trainer import Trainer, make_optimizer  # noqa: E402

module = BreastClipClassifierModule(variant="efficientnet-test", n_class=1)
variables = jax.jit(module.init)(
    jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 1), jnp.float32))
variables = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
tx = make_optimizer(lr=1e-2, weight_decay=1e-4, warmup_steps=1, total_steps=10)
trainer = Trainer(module, variables, tx, loss_kind="bce", pos_weight=2.0,
                  mesh=make_mesh(model_parallel=1))
t_rng = np.random.default_rng(7)
t_images = np.asarray(t_rng.normal(size=(8, 32, 32, 1)), np.float32)
t_labels = np.asarray(t_rng.integers(0, 2, size=(8,)), np.float32)
lo, hi = pid * 4, (pid + 1) * 4
# 3 steps: warmup zeroes step 1's lr; the third loss proves step 2's
# allreduced gradient update was applied identically on every host
losses = [trainer.train_batch(t_images[lo:hi], t_labels[lo:hi]) for _ in range(3)]
_, preds_local = trainer.eval_batch(t_images[lo:hi], t_labels[lo:hi])
preds = gather_predictions(preds_local, 8)

# ---- contrastive pretrain: global batch from per-host slices, then a collective
# orbax save (a rank-0 gate would deadlock — orbax barriers all hosts) + restore ----
from mammodissect.models.breastclip import BreastClipModule  # noqa: E402
from mammodissect.parallel.multihost import global_batch_from_local  # noqa: E402
from mammodissect.parallel.sharding import replicate_tree  # noqa: E402
from mammodissect.train.checkpoints import load_checkpoint, save_checkpoint  # noqa: E402
from mammodissect.train.clip_trainer import jit_clip_train_step  # noqa: E402
from mammodissect.train.trainer import TrainerState  # noqa: E402

pre_module = BreastClipModule(image_variant="efficientnet-test", in_channels=1,
                              bert_layers=1, bert_hidden=32, bert_heads=2,
                              bert_intermediate=64, proj_dim=16, vocab_size=128)
p_rng = np.random.default_rng(3)
pre_batch = {
    "images": np.asarray(p_rng.normal(size=(8, 32, 32, 1)), np.float32),
    "input_ids": np.asarray(p_rng.integers(1, 128, size=(8, 12)), np.int32),
    "attention_mask": np.ones((8, 12), np.int32),
}
pre_vars = jax.jit(pre_module.init)(
    jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in pre_batch.items()})
pre_tx = make_optimizer(lr=1e-2, weight_decay=1e-4, warmup_steps=1, total_steps=10)
pre_mesh = make_mesh(model_parallel=1)  # global: spans both processes

with pre_mesh:
    step_fn = jit_clip_train_step(pre_module, pre_tx, pre_mesh,
                                  tensor_parallel=False, variables=pre_vars)
    pre_params = replicate_tree(pre_mesh, pre_vars["params"])
    pre_stats = replicate_tree(pre_mesh, pre_vars["batch_stats"])
    pre_opt = pre_tx.init(pre_params)
    # 3 steps: warmup makes step 1's lr zero, so only the THIRD loss proves the
    # allreduced gradients of step 2 actually moved the replicated params
    pre_losses = []
    for i in range(3):
        local = {k: v[lo:hi] for k, v in pre_batch.items()}
        device_batch = global_batch_from_local(pre_mesh, local)
        pre_params, pre_stats, pre_opt, loss = step_fn(
            pre_params, pre_stats, pre_opt, device_batch, jax.random.PRNGKey(1 + i))
        pre_losses.append(float(loss))

path = os.path.join(ckpt_dir, "step_3")
save_checkpoint(path, TrainerState(pre_params, pre_stats, pre_opt, 3), 0, {})
restored = load_checkpoint(path)
assert int(np.asarray(restored["step"])) == 3, restored["step"]
# the restored params must equal the live final params
live = jax.tree_util.tree_leaves(jax.device_get(jax.tree_util.tree_map(
    lambda x: np.asarray(x.addressable_shards[0].data), pre_params)))
back = jax.tree_util.tree_leaves(restored["params"])
assert len(live) == len(back)
for a, b in zip(live, back):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)

# ---- resident dissection composed with multi-host (round-4): each host harvests
# its contiguous probe shard on LOCAL devices, then the accumulators allgather back
# into probe order (engine._gather_resident_multihost) ----
import warnings  # noqa: E402

from mammodissect.data.probes import HostShardedProbe  # noqa: E402
from mammodissect.dissect.dissectors import get_dissector  # noqa: E402
from mammodissect.dissect.engine import (  # noqa: E402
    _gather_resident_multihost,
    fused_harvest_embed_resident,
)

small = {"image_shape": (32, 32, 1), "bert_layers": 1,
         "model_config": {
             "name": "clip_custom", "temperature": 0.07,
             "image_encoder": {"model_type": "cnn", "variant": "efficientnet-test",
                               "in_channels": 1},
             "text_encoder": {"pooling": "eos"},
             "projection_head": {"name": "linear", "proj_dim": 16}}}
with warnings.catch_warnings():
    warnings.simplefilter("ignore")  # toy-tokenizer warning expected
    d_res = get_dissector("breastclip", **small)
res_probe = ArrayProbe(
    images=np.stack([probe.image_u8(i) for i in range(11)])[:, :32, :32],
    mean=0.3089279, std=0.25053)
shard = HostShardedProbe(res_probe)
RES_LAYERS = ["blocks.0", "blocks.1"]
ra, re_, _rn, _rw, rn_local = fused_harvest_embed_resident(
    d_res, shard, RES_LAYERS, "avg", batch_size=4)
g_act, g_emb, g_n, g_idx = _gather_resident_multihost(ra, re_, rn_local, shard)
assert g_n == 11, g_n

if pid == 0:
    np.savez(out, **{f"u8_{l}": acc_u8[l] for l in LAYERS},
             **{f"f32_{l}": acc_f32[l] for l in LAYERS},
             train_losses=np.asarray(losses), eval_preds=np.asarray(preds),
             pretrain_losses=np.asarray(pre_losses),
             resident_act=g_act[0], resident_emb=g_emb[0],
             resident_idx=np.asarray(g_idx))
print(f"[worker {pid}] done", flush=True)

"""Worker for the REAL 2-process pretrain test: contrastive train steps with the
global batch assembled from per-host slices, then a COLLECTIVE orbax checkpoint
save (both processes call it; orbax elects the writer and barriers) + restore.

Run as: python tests/_real_multihost_pretrain_worker.py <pid> <nproc> <port> <out_npz> <ckpt_dir>
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
import jax.numpy as jnp  # noqa: E402

from mammodissect.models.breastclip import BreastClipModule  # noqa: E402
from mammodissect.parallel.mesh import make_mesh  # noqa: E402
from mammodissect.parallel.multihost import global_batch_from_local  # noqa: E402
from mammodissect.parallel.sharding import replicate_tree  # noqa: E402
from mammodissect.train.checkpoints import load_checkpoint, save_checkpoint  # noqa: E402
from mammodissect.train.clip_trainer import jit_clip_train_step  # noqa: E402
from mammodissect.train.trainer import TrainerState, make_optimizer  # noqa: E402

module = BreastClipModule(image_variant="efficientnet-test", in_channels=1,
                          bert_layers=1, bert_hidden=32, bert_heads=2,
                          bert_intermediate=64, proj_dim=16, vocab_size=128)
rng = np.random.default_rng(3)
batch = {
    "images": np.asarray(rng.normal(size=(8, 32, 32, 1)), np.float32),
    "input_ids": np.asarray(rng.integers(1, 128, size=(8, 12)), np.int32),
    "attention_mask": np.ones((8, 12), np.int32),
}
variables = jax.jit(module.init)(
    jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()})
tx = make_optimizer(lr=1e-2, weight_decay=1e-4, warmup_steps=1, total_steps=10)
mesh = make_mesh(model_parallel=1)  # global: spans both processes

with mesh:
    step_fn = jit_clip_train_step(module, tx, mesh, tensor_parallel=False,
                                  variables=variables)
    params = replicate_tree(mesh, variables["params"])
    stats = replicate_tree(mesh, variables["batch_stats"])
    opt_state = tx.init(params)
    lo, hi = pid * 4, (pid + 1) * 4
    # 3 steps: warmup makes step 1's lr zero, so only the THIRD loss proves the
    # allreduced gradients of step 2 actually moved the replicated params
    losses = []
    for i in range(3):
        local = {k: v[lo:hi] for k, v in batch.items()}
        device_batch = global_batch_from_local(mesh, local)
        params, stats, opt_state, loss = step_fn(
            params, stats, opt_state, device_batch, jax.random.PRNGKey(1 + i))
        losses.append(float(loss))

# collective orbax save: EVERY process calls it (a rank-0 gate would deadlock)
path = os.path.join(ckpt_dir, "step_3")
save_checkpoint(path, TrainerState(params, stats, opt_state, 3), 0, {})
restored = load_checkpoint(path)
assert int(np.asarray(restored["step"])) == 3, restored["step"]
# the restored params must equal the live final params
live = jax.tree_util.tree_leaves(jax.device_get(
    jax.tree_util.tree_map(lambda x: np.asarray(x.addressable_shards[0].data), params)))
back = jax.tree_util.tree_leaves(restored["params"])
assert len(live) == len(back)
for a, b in zip(live, back):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)

if pid == 0:
    np.savez(out, losses=np.asarray(losses))
print(f"[pretrain worker {pid}] done losses={losses}", flush=True)

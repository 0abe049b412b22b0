"""Worker for tests/test_multihost_real.py: one REAL jax.distributed process.

Run as: python tests/_real_multihost_worker.py <pid> <nproc> <port> <out_npz>

Initializes a genuine multi-process JAX job (gloo collectives on CPU — no
monkeypatching), runs the engine's u8 multi-host harvest AND the f32 fallback
branch over a deterministic probe, and (on process 0) writes both results.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
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

if pid == 0:
    np.savez(out, **{f"u8_{l}": acc_u8[l] for l in LAYERS},
             **{f"f32_{l}": acc_f32[l] for l in LAYERS},
             train_losses=np.asarray(losses), eval_preds=np.asarray(preds))
print(f"[worker {pid}] done", flush=True)

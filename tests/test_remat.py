"""Rematerialization: gradients identical with/without remat (only memory differs)."""
import jax
import jax.numpy as jnp
import numpy as np

from mammodissect.models.efficientnet import EfficientNet


def test_remat_grads_match():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))

    def loss_for(remat):
        model = EfficientNet(variant="efficientnet-test", in_channels=1, remat=remat)
        variables = model.init(jax.random.PRNGKey(1), x)

        def loss_fn(params):
            (feats, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(feats**2)

        # jit the grad: eager per-op CPU execution of a 16-block backward is ~2 min;
        # the jitted program is also served by the persistent test cache
        return jax.jit(jax.grad(loss_fn))(variables["params"])

    g_plain = loss_for(False)
    g_remat = loss_for(True)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

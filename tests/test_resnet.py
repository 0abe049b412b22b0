"""ResNet family tests: geometry, capture points, converter layout, target registry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammodissect.models.resnet import (
    RESNET_SPECS,
    ResNet,
    ResNetTarget,
    resnet_torch_to_flax,
)


def test_resnet18_forward_and_capture():
    model = ResNet(variant="resnet18", num_classes=10)
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, cap = model.apply(
        variables, x, capture=("conv1", "layer1", "layer4"), pool_mode="avg")
    assert logits.shape == (2, 10)
    assert cap["conv1"].shape == (2, 64)
    assert cap["layer1"].shape == (2, 64)
    assert cap["layer4"].shape == (2, 512)


def test_resnet50_bottleneck_dims():
    model = ResNet(variant="resnet50", num_classes=5)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, cap = model.apply(variables, x, capture=("layer4",))
    assert cap["layer4"].shape == (1, 2048)  # bottleneck expansion 4


def test_torch_conversion_layout():
    """Synthesized torchvision-layout resnet18 state dict maps fully."""
    sd = {}
    def add_conv(name, o, i, k):
        sd[name + ".weight"] = np.zeros((o, i, k, k), np.float32)
    def add_bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{suf}"] = np.zeros(c, np.float32)
    add_conv("conv1", 64, 3, 7); add_bn("bn1", 64)
    f = 64
    for si, n_blocks in enumerate(RESNET_SPECS["resnet18"][1]):
        for bi in range(n_blocks):
            pfx = f"layer{si+1}.{bi}"
            in_f = f if bi > 0 or si == 0 else f // 2
            add_conv(pfx + ".conv1", f, in_f, 3); add_bn(pfx + ".bn1", f)
            add_conv(pfx + ".conv2", f, f, 3); add_bn(pfx + ".bn2", f)
            if si > 0 and bi == 0:
                add_conv(pfx + ".downsample.0", f, f // 2, 1)
                add_bn(pfx + ".downsample.1", f)
        f *= 2
    sd["fc.weight"] = np.zeros((1000, 512), np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    params, stats = resnet_torch_to_flax(sd, "resnet18")
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert params["layer2_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 128)
    assert stats["layer4_1"]["bn2"]["mean"].shape == (512,)
    assert params["fc"]["kernel"].shape == (512, 1000)


def test_target_registry_and_engine_path(tmp_path):
    from mammodissect.dissect.targets import get_target_model

    target = get_target_model("resnet18", input_size=64)
    imgs = np.random.default_rng(0).normal(size=(3, 64, 64, 3)).astype(np.float32)
    out = target.harvest(imgs, ["conv1", "layer2"], "max")
    assert set(out) == {"conv1", "layer2"}
    assert out["layer2"].shape == (3, 128)


def test_maxpool_matches_torch_semantics():
    """stem maxpool(3x3, s2, pad 1) equals torch's -inf-padded pooling."""
    import torch

    x = np.random.default_rng(1).normal(size=(1, 8, 8, 4)).astype(np.float32)
    t = torch.nn.functional.max_pool2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), 3, stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    import flax.linen as fnn

    xp = jnp.pad(jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    got = np.asarray(fnn.max_pool(xp, (3, 3), strides=(2, 2)))
    np.testing.assert_allclose(got, t, atol=1e-6)

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


def test_conv1_capture_is_pre_bn_torch_oracle():
    """The reference hooks the `conv1` MODULE (`concept_vit/utils.py:80`), whose
    output is pre-BatchNorm pre-ReLU. Pin our 'conv1' capture to torch's conv2d
    on the same (random) weights: if capture moved post-bn1/relu this fails
    (non-trivial bn stats + relu change the pooled values)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    sd = {}

    def add_conv(name, o, i, k):
        sd[name + ".weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.1

    def add_bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=c).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

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
    sd["fc.weight"] = rng.normal(size=(10, 512)).astype(np.float32) * 0.1
    sd["fc.bias"] = np.zeros(10, np.float32)

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = F.conv2d(torch.tensor(x), torch.tensor(sd["conv1.weight"]),
                        stride=2, padding=3).numpy().mean(axis=(2, 3))

    params, stats = resnet_torch_to_flax(sd, "resnet18")
    model = ResNet(variant="resnet18", num_classes=10)
    variables = {"params": params, "batch_stats": stats}
    _, cap = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         capture=("conv1",), pool_mode="avg")
    np.testing.assert_allclose(np.asarray(cap["conv1"]), want, atol=2e-4)


def test_engine_kwargs_num_class_alias_and_loud_drop():
    """The engine forwards num_class/finetuned_ckpt to every target factory
    (engine.py). Regression: the resnet whitelist spelled 'num_classes' so the
    engine's 'num_class' was silently dropped (1000-class head), and a user's
    finetuned_ckpt vanished without a sound."""
    from mammodissect.dissect.targets import get_target_model

    t = get_target_model("resnet18", input_size=64, num_class=7)
    assert t.model.num_classes == 7

    with pytest.warns(UserWarning, match="ignores.*finetuned_ckpt"):
        get_target_model("resnet18", input_size=64, finetuned_ckpt="/tmp/x.pth")

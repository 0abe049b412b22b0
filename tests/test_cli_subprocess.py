"""True CLI-surface test: invoke the dissect driver as a subprocess (the exact way
users and shell wrappers call it)."""
import json
import os
import subprocess
import sys

import pandas as pd
import pytest


def test_dissect_cli_subprocess(tmp_path):
    """One subprocess, two CLI invocations: a fresh cos_similarity run, then a wpmi
    run that shares the activation cache (exercises the reference's skip-if-exists
    semantics across driver invocations). Sharing the process halves the dominant
    cost — fresh-interpreter import + XLA compile — without losing the true
    argv-level CLI surface (both calls go through main(argv))."""
    concepts = tmp_path / "c.txt"
    concepts.write_text("alpha\nbeta\ngamma\ndelta\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               MAMMODISSECT_FORCE_CPU="1")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from mammodissect.cli.dissect import main;"
        "i = sys.argv.index('--similarity_fn');"
        "rc = main(sys.argv[1:i] + ['--similarity_fn', 'cos_similarity',"
        "                           '--result_dir', sys.argv[i+2] + '/r1']);"
        "rc |= main(sys.argv[1:i] + ['--similarity_fn', 'wpmi',"
        "                            '--result_dir', sys.argv[i+2] + '/r2']);"
        "sys.exit(rc)"
    )
    args = [
        sys.executable, "-c", code,
        "--target_model", "tiny_cnn", "--d_probe", "synthetic",
        "--target_layers", "_blocks[1]",
        "--concept_set", str(concepts), "--clip_model", "random",
        "--activation_dir", str(tmp_path / "a"),
        "--probe_kwargs", json.dumps({"n": 8, "h": 64, "w": 64, "c": 1}),
        "--similarity_fn", "placeholder", str(tmp_path),
    ]
    out = subprocess.run(args, capture_output=True, text=True, timeout=280, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("Dissection done!") == 2
    for sub in ("r1", "r2"):
        csvs = list((tmp_path / sub).rglob("*.csv"))
        assert len(csvs) == 1
        df = pd.read_csv(csvs[0])
        assert list(df.columns) == ["layer", "unit", "description", "similarity", "images"]


def test_modified_resnet_converter_layout():
    import numpy as np

    from mammodissect.models.modified_resnet import modified_resnet_torch_to_flax

    sd = {}
    def add_conv(name, o, i, k):
        sd[f"visual.{name}.weight"] = np.zeros((o, i, k, k), np.float32)
    def add_bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"visual.{name}.{suf}"] = np.zeros(c, np.float32)
    add_conv("conv1", 32, 3, 3); add_bn("bn1", 32)
    add_conv("conv2", 32, 32, 3); add_bn("bn2", 32)
    add_conv("conv3", 64, 32, 3); add_bn("bn3", 64)
    add_conv("layer1.0.conv1", 64, 64, 1); add_bn("layer1.0.bn1", 64)
    add_conv("layer1.0.conv2", 64, 64, 3); add_bn("layer1.0.bn2", 64)
    add_conv("layer1.0.conv3", 256, 64, 1); add_bn("layer1.0.bn3", 256)
    add_conv("layer1.0.downsample.0", 256, 64, 1); add_bn("layer1.0.downsample.1", 256)
    sd["visual.attnpool.positional_embedding"] = np.zeros((50, 256), np.float32)
    for side in ("q_proj", "k_proj", "v_proj", "c_proj"):
        sd[f"visual.attnpool.{side}.weight"] = np.zeros((256, 256), np.float32)
        sd[f"visual.attnpool.{side}.bias"] = np.zeros(256, np.float32)
    p, s = modified_resnet_torch_to_flax(sd)
    assert p["conv1"]["kernel"].shape == (3, 3, 3, 32)
    assert p["layer1_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 256)
    assert p["attnpool"]["q_proj"]["kernel"].shape == (256, 256)
    assert s["layer1_0"]["bn3"]["mean"].shape == (256,)

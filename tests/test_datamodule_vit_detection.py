"""DataModule, ViT encoder/target, retrieval eval, detection data tests."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def img_csv(tmp_path_factory):
    root = tmp_path_factory.mktemp("dm")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        Image.fromarray((rng.random((40, 30)) * 255).astype("uint8")).save(
            root / f"i{i}.png")
        rows.append({"image_path": f"i{i}.png", "cancer": i % 2,
                     "split": "training" if i < 8 else "test",
                     "label_text": f"an image number {i}"})
    df = pd.DataFrame(rows)
    csv = root / "m.csv"
    df.to_csv(csv, index=False)
    return str(csv), str(root), df


class TestDataModule:
    def test_split_and_loaders(self, img_csv):
        from mammodissect.data.datamodule import DataModule

        csv, root, _ = img_csv
        dm = DataModule(
            {"vindr": {"data_type": "image_classification", "csv_file": csv,
                       "root": root, "label_col": "cancer", "size_hw": (40, 30)}},
            {"batch_size": 4},
        )
        train_batches = list(dm.train_dataloader())
        assert len(train_batches) == 2  # 8 training rows / bs 4
        valid = dm.valid_dataloader()
        assert "vindr" in valid
        vb = list(valid["vindr"])
        assert sum(b.n_valid for b in vb) == 4

    def test_train_split_augments_and_reshuffles(self, img_csv):
        """The train split gets train=True (augmentation, the reference's per-split
        transforms) while valid stays deterministic, and passing `epoch` yields a
        fresh shuffle (DistributedSampler.set_epoch parity) instead of replaying
        the seed-0 permutation every epoch."""
        from mammodissect.data.datamodule import DataModule

        csv, root, _ = img_csv
        dm = DataModule(
            {"vindr": {"data_type": "image_classification", "csv_file": csv,
                       "root": root, "label_col": "cancer", "size_hw": (40, 30)}},
            {"batch_size": 4},
        )
        assert dm.datasets["vindr"]["train"].train is True
        assert dm.datasets["vindr"]["valid"].train is False

        def label_order(epoch):
            out = []
            for b in dm.train_dataloader(epoch=epoch):
                out.extend(np.asarray(b.labels)[: b.n_valid].tolist())
            return out

        e0, e0_again, e1 = label_order(0), label_order(0), label_order(1)
        assert e0 == e0_again                   # same epoch -> same permutation
        assert sorted(e0) == sorted(e1)         # same multiset of rows
        assert e0 != e1                         # fresh shuffle per epoch


class TestViT:
    def test_forward_capture_and_interp_pos(self):
        from mammodissect.models.vit_encoder import ViTImageEncoder

        m = ViTImageEncoder(image_size=32, patch_size=8, width=32, layers=2, heads=2)
        # non-native input size exercises pos-embedding interpolation
        x = jnp.ones((2, 48, 32, 3), jnp.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        hidden, cap = m.apply(v, x, capture=(0, 1))
        assert hidden.shape == (2, 1 + 6 * 4, 32)
        assert cap["layers.1"].shape == (2, 32)

    def test_target_registry(self):
        from mammodissect.dissect.targets import get_target_model

        t = get_target_model("dino", input_size=32)
        # default geometry is ViT-B; use tiny input for speed of one forward
        imgs = np.zeros((1, 32, 32, 3), np.float32)
        out = t.harvest(imgs, ["vision_model.encoder.layers[0]"])
        assert out["layers.0"].shape == (1, 768)

    def test_hf_conversion_layout(self):
        from mammodissect.models.vit_encoder import vit_torch_to_flax

        d, layers = 16, 1
        sd = {}
        sd["vit.embeddings.patch_embeddings.projection.weight"] = np.zeros((d, 3, 4, 4), np.float32)
        sd["vit.embeddings.patch_embeddings.projection.bias"] = np.zeros(d, np.float32)
        sd["vit.embeddings.cls_token"] = np.zeros((1, 1, d), np.float32)
        sd["vit.embeddings.position_embeddings"] = np.zeros((1, 5, d), np.float32)
        for n in ("query", "key", "value"):
            sd[f"vit.encoder.layer.0.attention.attention.{n}.weight"] = np.zeros((d, d), np.float32)
            sd[f"vit.encoder.layer.0.attention.attention.{n}.bias"] = np.zeros(d, np.float32)
        sd["vit.encoder.layer.0.attention.output.dense.weight"] = np.zeros((d, d), np.float32)
        sd["vit.encoder.layer.0.attention.output.dense.bias"] = np.zeros(d, np.float32)
        sd["vit.encoder.layer.0.intermediate.dense.weight"] = np.zeros((4 * d, d), np.float32)
        sd["vit.encoder.layer.0.intermediate.dense.bias"] = np.zeros(4 * d, np.float32)
        sd["vit.encoder.layer.0.output.dense.weight"] = np.zeros((d, 4 * d), np.float32)
        sd["vit.encoder.layer.0.output.dense.bias"] = np.zeros(d, np.float32)
        for ln in ("layernorm_before", "layernorm_after"):
            sd[f"vit.encoder.layer.0.{ln}.weight"] = np.ones(d, np.float32)
            sd[f"vit.encoder.layer.0.{ln}.bias"] = np.zeros(d, np.float32)
        sd["vit.layernorm.weight"] = np.ones(d, np.float32)
        sd["vit.layernorm.bias"] = np.zeros(d, np.float32)
        p = vit_torch_to_flax(sd)
        assert p["patch_embed"]["kernel"].shape == (4, 4, 3, d)
        assert p["layers_0"]["mlp_in"]["kernel"].shape == (d, 4 * d)
        assert "ln_final" in p


class TestRetrieval:
    def test_perfect_and_shuffled(self):
        from mammodissect.zs.retrieval import retrieval_metrics

        rng = np.random.default_rng(0)
        e = rng.normal(size=(20, 8))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        m = retrieval_metrics(e, e)
        assert m["i2t_recall@1"] == 1.0 and m["t2i_median_rank"] == 1.0
        m2 = retrieval_metrics(e, np.roll(e, 5, axis=0))
        assert m2["i2t_recall@1"] < 0.2


class TestDetection:
    def test_dataset_collate_and_draw(self, img_csv):
        from mammodissect.train.detection_data import (
            DetectionDataset,
            collate_detection,
            draw_boxes,
        )

        csv, root, df = img_csv
        det_df = pd.DataFrame([
            {"image_path": "i0.png", "xmin": 2, "ymin": 3, "xmax": 20, "ymax": 25,
             "finding": "Mass"},
            {"image_path": "i0.png", "xmin": 5, "ymin": 5, "xmax": 10, "ymax": 10,
             "finding": "Calc"},
            {"image_path": "i1.png", "xmin": 1, "ymin": 1, "xmax": 15, "ymax": 18,
             "finding": "Mass"},
        ])
        ds = DetectionDataset(det_df, root=root, size_hw=(40, 30), max_boxes=4)
        assert len(ds) == 2
        item = ds[0]
        assert item["image"].shape == (40, 30, 1)
        assert item["n_boxes"] == 2
        assert (item["boxes"][2:] == -1).all()
        batch = collate_detection([ds[0], ds[1]])
        assert batch["images"].shape == (2, 40, 30, 1)
        assert batch["boxes"].shape == (2, 4, 5)
        drawn = draw_boxes(item["image"], item["boxes"], value=9.0)
        assert (drawn == 9.0).sum() > 0 and (item["image"] == 9.0).sum() == 0

    def test_concept_dataset_column_switch(self, img_csv):
        from mammodissect.train.detection_data import concept_dataset

        _, root, df = img_csv
        df = df.copy()
        df["Mass"] = 1
        ds = concept_dataset(df, "mass", root=root, size_hw=(40, 30))
        assert ds.label(0) == 1
        with pytest.raises(KeyError):
            concept_dataset(df, "calcification", root=root)


class TestConceptSpellings:
    # every `args.concept.lower()` spelling the reference's MammoDataset_concept
    # switch accepts (`Datasets/dataset_concepts.py:405-446`), with its CSV column
    REFERENCE_SPELLINGS = {
        "clip_v1": "CLIP_V1",
        "mark_v1": "MARK_V1",
        "mole_v1": "MOLE_V1",
        "scar_v1": "SCAR_V1",
        "architectural_distortion": "Architectural_Distortion",
        "asymmetry": "Asymmetry",
        "focal_asymmetry": "Focal_Asymmetry",
        "global_asymmetry": "Global_Asymmetry",
        "mass": "Mass",
        "nipple_retraction": "Nipple_Retraction",
        "skin_retraction": "Skin_Retraction",
        "skin_thickening": "Skin_Thickening",
        "suspicious_calcification": "Suspicious_Calcification",
        "suspicious_lymph_node": "Suspicious_Lymph_Node",
    }

    def test_every_reference_spelling_resolves(self, img_csv):
        from mammodissect.train.detection_data import CONCEPT_COLUMNS, concept_dataset

        _, root, df = img_csv
        df = df.copy()
        for concept, col in self.REFERENCE_SPELLINGS.items():
            assert CONCEPT_COLUMNS.get(concept) == col, concept
            ds = concept_dataset(df.assign(**{col: 1}), concept,
                                 root=root, size_hw=(40, 30))
            assert ds.label(0) == 1, concept

    def test_switch_matches_reference_source(self):
        # cross-check against the reference tree when present (CI has it): the
        # elif chain is the ground truth for the accepted spellings
        import os
        import re

        src = "/root/reference/Datasets/dataset_concepts.py"
        if not os.path.exists(src):
            pytest.skip("reference tree not present")
        with open(src) as f:
            text = f.read()
        found = set(re.findall(r"concept\.lower\(\) == '([a-z_0-9]+)'", text))
        assert found == set(self.REFERENCE_SPELLINGS)

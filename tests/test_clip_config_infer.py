"""clip_config_from_state_dict: geometry inference (build_model parity)."""
import numpy as np

from mammodissect.models.clip_vit import clip_config_from_state_dict


def test_infer_vit_b16_geometry():
    sd = {}
    width, patch, layers, emb, ctx, vocab, tw, tl = 768, 16, 12, 512, 77, 49408, 512, 12
    sd["visual.conv1.weight"] = np.zeros((width, 3, patch, patch), np.float32)
    sd["visual.positional_embedding"] = np.zeros((1 + 14 * 14, width), np.float32)
    sd["visual.proj"] = np.zeros((width, emb), np.float32)
    for i in range(layers):
        sd[f"visual.transformer.resblocks.{i}.ln_1.weight"] = np.ones(width, np.float32)
    for i in range(tl):
        sd[f"transformer.resblocks.{i}.ln_1.weight"] = np.ones(tw, np.float32)
    sd["ln_final.weight"] = np.ones(tw, np.float32)
    sd["token_embedding.weight"] = np.zeros((vocab, tw), np.float32)
    sd["positional_embedding"] = np.zeros((ctx, tw), np.float32)
    cfg = clip_config_from_state_dict(sd)
    assert cfg == {
        "vision_width": 768, "patch_size": 16, "vision_layers": 12, "vision_heads": 12,
        "image_size": 224, "embed_dim": 512, "text_width": 512, "text_layers": 12,
        "text_heads": 8, "vocab_size": 49408, "context_length": 77,
    }

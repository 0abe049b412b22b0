"""Layer addressing for activation capture.

The reference addresses hook points with arbitrary Python attribute paths evaluated by
`eval("target_model.{layer}.register_forward_hook(...)")` (`concept_vit/utils.py:80-81`),
e.g. `image_encoder._blocks[17]` (`run_clipdissect.sh:6-9`) or
`vision_model.encoder.layers[3]` (`run_og_clip.sh:8`). Here layers are static names
resolved *before* tracing — each named point is pooled inside the jitted forward.

`canonical_layer_name` accepts the reference spellings and returns the canonical
`<family>.<index>` form ("blocks.17", "layers.3"); plain names (resnet "layer4") pass
through unchanged."""
from __future__ import annotations

import re

_INDEXED = re.compile(r"^(?:[\w.]+\.)??_?(blocks|layers)[\[.](\d+)\]?$")


def canonical_layer_name(name: str) -> str:
    name = name.strip()
    m = _INDEXED.match(name)
    if m:
        return f"{m.group(1)}.{int(m.group(2))}"
    return name


def layer_index(canonical: str) -> int:
    """Index of an indexed canonical layer name ('blocks.17' -> 17)."""
    fam, _, idx = canonical.rpartition(".")
    if not fam or not idx.isdigit():
        raise ValueError(f"{canonical!r} is not an indexed layer name")
    return int(idx)

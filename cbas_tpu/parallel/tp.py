"""Tensor-parallel sharding rules for the ViT encoder.

Head-dim/intermediate-dim sharding over a "model" mesh axis, composed with
batch-dim data parallelism over "data" (2-D mesh). The reference has no
tensor parallelism (SURVEY.md §2.7); this is the TPU-native option for large
backbones (ViT-L+): attention q/k/v and MLP up-projections split their output
dim, out-projections split their input dim, so each block needs exactly one
psum (inserted automatically by GSPMD from these NamedSharding annotations).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Key suffixes whose *output* dim (dim 0 of the torch-layout (out, in) weight)
# is split across the model axis.
_SPLIT_OUT = (
    "attention.attention.query.weight",
    "attention.attention.key.weight",
    "attention.attention.value.weight",
    "attention.q_proj.weight",
    "attention.k_proj.weight",
    "attention.v_proj.weight",
    "mlp.fc1.weight",
    "mlp.up_proj.weight",
    "mlp.gate_proj.weight",
    "mlp.weights_in.weight",
)
_SPLIT_OUT_BIAS = tuple(k.replace(".weight", ".bias") for k in _SPLIT_OUT)

# Keys whose *input* dim (dim 1) is split (the contraction that needs a psum).
_SPLIT_IN = (
    "attention.output.dense.weight",
    "attention.o_proj.weight",
    "mlp.fc2.weight",
    "mlp.down_proj.weight",
    "mlp.weights_out.weight",
)


def vit_param_spec(key: str) -> P:
    if key.endswith(_SPLIT_OUT):
        return P("model", None)
    if key.endswith(_SPLIT_OUT_BIAS):
        return P("model")
    if key.endswith(_SPLIT_IN):
        return P(None, "model")
    return P()  # embeddings, norms, layerscales, biases of out-projections


def vit_param_shardings(
    params: Dict[str, jnp.ndarray], mesh: Mesh
) -> Dict[str, NamedSharding]:
    """Per-parameter NamedSharding pytree for jit(in_shardings=...)."""
    out = {}
    model_size = mesh.shape.get("model", 1)
    for k, v in params.items():
        spec = vit_param_spec(k) if "model" in mesh.axis_names else P()
        # Don't split dims that the mesh doesn't divide (e.g. tiny test models).
        dims = np.asarray(v).shape
        ok = True
        for axis_idx, axis_name in enumerate(spec):
            if axis_name == "model" and dims[axis_idx] % model_size != 0:
                ok = False
        out[k] = NamedSharding(mesh, spec if ok else P())
    return out

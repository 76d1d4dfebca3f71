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
    # NOT mlp.weights_in: SwiGLU packs [x1; x2] along its out dim, which an
    # out-dim shard would split across devices incorrectly (models/vit.py
    # _mlp keeps SwiGLU replicated).
)
_SPLIT_OUT_BIAS = tuple(k.replace(".weight", ".bias") for k in _SPLIT_OUT)

# Keys whose *input* dim (dim 1) is split (the contraction that needs a psum).
_SPLIT_IN = (
    "attention.output.dense.weight",
    "attention.o_proj.weight",
    "mlp.fc2.weight",
    "mlp.down_proj.weight",
)


def vit_param_spec(key: str) -> P:
    if key.endswith(_SPLIT_OUT):
        return P("model", None)
    if key.endswith(_SPLIT_OUT_BIAS):
        return P("model")
    if key.endswith(_SPLIT_IN):
        return P(None, "model")
    return P()  # embeddings, norms, layerscales, biases of out-projections


_ATTN_KEYS = (
    "attention.attention.query", "attention.attention.key",
    "attention.attention.value", "attention.output.dense",
    "attention.q_proj", "attention.k_proj", "attention.v_proj",
    "attention.o_proj",
)


def vit_param_pspecs(
    params: Dict[str, jnp.ndarray], mesh: Mesh, head_dim: int
) -> Dict[str, P]:
    """Per-parameter PartitionSpec pytree (shard_map in_specs / sharding
    construction), with a replicate fallback for dims the mesh doesn't
    divide (e.g. tiny test models).

    ``head_dim`` is required (cfg.head_dim): attention projections only split
    if every shard gets a whole number of heads — a defaulted/zero value would
    silently accept mid-head shards, which scramble the per-head attention
    math (the reshape inside _attention fails at trace time at best)."""
    if head_dim <= 0:
        raise ValueError("head_dim must be the model's positive head size")
    out = {}
    model_size = mesh.shape.get("model", 1)
    for k, v in params.items():
        spec = vit_param_spec(k) if "model" in mesh.axis_names else P()
        dims = v.shape  # jnp/np arrays both carry .shape; no host copy
        ok = True
        for axis_idx, axis_name in enumerate(spec):
            if axis_name != "model":
                continue
            unit = model_size
            if any(a in k for a in _ATTN_KEYS):
                unit = model_size * head_dim
            if dims[axis_idx] % unit != 0:
                ok = False
        out[k] = spec if ok else P()
    return out


def vit_param_shardings(
    params: Dict[str, jnp.ndarray], mesh: Mesh, head_dim: int
) -> Dict[str, NamedSharding]:
    """Per-parameter NamedSharding pytree for jit(in_shardings=...) or
    device_put placement."""
    return {
        k: NamedSharding(mesh, spec)
        for k, spec in vit_param_pspecs(params, mesh, head_dim).items()
    }

"""cls_only forward: the final-block CLS specialization must match the full
forward's row 0 (reference consumes only the CLS embedding for every encode —
backend/dino_encoder.py pools last_hidden_state[:, 0]; specializing the last
block to that row saves ~7% of ViT-B FLOPs at 480p with identical math)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbas_tpu.models.vit import (
    PRESETS,
    init_vit_params,
    resample_pos_embed,
    rope_tables,
    vit_forward_from_tokens,
)


def _toy(preset):
    cfg = dataclasses.replace(
        PRESETS[preset], num_layers=3, hidden_size=128, num_heads=2,
        intermediate_size=256,
    )
    params = init_vit_params(jax.random.key(0), cfg)
    tokens = jax.random.normal(jax.random.key(1), (2, 25, cfg.hidden_size), jnp.float32)
    rope = pos = None
    if cfg.variant == "dinov3":
        cos, sin = rope_tables(cfg, 5, 5)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
    else:
        pos = jnp.asarray(resample_pos_embed(
            np.asarray(params["embeddings.position_embeddings"], np.float32), 5, 5
        ))
    return cfg, params, tokens, pos, rope


@pytest.mark.parametrize("preset", ["dinov3-vits16", "dinov2-with-registers-small"])
def test_cls_only_matches_full_forward_row0(preset):
    cfg, params, tokens, pos, rope = _toy(preset)
    full = vit_forward_from_tokens(params, tokens, cfg, pos, rope)
    cls = vit_forward_from_tokens(params, tokens, cfg, pos, rope, cls_only=True)
    assert cls.shape == (2, 1, cfg.hidden_size)
    np.testing.assert_allclose(
        np.asarray(cls[:, 0]), np.asarray(full[:, 0]), rtol=2e-5, atol=2e-5
    )


def test_cls_block_masks_padded_keys(preset="dinov3-vits16"):
    """With model-level token padding (n_valid < N), padded keys must not
    leak into the specialized final block's CLS attention — garbage rows in
    the pad region must not change the output."""
    from cbas_tpu.models.vit import _block_cls

    cfg, params, tokens, pos, rope = _toy(preset)
    x = jax.random.normal(jax.random.key(2), (2, 30, cfg.hidden_size), jnp.float32)
    n_valid = x.shape[1]
    pad = jnp.pad(x, ((0, 0), (0, 6), (0, 0)))
    junk = pad.at[:, n_valid:].set(1e3)

    prefix = f"layer.{cfg.num_layers - 1}"
    want = _block_cls(params, prefix, x, cfg, rope, n_valid=n_valid)
    got = _block_cls(params, prefix, junk, cfg, rope, n_valid=n_valid)
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(want[:, 0]), rtol=2e-5, atol=2e-5
    )

"""ViT forward with the fused Pallas attention path (interpret mode) must
match the jnp path for both variants (incl. in-kernel RoPE)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbas_tpu.models.vit import (
    ViTConfig,
    init_vit_params,
    set_fused_attention,
    vit_forward,
)


@pytest.fixture(autouse=True)
def restore_flag():
    yield
    set_fused_attention(None)


@pytest.mark.parametrize("variant", ["dinov2", "dinov3"])
@pytest.mark.parametrize("head_dim", [32, 64])
def test_fused_vit_matches_unfused(variant, head_dim):
    # head_dim=64 with an even head count takes the head-PAIR packed kernel
    # (the production d=64 layout); head_dim=32 covers the unpacked kernel.
    cfg = ViTConfig(
        variant=variant, hidden_size=2 * head_dim, num_layers=2, num_heads=2,
        patch_size=16, num_register_tokens=4, intermediate_size=128,
        layer_norm_eps=1e-5 if variant == "dinov3" else 1e-6, image_size=32,
    )
    params = init_vit_params(jax.random.key(0), cfg)
    # dinov3 handles rectangular inputs (RoPE); dinov2 runs native geometry.
    w = 48 if variant == "dinov3" else 32
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, w))

    set_fused_attention(False)
    want = np.asarray(vit_forward(params, x, cfg))
    set_fused_attention(True)  # CPU backend -> interpret-mode Pallas
    got = np.asarray(vit_forward(params, x, cfg))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

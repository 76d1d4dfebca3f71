"""Pallas fused-attention parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbas_tpu.ops.flash_attention import fused_attention, reference_attention


@pytest.mark.parametrize(
    "B,H,N,d,block_q",
    [
        (2, 2, 128, 64, 128),   # aligned
        (1, 3, 261, 64, 128),   # ViT-ish: N not a multiple of the tile
        (2, 1, 37, 32, 256),    # tiny N < one block
    ],
)
def test_fused_attention_matches_reference(B, H, N, d, block_q):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    scale = d ** -0.5
    want = reference_attention(q, k, v, scale)
    got = fused_attention(q, k, v, scale, block_q=block_q, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_attention_bf16_io():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 130, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 130, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 130, 64)), jnp.bfloat16)
    got = fused_attention(q, k, v, 0.125, interpret=True)
    want = reference_attention(q, k, v, 0.125)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )

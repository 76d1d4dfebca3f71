"""Pallas fused-attention parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbas_tpu.ops.flash_attention import (
    fused_attention,
    fused_attention_packed,
    reference_attention,
)


def _pack_pairs(t):
    """(B, H, N, d) -> head-pair packed (B, H/2, N, 2d)."""
    B, H, N, d = t.shape
    return t.reshape(B, H // 2, 2, N, d).transpose(0, 1, 3, 2, 4).reshape(
        B, H // 2, N, 2 * d
    )


def _unpack_pairs(t):
    B, G, N, dd = t.shape
    return t.reshape(B, G, N, 2, dd // 2).transpose(0, 1, 3, 2, 4).reshape(
        B, 2 * G, N, dd // 2
    )


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


@pytest.mark.parametrize("pvt", [False, True])
@pytest.mark.parametrize(
    "B,H,N,d,block_q,n_valid",
    [
        (2, 4, 128, 64, 128, None),   # aligned, two pairs
        (1, 2, 261, 64, 128, None),   # N not a tile multiple (query blocks > 1)
        (2, 2, 200, 64, 256, 190),    # model-level padding masked as keys
    ],
)
def test_packed_attention_matches_reference(B, H, N, d, block_q, n_valid, pvt):
    """Head-pair packed kernel == reference on the unpacked layout, in both
    score orientations (pvt=True is the transposed-PV production path at
    large-N geometries)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    scale = d ** -0.5
    if n_valid is not None:
        # zero out padded tail like the model-level padding does
        mask = (jnp.arange(N) < n_valid)[None, None, :, None]
        q, k, v = q * mask, k * mask, v * mask
    got2 = fused_attention_packed(
        _pack_pairs(q), _pack_pairs(k), _pack_pairs(v), scale,
        block_q=block_q, interpret=True, n_valid=n_valid, pvt=pvt,
    )
    got = _unpack_pairs(got2)
    want = reference_attention(
        q[..., :n_valid, :] if n_valid else q,
        k[..., :n_valid, :] if n_valid else k,
        v[..., :n_valid, :] if n_valid else v,
        scale,
    )
    np.testing.assert_allclose(
        np.asarray(got)[..., : (n_valid or N), :],
        np.asarray(want),
        rtol=2e-5, atol=2e-5,
    )


def test_packed_attention_rope_matches_explicit():
    """In-kernel RoPE on the packed layout == explicit rope + reference."""
    B, H, N, d = 1, 2, 140, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    ang = jnp.asarray(rng.normal(size=(N, d // 2)).astype(np.float32))
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    scale = d ** -0.5

    def rot(t):
        return jnp.concatenate([-t[..., d // 2 :], t[..., : d // 2]], axis=-1)

    qr = q * cos[None, None] + rot(q) * sin[None, None]
    kr = k * cos[None, None] + rot(k) * sin[None, None]
    want = reference_attention(qr, kr, v, scale)
    for pvt in (False, True):
        got = _unpack_pairs(
            fused_attention_packed(
                _pack_pairs(q), _pack_pairs(k), _pack_pairs(v), scale,
                interpret=True, rope_cos=cos, rope_sin=sin, pvt=pvt,
            )
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


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


@pytest.mark.parametrize("N,n_valid", [(264, None), (272, 261), (1216, 1205)])
def test_exact_n_kv_blocks_match_reference(N, n_valid):
    """Sublane-granule-aligned N skips the 128-multiple rounding entirely
    (_key_pad): K/V blocks are array-exact and the query dim may tile at
    granule-aligned halvings. These are the production token counts
    (261->272 @256x256, 1205->1216 @480p, bf16 granule 16; 264 covers the
    fp32 granule-8 path interpret mode actually runs)."""
    B, H, d = 1, 2, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    scale = d ** -0.5
    nv = n_valid or N
    want = reference_attention(q[:, :, :nv], k[:, :, :nv], v[:, :, :nv], scale)
    got = fused_attention(q, k, v, scale, n_valid=n_valid, interpret=True)[:, :, :nv]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    got2 = _unpack_pairs(
        fused_attention_packed(
            _pack_pairs(q), _pack_pairs(k), _pack_pairs(v), scale,
            n_valid=n_valid, interpret=True,
        )
    )[:, :, :nv]
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_use_pvt_selection_rule(monkeypatch):
    """The measured transposed-PV dispatch rule (flash_attention._use_pvt):
    RoPE geometries always take pvt (interleaved A/B medians win at every
    token count, 0.784-0.949); no-RoPE geometries only past the VPU-bound
    regime (1.089 at n_pad=336, 0.876 at n_pad=1216 -> threshold 512).
    CBAS_ATTN_PVT overrides both ways for measurement."""
    from cbas_tpu.ops.flash_attention import _use_pvt

    monkeypatch.delenv("CBAS_ATTN_PVT", raising=False)
    assert _use_pvt(True, 80)      # rope: on even at the smallest geometry
    assert _use_pvt(True, 1216)
    assert not _use_pvt(False, 336)   # dinov2-base 256x256: std orientation
    assert _use_pvt(False, 1216)      # no-rope long-N: MXU-bound, pvt wins
    for falsy in ("0", "false", "no", "off", "OFF"):
        monkeypatch.setenv("CBAS_ATTN_PVT", falsy)
        assert not _use_pvt(True, 1216)
    monkeypatch.setenv("CBAS_ATTN_PVT", "1")
    assert _use_pvt(False, 80)


def _flatten_heads(t):
    """(B, H, N, d) -> flat row-major (B, N, H*d) (the r4 fat layout)."""
    B, H, N, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, N, H * d)


def _unflatten_heads(t, H):
    B, N, D = t.shape
    return t.reshape(B, N, H, D // H).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("pvt", [False, True])
@pytest.mark.parametrize(
    "B,H,N,n_valid",
    [
        (2, 2, 128, None),    # aligned, one pair, unrolled
        (3, 4, 272, 261),     # the 256x256 production geometry (gb=3 path)
        (1, 2, 1216, 1205),   # the 480p geometry: fori pair loop
    ],
)
def test_fat_attention_matches_reference(B, H, N, n_valid, pvt):
    """Flat row-major (B, N, H*64) kernel == reference on the (B,H,N,d)
    layout, both orientations, with model-level padding masked as keys."""
    from cbas_tpu.ops.flash_attention import fused_attention_fat

    d = 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    scale = d ** -0.5
    nv = n_valid or N
    want = reference_attention(q[:, :, :nv], k[:, :, :nv], v[:, :, :nv], scale)
    got_flat = fused_attention_fat(
        _flatten_heads(q), _flatten_heads(k), _flatten_heads(v), scale,
        n_valid=n_valid, pvt=pvt, interpret=True,
    )
    assert got_flat is not None
    got = _unflatten_heads(got_flat, H)[:, :, :nv]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fat_attention_rope_matches_explicit():
    """In-kernel RoPE on the fat layout == explicit rope + reference."""
    from cbas_tpu.ops.flash_attention import fused_attention_fat

    B, H, N, d = 1, 2, 144, 64
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
    ang = jnp.asarray(rng.normal(size=(N, d // 2)).astype(np.float32))
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    scale = d ** -0.5

    def rot(t):
        return jnp.concatenate([-t[..., d // 2:], t[..., : d // 2]], axis=-1)

    qr = q * cos[None, None] + rot(q) * sin[None, None]
    kr = k * cos[None, None] + rot(k) * sin[None, None]
    want = reference_attention(qr, kr, v, scale)
    for pvt in (False, True):
        got_flat = fused_attention_fat(
            _flatten_heads(q), _flatten_heads(k), _flatten_heads(v), scale,
            rope_cos=cos, rope_sin=sin, pvt=pvt, interpret=True,
        )
        got = _unflatten_heads(got_flat, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_fat_attention_rejects_unservable_geometry():
    """Non-128-multiple hidden dim -> None (caller falls back to packed)."""
    from cbas_tpu.ops.flash_attention import fused_attention_fat

    q = jnp.zeros((1, 16, 192), jnp.float32)  # 3 heads of 64: odd pair count
    assert fused_attention_fat(q, q, q, 0.125, interpret=True) is None

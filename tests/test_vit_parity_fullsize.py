"""Full-preset ViT parity vs HF transformers at production geometry.

VERDICT r1 Weak #5: toy 2-layer/64-dim parity left the "bit-matched (to
tolerance) vs PyTorch" north star (BASELINE.json:5) untested at production
scale. These tests run the real presets (12x768 ViT-B) at the real
geometries (256x256 recording resolution; 480p per BASELINE config 1),
random-init (offline), through BOTH the raw transformer forward and the
production FrameEncoder pipeline (green plane -> replicate channels ->
patchify), and gate the fp16-store round trip the HDF5 contract implies.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.torch_port import state_dict_to_params
from cbas_tpu.models.vit import PRESETS, ViTConfig, resample_pos_embed, vit_forward

# 12 accumulated blocks at 768-d: fp32 roundoff grows with depth; 1e-4 is the
# observed envelope with ~3x headroom. The fp16 gate below is the contract.
TOL_F32 = dict(rtol=1e-4, atol=1e-4)
# The HDF5 store is float16: embeddings are equal if they agree below fp16
# quantization (eps = 2^-10 ~ 1e-3 relative).
TOL_F16 = dict(rtol=2e-3, atol=2e-3)

pytestmark = pytest.mark.slow


def full_dinov3_vitb16():
    from transformers import DINOv3ViTConfig
    from transformers.models.dinov3_vit.modeling_dinov3_vit import DINOv3ViTModel

    p = PRESETS["dinov3-vitb16"]
    hf_cfg = DINOv3ViTConfig(
        hidden_size=p.hidden_size,
        num_hidden_layers=p.num_layers,
        num_attention_heads=p.num_heads,
        patch_size=p.patch_size,
        num_register_tokens=p.num_register_tokens,
        intermediate_size=p.intermediate_size,
        layer_norm_eps=p.layer_norm_eps,
        rope_theta=p.rope_theta,
        use_gated_mlp=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return DINOv3ViTModel(hf_cfg).eval(), ViTConfig.from_hf(hf_cfg)


def full_dinov2_base():
    from transformers import Dinov2WithRegistersConfig
    from transformers.models.dinov2_with_registers.modeling_dinov2_with_registers import (
        Dinov2WithRegistersModel,
    )

    p = PRESETS["dinov2-with-registers-base"]
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=p.hidden_size,
        num_hidden_layers=p.num_layers,
        num_attention_heads=p.num_heads,
        patch_size=p.patch_size,
        num_register_tokens=p.num_register_tokens,
        image_size=p.image_size,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    return Dinov2WithRegistersModel(hf_cfg).eval(), ViTConfig.from_hf(hf_cfg)


def port(model):
    return {
        k: jnp.asarray(v) for k, v in state_dict_to_params(model.state_dict()).items()
    }


@pytest.mark.parametrize("hw", [(256, 256), (480, 640)], ids=["256x256", "480p"])
def test_dinov3_vitb16_full_size(hw):
    model, cfg = full_dinov3_vitb16()
    h, w = hw
    torch.manual_seed(2)
    x = torch.randn(1, 3, h, w)
    with torch.no_grad():
        want = model(x).last_hidden_state.numpy()
    got = np.asarray(vit_forward(port(model), jnp.asarray(x.numpy()), cfg))
    assert got.shape == want.shape  # (1, 1+4+h*w/256, 768)
    np.testing.assert_allclose(got, want, **TOL_F32)
    # fp16 store round trip (the HDF5 "cls" contract)
    np.testing.assert_allclose(
        got[:, 0, :].astype(np.float16).astype(np.float32),
        want[:, 0, :],
        **TOL_F16,
    )


def test_dinov2_base_full_size_interpolated():
    """256x256 input vs the 518-native preset: full-scale antialiased-bicubic
    pos-embed interpolation (the production path for dinov2 projects)."""
    model, cfg = full_dinov2_base()
    h = w = 252  # largest patch-multiple <= the 256x256 recording resolution
    torch.manual_seed(3)
    x = torch.randn(1, 3, h, w)
    with torch.no_grad():
        want = model(x).last_hidden_state.numpy()
    pos = resample_pos_embed(
        model.state_dict()["embeddings.position_embeddings"].numpy(),
        h // cfg.patch_size,
        w // cfg.patch_size,
    )
    got = np.asarray(
        vit_forward(port(model), jnp.asarray(x.numpy()), cfg, pos_embed=jnp.asarray(pos))
    )
    np.testing.assert_allclose(got, want, **TOL_F32)


def test_frame_encoder_production_path_full_size():
    """The shipped encode program (uint8 green plane -> channel-folded patch
    kernel -> ViT -> fp16 CLS) vs the reference preprocessing recipe run
    through HF torch (green/255 replicated to 3 channels, backend/cbas.py:
    431,672-677) — full ViT-B/16 at the 256x256 recording resolution."""
    model, cfg = full_dinov3_vitb16()
    rng = np.random.default_rng(4)
    planes = rng.integers(0, 256, (2, 256, 256), np.uint8)

    enc = FrameEncoder(
        "parity-enc",
        params=state_dict_to_params(model.state_dict()),
        cfg=cfg,
        compute_dtype=jnp.float32,  # parity mode: exact GELU, fp32
        fast_gelu=False,
    )
    got = enc.encode_planes(planes)  # float16 CLS, the H5 payload
    assert got.dtype == np.float16 and got.shape == (2, 768)

    x = torch.from_numpy(planes.astype(np.float32) / 255.0)
    x = x.unsqueeze(1).repeat(1, 3, 1, 1)
    with torch.no_grad():
        want = model(x).last_hidden_state[:, 0, :].numpy()
    np.testing.assert_allclose(got.astype(np.float32), want, **TOL_F16)

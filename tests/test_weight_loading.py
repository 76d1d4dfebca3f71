"""Encoder weight-loading paths: safetensors files, directories, failures."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbas_tpu.models.encoder import (
    EncoderWeightsUnavailable,
    FrameEncoder,
    load_encoder_params,
)
from cbas_tpu.models.vit import ViTConfig, init_vit_params

SMALL_V2_P14 = ViTConfig(
    variant="dinov2", hidden_size=64, num_layers=2, num_heads=2, patch_size=14,
    num_register_tokens=4, intermediate_size=128, image_size=28,
)


def dump_params(cfg):
    return {
        k: np.asarray(v)
        for k, v in jax.device_get(init_vit_params(jax.random.key(0), cfg)).items()
    }


def test_load_from_safetensors_file(tmp_path):
    from safetensors.numpy import save_file

    params = dump_params(SMALL_V2_P14)
    path = str(tmp_path / "model.safetensors")
    save_file(params, path)
    loaded = load_encoder_params(path)
    assert set(loaded) == set(params)
    np.testing.assert_array_equal(loaded["embeddings.cls_token"], params["embeddings.cls_token"])


def test_load_from_directory(tmp_path):
    from safetensors.numpy import save_file

    params = dump_params(SMALL_V2_P14)
    save_file(params, str(tmp_path / "model.safetensors"))
    loaded = load_encoder_params(str(tmp_path))
    assert set(loaded) == set(params)


def test_missing_weights_raise():
    with pytest.raises(EncoderWeightsUnavailable):
        load_encoder_params("nonexistent/model-id-that-is-not-cached")


def test_frame_encoder_from_safetensors_checkpoint(tmp_path):
    """End to end: checkpoint file -> FrameEncoder -> embeddings at a
    non-native, patch-14 geometry (pos-embed resampling path)."""
    from safetensors.numpy import save_file

    params = dump_params(SMALL_V2_P14)
    ckpt = str(tmp_path / "model.safetensors")
    save_file(params, ckpt)
    enc = FrameEncoder(ckpt, cfg=SMALL_V2_P14, compute_dtype=jnp.float32)
    frames = np.random.default_rng(0).integers(0, 256, (3, 42, 42, 3), np.uint8)
    out = enc.encode_rgb(frames)  # 42/14 = 3x3 grid vs native 2x2 -> resample
    assert out.shape == (3, 64) and out.dtype == np.float16
    assert np.isfinite(out.astype(np.float32)).all()

"""cls_attention_map parity vs HF output_attentions."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cbas_tpu.models.torch_port import state_dict_to_params
from cbas_tpu.models.vit import ViTConfig, cls_attention_map


def test_matches_hf_last_layer_cls_attention():
    from transformers import DINOv3ViTConfig
    from transformers.models.dinov3_vit.modeling_dinov3_vit import DINOv3ViTModel

    hf_cfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2, patch_size=16,
        image_size=32, num_register_tokens=4, intermediate_size=256,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = DINOv3ViTModel(hf_cfg).eval()
    x = torch.randn(2, 3, 32, 48)
    with torch.no_grad():
        out = model(x, output_attentions=True)
    # HF: (B, H, N, N); CLS row over patch tokens, head-averaged.
    last = out.attentions[-1]
    want = last[:, :, 0, 1 + 4 :].mean(1).reshape(2, 2, 3).numpy()

    params = {k: jnp.asarray(v) for k, v in state_dict_to_params(model.state_dict()).items()}
    got = np.asarray(cls_attention_map(params, jnp.asarray(x.numpy()), ViTConfig.from_hf(hf_cfg)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)

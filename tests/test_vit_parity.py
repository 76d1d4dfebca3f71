"""ViT backbone parity vs HF transformers (randomly-initialized, offline).

Weights are ported from torch models instantiated from config (no downloads);
JAX forward must reproduce HF's last_hidden_state / CLS embedding to fp32
tolerance, including the register-token layout, LayerScale, position-embedding
interpolation (dinov2) and RoPE (dinov3).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cbas_tpu.models.torch_port import state_dict_to_params
from cbas_tpu.models.vit import (
    PRESETS,
    ViTConfig,
    cls_embeddings,
    config_for_identifier,
    init_vit_params,
    resample_pos_embed,
    rope_tables,
    vit_forward,
)

TOL = dict(rtol=5e-5, atol=5e-5)


def small_dinov2(image_size=32, patch=16):
    from transformers import Dinov2WithRegistersConfig
    from transformers.models.dinov2_with_registers.modeling_dinov2_with_registers import (
        Dinov2WithRegistersModel,
    )

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        patch_size=patch,
        image_size=image_size,
        num_register_tokens=4,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Dinov2WithRegistersModel(hf_cfg).eval(), ViTConfig.from_hf(hf_cfg)


def small_dinov3(use_gated_mlp=False):
    from transformers import DINOv3ViTConfig
    from transformers.models.dinov3_vit.modeling_dinov3_vit import DINOv3ViTModel

    hf_cfg = DINOv3ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        patch_size=16,
        image_size=32,
        num_register_tokens=4,
        intermediate_size=256,
        use_gated_mlp=use_gated_mlp,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    return DINOv3ViTModel(hf_cfg).eval(), ViTConfig.from_hf(hf_cfg)


def port(model):
    return {k: jnp.asarray(v) for k, v in state_dict_to_params(model.state_dict()).items()}


def test_dinov2_matches_hf_native_resolution():
    model, cfg = small_dinov2()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = model(x).last_hidden_state.numpy()
    got = vit_forward(port(model), jnp.asarray(x.numpy()), cfg)
    assert got.shape == want.shape  # (2, 1 + 4 + 4, 64)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_dinov2_matches_hf_interpolated_resolution():
    """Non-native input size exercises antialiased-bicubic pos-embed resampling."""
    model, cfg = small_dinov2(image_size=32, patch=16)
    x = torch.randn(2, 3, 64, 48)
    with torch.no_grad():
        want = model(x).last_hidden_state.numpy()
    pos = resample_pos_embed(
        model.state_dict()["embeddings.position_embeddings"].numpy(), 64 // 16, 48 // 16
    )
    got = vit_forward(port(model), jnp.asarray(x.numpy()), cfg, pos_embed=jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@pytest.mark.parametrize("gated", [False, True])
def test_dinov3_matches_hf(gated):
    model, cfg = small_dinov3(use_gated_mlp=gated)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = model(x).last_hidden_state.numpy()
    got = vit_forward(port(model), jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_dinov3_rope_matches_hf_module():
    from transformers import DINOv3ViTConfig
    from transformers.models.dinov3_vit.modeling_dinov3_vit import (
        DINOv3ViTRopePositionEmbedding,
    )

    hf_cfg = DINOv3ViTConfig(
        hidden_size=64, num_attention_heads=2, patch_size=16, image_size=32
    )
    mod = DINOv3ViTRopePositionEmbedding(hf_cfg).eval()
    with torch.no_grad():
        want_cos, want_sin = mod(torch.zeros(1, 3, 64, 48))
    cos, sin = rope_tables(ViTConfig.from_hf(hf_cfg), 64 // 16, 48 // 16)
    np.testing.assert_allclose(cos, want_cos.numpy(), **TOL)
    np.testing.assert_allclose(sin, want_sin.numpy(), **TOL)


def test_cls_embeddings_and_rect_input():
    model, cfg = small_dinov3()
    x = torch.randn(1, 3, 32, 48)
    with torch.no_grad():
        want = model(x).last_hidden_state[:, 0, :].numpy()
    got = cls_embeddings(port(model), jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_init_params_load_into_hf_model():
    """init_vit_params produces checkpoints loadable by transformers."""
    from transformers import Dinov2WithRegistersConfig
    from transformers.models.dinov2_with_registers.modeling_dinov2_with_registers import (
        Dinov2WithRegistersModel,
    )

    import jax

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        patch_size=16,
        image_size=32,
        num_register_tokens=4,
        attn_implementation="eager",
    )
    cfg = ViTConfig.from_hf(hf_cfg)
    params = init_vit_params(jax.random.key(0), cfg)
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected
    assert set(missing) == {"embeddings.mask_token"}  # unused in forward

    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        want = model(x).last_hidden_state.numpy()
    got = vit_forward(params, jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_identifier_resolution():
    assert config_for_identifier("facebook/dinov2-with-registers-base").hidden_size == 768
    assert config_for_identifier("facebook/dinov3-vitl16-pretrain-lvd1689m").num_layers == 24
    assert config_for_identifier("facebook/dinov3-vits16-pretrain-lvd1689m").hidden_size == 384
    assert PRESETS["dinov2-with-registers-base"].patch_size == 14


def test_local_config_json_hf_class_defaults(tmp_path):
    """config.json written by HF save_pretrained omits class-default keys
    (use_diff=True); absent keys must resolve to each family's CLASS default
    — registers default to 4 for dinov2_with_registers, eps is 1e-5 for
    dinov3 — not to shared zeros (models/vit.py _config_from_local_json)."""
    import json

    d = tmp_path / "resaved-dinov2wr"
    d.mkdir()
    # a re-saved facebook/dinov2-with-registers-base omits both keys
    (d / "config.json").write_text(json.dumps({
        "model_type": "dinov2_with_registers",
        "hidden_size": 768, "num_hidden_layers": 12,
        "num_attention_heads": 12, "patch_size": 14, "mlp_ratio": 4,
    }))
    cfg = config_for_identifier(str(d))
    assert cfg.num_register_tokens == 4  # Dinov2WithRegistersConfig default
    assert cfg.layer_norm_eps == 1e-6
    assert cfg.intermediate_size == 3072 and isinstance(cfg.intermediate_size, int)

    d3 = tmp_path / "resaved-dinov3"
    d3.mkdir()
    (d3 / "config.json").write_text(json.dumps({
        "model_type": "dinov3_vit",
        "hidden_size": 384, "num_hidden_layers": 12,
        "num_attention_heads": 6, "patch_size": 16,
        "num_register_tokens": 4, "intermediate_size": 1536,
    }))
    cfg3 = config_for_identifier(str(d3))
    assert cfg3.layer_norm_eps == 1e-5  # DINOv3ViTConfig default
    assert cfg3.variant == "dinov3"


def test_swiglu_intermediate_matches_hf():
    """use_swiglu_ffn shrinks the hidden width like HF Dinov2SwiGLUFFN:
    (int(hidden*ratio*2/3)+7)//8*8 (giant: 4096, not 6144)."""
    from transformers import Dinov2Config

    hf = Dinov2Config(hidden_size=1536, mlp_ratio=4, use_swiglu_ffn=True,
                      num_hidden_layers=2, num_attention_heads=24)
    cfg = ViTConfig.from_hf(hf)
    assert cfg.intermediate_size == 4096
    # init shapes line up with the HF module's weights_in/(2*I, D) layout
    import torch
    from transformers.models.dinov2.modeling_dinov2 import Dinov2SwiGLUFFN

    mod = Dinov2SwiGLUFFN(hf)
    assert mod.weights_in.weight.shape == (2 * cfg.intermediate_size, cfg.hidden_size)


def test_dinov3_zero_registers_forward():
    """A register-free dinov3 config (the HF class default) must forward
    without requiring embeddings.register_tokens (models/vit.py
    _assemble_embeddings)."""
    cfg = ViTConfig(
        variant="dinov3", hidden_size=64, num_layers=1, num_heads=2,
        patch_size=16, num_register_tokens=0, intermediate_size=128,
        layer_norm_eps=1e-5, rope_theta=100.0,
    )
    import jax
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    assert "embeddings.register_tokens" not in params
    x = jnp.zeros((1, 3, 32, 32), jnp.float32)
    out = vit_forward(params, x, cfg)
    assert out.shape == (1, 1 + (32 // 16) ** 2, 64)


def test_layernorm_single_pass_outlier_parity():
    """The single-pass bf16 LayerNorm must match the exact two-pass form on
    outlier-activation rows (r4 advisor finding). Pretrained DINOv2/v3
    "massive activations" are SPARSE huge dims — variance-dominant, the
    safe direction for E[x^2]-mean^2 — so parity must be near-exact there;
    moderate uniform offsets must stay under bf16 output quantization. (The
    only failing regime, a near-constant row with |mean|/std >~ 100, is not
    one hidden states occupy; CBAS_LN_TWO_PASS=1 covers exotic inputs.)
    Shipped form: models/vit.py _ln."""
    from cbas_tpu.models.vit import _ln

    rng = np.random.default_rng(0)
    D = 768

    def sparse_outlier_rows(n, magnitude, k):
        r = rng.standard_normal((n, D))
        for i in range(n):
            r[i, rng.integers(0, D, k)] = magnitude * (1 - 2 * (i % 2))
        return r

    rows = np.concatenate(
        [
            rng.standard_normal((8, D)),            # plain
            sparse_outlier_rows(8, 1000.0, 4),       # DINO-style outliers
            sparse_outlier_rows(8, 5000.0, 2),       # extreme outliers
            30.0 + rng.standard_normal((8, D)),      # moderate offset
            -100.0 + 2.0 * rng.standard_normal((8, D)),
        ]
    ).astype(np.float32)
    x = jnp.asarray(rows, jnp.bfloat16)
    params = {
        "ln.weight": jnp.ones((D,), jnp.float32),
        "ln.bias": jnp.zeros((D,), jnp.float32),
    }
    got = np.asarray(_ln(params, "ln", x, 1e-6).astype(jnp.float32), np.float64)
    # exact reference on the SAME bf16-quantized inputs, fp64 two-pass
    xq = np.asarray(x.astype(jnp.float32), np.float64)
    ref = (xq - xq.mean(-1, keepdims=True)) / np.sqrt(
        xq.var(-1, keepdims=True) + 1e-6
    )
    ref = np.asarray(
        jnp.asarray(ref.astype(np.float32), jnp.bfloat16).astype(jnp.float32),
        np.float64,
    )
    err = np.abs(got - ref)
    # sparse-outlier rows: near-exact (measured <=5e-6 internal; allow a
    # few output-rounding flips at bf16 granularity)
    assert err[8:24].max() < 4e-2
    # everything: under ~2 bf16 output ulp at |y| <= 5
    assert err.max() < 6e-2

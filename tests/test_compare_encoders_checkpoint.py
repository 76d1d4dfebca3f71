"""Fixture test for the packaged pretrained-weight smoke
(``compare_encoders --checkpoint``, r4 verdict missing #1 / next #7).

No real DINO checkpoint exists in the sandbox, so the fixture saves a small
genuine transformers model with ``save_pretrained`` (config.json +
model.safetensors — byte-for-byte the artifact a user points the tool at)
and runs the full command path: load through ``load_encoder_params``,
render the attention map, assert CLS parity vs the transformers module.
Off-sandbox the same command validates real weights
(docs/Installation.md "Post-install check").
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from cbas_tpu.tools.compare_encoders import main


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    from transformers import DINOv3ViTConfig
    from transformers.models.dinov3_vit.modeling_dinov3_vit import DINOv3ViTModel

    hf_cfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        patch_size=16, image_size=32, num_register_tokens=4,
        intermediate_size=256,
    )
    torch.manual_seed(0)
    model = DINOv3ViTModel(hf_cfg).eval()
    d = str(tmp_path_factory.mktemp("ckpt") / "dinov3-tiny")
    model.save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def frame_png(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("img") / "frame.png")
    rng = np.random.default_rng(3)
    cv2.imwrite(p, rng.integers(0, 256, (64, 64, 3), np.uint8))
    return p


def test_checkpoint_smoke_passes_on_genuine_checkpoint(
    checkpoint_dir, frame_png, tmp_path
):
    out = str(tmp_path / "cmp.png")
    # exit 0 = map rendered AND CLS parity vs transformers held
    main(["--image", frame_png, "--checkpoint", checkpoint_dir, "--out", out])
    assert os.path.exists(out)


def test_checkpoint_smoke_fails_on_port_bug(
    checkpoint_dir, frame_png, tmp_path, monkeypatch
):
    """The parity assert must actually bite. A corrupted checkpoint would
    corrupt BOTH sides identically (they load the same directory); the
    failure class the guard exists for is a PORT bug — our weight mapping
    silently diverging from what transformers loads. Simulate one by
    perturbing a tensor only on our side and require exit code 1."""
    import cbas_tpu.models.encoder as enc_mod

    real = enc_mod.load_encoder_params

    def buggy(identifier):
        params = dict(real(identifier))
        key = next(k for k in params if "attention" in k and k.endswith("weight"))
        # scale grossly, don't shift: a constant shift of k_proj lies in
        # LayerNorm's null space (LN rows sum to zero at unit gamma) and is
        # invisible, and small scales vanish into the near-uniform attention
        # of a random-init fixture. A real port bug (wrong key, missing
        # transpose) is a gross error, which is what this simulates.
        params[key] = params[key] * 10.0
        return params

    monkeypatch.setattr(enc_mod, "load_encoder_params", buggy)
    with pytest.raises(SystemExit) as exc:
        main(["--image", frame_png, "--checkpoint", checkpoint_dir,
              "--out", str(tmp_path / "cmp2.png")])
    assert exc.value.code == 1

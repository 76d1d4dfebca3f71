"""End-to-end demo on a synthetic project (runs on CPU in ~2 minutes).

Builds a project with generated videos, encodes them with a small
randomly-initialized ViT, labels two behaviors programmatically, trains a
classifier head, runs inference, and renders an actogram — the full pipeline
without hardware or pretrained checkpoints.

    JAX_PLATFORMS=cpu python examples/end_to_end_demo.py /tmp/demo
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root: str) -> None:
    import cv2
    import jax
    import jax.numpy as jnp

    from cbas_tpu.core.config import EncodeConfig, TrainingConfig
    from cbas_tpu.core.project import Project
    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.engine.encode import encode_file
    from cbas_tpu.engine.infer import infer_file
    from cbas_tpu.engine.orchestrator import run_training_job
    from cbas_tpu.app.visualize import Actogram, stitch_outputs
    from cbas_tpu.models.encoder import FrameEncoder
    from cbas_tpu.models.vit import ViTConfig, init_vit_params

    print("== 1. Create project with synthetic recordings ==")
    proj = Project.create_project(root, "demo")
    rng = np.random.default_rng(0)
    res, frames = 64, 300
    videos = []
    for s in range(8):
        rec = os.path.join(proj.recordings_dir, "sess1", f"mouse{s}")
        os.makedirs(rec)
        path = os.path.join(rec, f"mouse{s}_00001.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (res, res))
        for i in range(frames):
            frame = rng.integers(0, 60, (res, res, 3), np.uint8)
            # First half: bright moving blob ("active"); second half: dark ("rest").
            if i < frames // 2:
                x = (i * 3) % (res - 16)
                frame[:, :, 1] = frame[:, :, 1] // 2 + 120  # bright scene
                frame[20:36, x : x + 16, 1] = 255
            w.write(frame)
        w.release()
        videos.append(path)
    proj.reload()

    print("== 2. Encode with a small random ViT (stands in for DINOv3) ==")
    # The encoder ships INSIDE the project (safetensors + HF-style
    # config.json) and cbas_config.yaml points at it by relative path, so the
    # project is fully portable — the identifier resolution machinery
    # (models/vit.py config_for_identifier, core/project.py) does the rest.
    cfg = ViTConfig(
        variant="dinov3", hidden_size=128, num_layers=2, num_heads=2, patch_size=16,
        num_register_tokens=4, intermediate_size=256, layer_norm_eps=1e-5,
    )
    params = jax.device_get(init_vit_params(jax.random.key(0), cfg))
    enc_dir = os.path.join(proj.path, "demo_encoder")
    os.makedirs(enc_dir, exist_ok=True)
    from safetensors.numpy import save_file

    save_file({k: np.asarray(v) for k, v in params.items()},
              os.path.join(enc_dir, "model.safetensors"))
    import json

    with open(os.path.join(enc_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "dinov3_vit",
                "hidden_size": cfg.hidden_size,
                "num_hidden_layers": cfg.num_layers,
                "num_attention_heads": cfg.num_heads,
                "patch_size": cfg.patch_size,
                "num_register_tokens": cfg.num_register_tokens,
                "intermediate_size": cfg.intermediate_size,
                "layer_norm_eps": cfg.layer_norm_eps,
            },
            f,
            indent=2,
        )
    from cbas_tpu.core.config import dump_yaml

    dump_yaml({"encoder_model_identifier": "demo_encoder"},
              os.path.join(proj.path, "cbas_config.yaml"))
    proj.reload_settings()
    encoder = FrameEncoder(proj.encoder_model_identifier, compute_dtype=jnp.float32)
    for v in videos:
        out = encode_file(encoder, v, config=EncodeConfig(chunk_frames=64))
        print("   encoded:", os.path.basename(out))

    print("== 3. Label the two behaviors programmatically ==")
    ds = proj.create_dataset("demo_behaviors", ["active", "rest"], [])
    labels = {"active": [], "rest": []}
    half = frames // 2
    for v in videos:
        rel = os.path.relpath(v, proj.path)
        labels["active"].append({"video": rel, "start": 20, "end": half - 20, "label": "active"})
        labels["rest"].append({"video": rel, "start": half + 20, "end": frames - 20, "label": "rest"})
    ds.labels["labels"] = labels
    ds.save_labels()
    proj.reload()

    print("== 4. Train the classifier head ==")
    task = TrainingConfig(
        name="demo_behaviors", behaviors=["active", "rest"], batch_size=128,
        learning_rate=3e-3, epochs=4, sequence_length=15, patience=3,
        num_runs=1, num_trials=1, use_test=True, test_split=0.2,
        lstm_hidden_size=32,
    )
    model_dir = run_training_job(proj, task, seed=7)
    print("   model saved to:", model_dir)

    print("== 5. Inference ==")
    bundle = ClassifierBundle.load(model_dir, expected_encoder=proj.encoder_model_identifier)
    h5 = videos[0].replace(".mp4", "_cls.h5")
    csv = infer_file(h5, bundle)
    print("   predictions:", os.path.basename(csv))

    print("== 6. Actogram ==")
    df = stitch_outputs(os.path.dirname(videos[0]), bundle.name)
    acto = Actogram(
        behavior="active", framerate=300 / 3600, start=0, binsize_minutes=30,
        threshold=0.5, preloaded_df=df, model=bundle.name,
    )
    out_png = os.path.join(root, "actogram_active.png")
    if acto.blob:
        import base64

        with open(out_png, "wb") as f:
            f.write(base64.b64decode(acto.blob))
        print("   wrote:", out_png)
    import pandas as pd

    probs = pd.read_csv(csv)
    acc_active = probs.iloc[30 : half - 30]["active"].mean()
    acc_rest = probs.iloc[half + 30 : -30]["rest"].mean()
    print(f"== done: mean P(active|first half)={acc_active:.2f}, "
          f"P(rest|second half)={acc_rest:.2f} ==")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cbas_tpu_demo")

"""Diagnostics tools tests."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cbas_tpu.core import hdf5_store
from cbas_tpu.core.project import Project
from cbas_tpu.models.vit import ViTConfig, cls_attention_map, init_vit_params
from cbas_tpu.tools.check_h5 import inspect, main as check_main
from cbas_tpu.tools.analyze_split import main as analyze_main
from cbas_tpu.tools.prediction_viewer import export_overlay
from cbas_tpu.utils.naming import h5_path_for_video


def test_check_h5(tmp_path, capsys):
    good = str(tmp_path / "a_cls.h5")
    with hdf5_store.EmbeddingWriter(good, encoder_identifier="enc-a", embed_dim=32) as w:
        w.append(np.zeros((7, 32)))
    info = inspect(good, None)
    assert info["ok"] and info["frames"] == 7 and info["dim"] == 32
    assert not inspect(good, "other")["ok"]
    assert check_main([good]) == 0
    assert check_main([good, "--expect", "other"]) == 1
    assert check_main([str(tmp_path / "missing.h5")]) == 1


def test_analyze_split_cli(tmp_path, capsys):
    proj = Project.create_project(str(tmp_path), "p")
    ds = proj.create_dataset("d", ["walk"], [])
    ds.labels["labels"]["walk"] = [
        {"video": f"recordings/s/m{i}/v.mp4", "start": 0, "end": 9, "label": "walk"}
        for i in range(5)
    ]
    ds.save_labels()
    analyze_main(["--project", proj.path, "--dataset", "d", "--seed", "42"])
    out = capsys.readouterr().out
    assert "5 subjects" in out and "Run 0" in out and "walk" in out


@pytest.mark.parametrize("variant", ["dinov2", "dinov3"])
def test_cls_attention_map(variant):
    cfg = ViTConfig(
        variant=variant, hidden_size=64, num_layers=2, num_heads=2, patch_size=16,
        num_register_tokens=4, intermediate_size=128,
        layer_norm_eps=1e-5 if variant == "dinov3" else 1e-6, image_size=32,
    )
    params = init_vit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 48))
    attn = np.asarray(cls_attention_map(params, x, cfg))
    assert attn.shape == (2, 2, 3)
    assert (attn >= 0).all()
    # Rows sum to at most 1 (CLS attention mass over patches only).
    assert attn.reshape(2, -1).sum(1).max() <= 1.0 + 1e-5


def test_prediction_overlay_export(tmp_path):
    import pandas as pd

    video = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 96))
    for i in range(20):
        w.write(np.full((96, 96, 3), i * 10, np.uint8))
    w.release()
    df = pd.DataFrame({
        "walk": np.linspace(0, 1, 20),
        "rest": np.linspace(1, 0, 20),
    })
    out = str(tmp_path / "overlay.mp4")
    export_overlay(video, df, out)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 20
    cap.release()

"""Metrics registry + pipeline instrumentation tests."""

import time

import numpy as np
import pytest

from cbas_tpu.utils.metrics import MetricsRegistry, StageMeter, metrics


def test_stage_meter_rates():
    m = StageMeter()
    m.add(100, 2.0)
    m.add(50, 1.0)
    assert m.rate == pytest.approx(50.0)
    snap = m.snapshot()
    assert snap["units"] == 150 and snap["busy_s"] == 3.0


def test_registry_timed_context():
    reg = MetricsRegistry()
    with reg.timed("stage_x", units=10):
        time.sleep(0.01)
    snap = reg.snapshot()["stage_x"]
    assert snap["units"] == 10 and snap["busy_s"] >= 0.01
    reg.reset()
    assert reg.snapshot() == {}


def test_pipeline_reports_metrics(tmp_path):
    """encode_file and infer_file feed the global registry."""
    cv2 = pytest.importorskip("cv2")
    import jax
    import jax.numpy as jnp

    from cbas_tpu.core import hdf5_store
    from cbas_tpu.core.config import EncodeConfig, InferenceConfig
    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.engine.encode import encode_file
    from cbas_tpu.engine.infer import infer_file
    from cbas_tpu.models.encoder import FrameEncoder
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
    from cbas_tpu.models.vit import ViTConfig, init_vit_params
    from cbas_tpu.utils.metrics import (
        DECODE_FRAMES,
        ENCODE_FRAMES,
        ENCODE_FRAMES_COLD,
        INFER_WINDOWS,
    )

    metrics.reset()
    video = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for i in range(30):
        w.write(np.full((32, 32, 3), i, np.uint8))
    w.release()

    cfg = ViTConfig(
        variant="dinov3", hidden_size=64, num_layers=1, num_heads=2, patch_size=16,
        num_register_tokens=4, intermediate_size=128, layer_norm_eps=1e-5,
    )
    params = jax.device_get(init_vit_params(jax.random.key(0), cfg))
    enc = FrameEncoder("e", params=params, cfg=cfg, compute_dtype=jnp.float32)
    h5 = encode_file(enc, video, config=EncodeConfig(chunk_frames=16))

    hcfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=5, lstm_hidden_size=8)
    hp = jax.device_get(init_deltas_params(jax.random.key(1), hcfg))
    bundle = ClassifierBundle(
        name="m", behaviors=["a", "b"], seq_len=5,
        params={k: np.asarray(v) for k, v in hp.items()}, lstm_hidden_size=8,
    )
    infer_file(h5, bundle, config=InferenceConfig(chunk_frames=20, window_batch=8))

    snap = metrics.snapshot()
    assert snap[DECODE_FRAMES]["units"] == 30
    # The first (cold, compiling) chunk lands on the cold meter; warm batches
    # carry steady-state throughput.
    assert snap[ENCODE_FRAMES]["units"] == 14
    assert snap[ENCODE_FRAMES_COLD]["units"] == 16
    assert snap[INFER_WINDOWS]["units"] == 30
    assert snap[DECODE_FRAMES]["rate"] > 0

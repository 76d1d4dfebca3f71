"""Realtime multi-stream loop: segments appear -> watcher -> encode -> live
classification -> actogram data, end to end through the worker trio.

Simulates BASELINE config 5 without RTSP hardware: three "cameras" drop
segment files into the recordings tree while the workers run; everything
downstream must happen without manual intervention.
"""

import os
import time

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cbas_tpu.app.state import AppState
from cbas_tpu.app.visualize import Actogram, stitch_outputs
from cbas_tpu.app.workers import ClassifyWorker, EncodeWorker, queue_encode_task
from cbas_tpu.core.config import EncodeConfig, InferenceConfig
from cbas_tpu.core.project import Project
from cbas_tpu.engine.classifier import ClassifierBundle
from cbas_tpu.ingest.watcher import RecordingWatcher
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
from cbas_tpu.models.vit import ViTConfig, init_vit_params
from cbas_tpu.utils.naming import h5_path_for_video, outputs_csv_for_h5

RES = 32
SMALL_CFG = ViTConfig(
    variant="dinov3", hidden_size=64, num_layers=1, num_heads=2, patch_size=16,
    num_register_tokens=4, intermediate_size=128, layer_norm_eps=1e-5,
)


def write_segment(path, n=25):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
    rng = np.random.default_rng(abs(hash(path)) % 2**32)
    for _ in range(n):
        w.write(rng.integers(0, 256, (RES, RES, 3), np.uint8))
    w.release()


def test_live_multistream_loop(tmp_path):
    proj = Project.create_project(str(tmp_path), "p")
    state = AppState()
    state.project = proj
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))
    state.encoder = FrameEncoder(
        proj.encoder_model_identifier, params=params, cfg=SMALL_CFG,
        compute_dtype=jnp.float32,
    )

    # Live model bundle matching the encoder stamp.
    hcfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=5, lstm_hidden_size=8)
    hp = jax.device_get(init_deltas_params(jax.random.key(1), hcfg))
    ClassifierBundle(
        name="live", behaviors=["active", "rest"], seq_len=5,
        params={k: np.asarray(v) for k, v in hp.items()}, lstm_hidden_size=8,
        encoder_identifier=proj.encoder_model_identifier,
    ).save(os.path.join(proj.models_dir, "live"))
    proj.reload()
    state.live_inference_model_name = "live"

    # Watcher with a short settle window feeds the encode queue.
    watcher = RecordingWatcher(
        proj.recordings_dir,
        on_ready=lambda p: queue_encode_task(state, p),
        settle_s=0.2,
        poll_s=0.05,
    )
    encode_worker = EncodeWorker(state, poll_s=0.05, config=EncodeConfig(chunk_frames=16))
    classify_worker = ClassifyWorker(
        state, poll_s=0.05, config=InferenceConfig(chunk_frames=50, window_batch=8)
    )
    watcher.start()
    encode_worker.start()
    classify_worker.start()

    # Three cameras emit two segments each while the system runs.
    cameras = ["cam0", "cam1", "cam2"]
    videos = []
    try:
        for seg in (1, 2):
            for cam in cameras:
                d = os.path.join(proj.recordings_dir, "session1", cam)
                os.makedirs(d, exist_ok=True)
                v = os.path.join(d, f"{cam}_{seg:05d}.mp4")
                write_segment(v)
                videos.append(v)
            time.sleep(0.3)

        # Everything must flow through without intervention. Healthy runs
        # finish in seconds; the generous ceiling absorbs cold XLA compiles
        # on a loaded 1-vCPU CI host (observed >90 s late in a full-suite
        # run), where a tight deadline only manufactures flakes.
        deadline = time.monotonic() + 240
        expected_csvs = [
            outputs_csv_for_h5(h5_path_for_video(v), "live") for v in videos
        ]
        while time.monotonic() < deadline:
            if all(os.path.exists(c) for c in expected_csvs):
                break
            time.sleep(0.25)
        missing = [c for c in expected_csvs if not os.path.exists(c)]
        assert not missing, f"live loop did not produce: {missing}"

        # H5s are stamped and complete.
        from cbas_tpu.core import hdf5_store

        for v in videos:
            h5 = h5_path_for_video(v)
            assert hdf5_store.is_stamp_valid(h5, proj.encoder_model_identifier)
            assert hdf5_store.num_frames(h5) == 25

        # Stitched predictions feed an actogram per camera.
        df = stitch_outputs(os.path.join(proj.recordings_dir, "session1", "cam0"), "live")
        assert len(df) == 50  # two segments stitched in order
        acto = Actogram(
            behavior="active", framerate=25 / 60, start=0, binsize_minutes=1,
            threshold=0.3, preloaded_df=df, model="live",
        )
        assert acto.binned_activity  # binning ran (blob optional at this size)
    finally:
        state.shutdown.set()
        watcher.stop()
        encode_worker.join(timeout=15)
        classify_worker.join(timeout=15)

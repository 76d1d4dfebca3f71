"""App-layer tests: queues, watcher settling, workers end-to-end, recording mgmt."""

import os
import threading
import time

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from cbas_tpu.app.state import AppState, TaskQueue
from cbas_tpu.app.workers import (
    ClassifyWorker,
    EncodeWorker,
    TrainWorker,
    queue_encode_task,
    start_classification,
    sweep_stale_embeddings,
)
from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import CameraSettings, EncodeConfig, InferenceConfig
from cbas_tpu.core.project import Project
from cbas_tpu.engine.classifier import ClassifierBundle
from cbas_tpu.ingest.record import RecordingManager, build_record_command, ffmpeg_available
from cbas_tpu.ingest.watcher import RecordingWatcher
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
from cbas_tpu.models.vit import ViTConfig, init_vit_params
from cbas_tpu.utils.naming import h5_path_for_video, outputs_csv_for_h5

cv2 = pytest.importorskip("cv2")

RES = 32
SMALL_CFG = ViTConfig(
    variant="dinov3", hidden_size=64, num_layers=2, num_heads=2, patch_size=16,
    num_register_tokens=4, intermediate_size=128, layer_norm_eps=1e-5,
)


def test_task_queue_dedupe_and_fifo():
    q = TaskQueue()
    assert q.append("a") and not q.append("a")
    q.extend(["b", "c", "b"])
    assert q.snapshot() == ["a", "b", "c"]
    assert q.pop() == "a" and len(q) == 2


def test_watcher_settling(tmp_path):
    ready = []
    w = RecordingWatcher(str(tmp_path), ready.append, settle_s=5.0)
    p = str(tmp_path / "cam_00001.mp4")
    with open(p, "wb") as f:
        f.write(b"x" * 100)
    t0 = 1000.0
    assert w.poll_once(now=t0) == 0          # first sighting: start settling
    assert w.poll_once(now=t0 + 2) == 0      # stable but not settled yet
    # file grows -> settle clock restarts
    with open(p, "ab") as f:
        f.write(b"y" * 50)
    assert w.poll_once(now=t0 + 4) == 0
    assert w.poll_once(now=t0 + 8) == 0      # only 4s stable
    assert w.poll_once(now=t0 + 10) == 1     # settled
    assert ready == [p]
    assert w.poll_once(now=t0 + 20) == 0     # known: never re-queued
    w.forget(p)
    assert w.poll_once(now=t0 + 21) == 0     # starts settling again
    assert w.poll_once(now=t0 + 40) == 1


@pytest.fixture
def app_project(tmp_path):
    proj = Project.create_project(str(tmp_path), "p")
    rec_dir = os.path.join(proj.recordings_dir, "sess", "m0")
    os.makedirs(rec_dir)
    video = os.path.join(rec_dir, "m0_00001.mp4")
    wtr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
    rng = np.random.default_rng(0)
    for i in range(40):
        wtr.write(rng.integers(0, 256, (RES, RES, 3), np.uint8))
    wtr.release()
    proj.reload()

    state = AppState()
    state.project = proj
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))
    state.encoder = FrameEncoder(
        proj.encoder_model_identifier, params=params, cfg=SMALL_CFG,
        compute_dtype=jnp.float32,
    )
    return proj, state, video


def test_encode_worker_end_to_end(app_project):
    proj, state, video = app_project
    assert sweep_stale_embeddings(state) == 1
    progress = []
    state.callbacks.register(
        "update_global_encoding_progress", lambda d, t, p: progress.append((d, t, p))
    )
    worker = EncodeWorker(state, config=EncodeConfig(chunk_frames=16))
    assert worker.process_one()
    h5 = h5_path_for_video(video)
    assert os.path.exists(h5)
    assert hdf5_store.num_frames(h5) == 40
    assert hdf5_store.is_stamp_valid(h5, proj.encoder_model_identifier)
    assert progress[-1] == (1, 1, 100.0)
    # Re-sweep finds nothing stale.
    assert sweep_stale_embeddings(state) == 0


def test_encode_then_live_classify_chain(app_project, tmp_path):
    proj, state, video = app_project

    # Train-free bundle with matching encoder stamp.
    cfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=7, lstm_hidden_size=8)
    params = jax.device_get(init_deltas_params(jax.random.key(1), cfg))
    bundle = ClassifierBundle(
        name="livemodel", behaviors=["a", "b"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=8, encoder_identifier=proj.encoder_model_identifier,
    )
    bundle.save(os.path.join(proj.models_dir, "livemodel"))
    proj.reload()

    state.live_inference_model_name = "livemodel"
    queue_encode_task(state, video)
    EncodeWorker(state, config=EncodeConfig(chunk_frames=16)).process_one()
    assert len(state.classify_tasks) == 1  # chained

    notified = []
    state.callbacks.register("notify_new_data_available", lambda: notified.append(1))
    cw = ClassifyWorker(state, config=InferenceConfig(chunk_frames=50, window_batch=16))
    assert cw.process_one()
    csv = outputs_csv_for_h5(h5_path_for_video(video), "livemodel")
    df = pd.read_csv(csv)
    assert len(df) == 40 and list(df.columns) == ["a", "b"]
    assert notified
    # A live-chained segment must NOT deselect the live model: the next
    # recorded segment still needs classifying (review r5 regression fix).
    assert state.live_inference_model_name == "livemodel"



def test_classify_worker_hot_reloads_retrained_bundle(app_project):
    """Retraining the LIVE model (same name) must flow into live inference:
    the worker watches the bundle files' on-disk identity and rebuilds its
    session (the staleness the reference ships: workthreads.py:462-471 only
    reloads on a name change). A torn mid-save read holds classification
    (tasks kept, model kept selected) instead of serving stale weights."""
    proj, state, video = app_project
    h5 = h5_path_for_video(video)
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=64) as w:
        w.append(np.random.default_rng(0).normal(size=(30, 64)).astype(np.float16))

    def save_bundle(seed, temperature):
        cfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=7, lstm_hidden_size=8)
        params = jax.device_get(init_deltas_params(jax.random.key(seed), cfg))
        ClassifierBundle(
            name="hotm", behaviors=["a", "b"], seq_len=7,
            params={k: np.asarray(v) for k, v in params.items()},
            lstm_hidden_size=8, temperature=temperature,
            encoder_identifier=proj.encoder_model_identifier,
        ).save(os.path.join(proj.models_dir, "hotm"))

    save_bundle(seed=1, temperature=1.0)
    proj.reload()
    csv = outputs_csv_for_h5(h5, "hotm")
    cw = ClassifyWorker(state, config=InferenceConfig(chunk_frames=50, window_batch=16))

    state.live_inference_model_name = "hotm"
    state.classify_tasks.append(h5)
    assert cw.process_one()
    first = pd.read_csv(csv).to_numpy()
    session_v1 = cw._session

    # Retrain under the same name: different weights + temperature.
    save_bundle(seed=2, temperature=2.0)
    os.remove(csv)
    state.live_inference_model_name = "hotm"  # unchanged selection
    state.classify_tasks.append(h5)
    assert cw.process_one()
    assert cw._session is not session_v1, "session was not hot-reloaded"
    second = pd.read_csv(csv).to_numpy()
    assert not np.allclose(first, second), "stale weights served after retrain"

    # Torn mid-save read: corrupt npz holds classification without dropping
    # the batch or the selection; a completed save resumes it.
    npz = os.path.join(proj.models_dir, "hotm", "model.npz")
    with open(npz, "wb") as f:
        f.write(b"not a zip")
    os.remove(csv)
    state.classify_tasks.append(h5)
    assert not cw.process_one()  # held, not failed
    assert len(state.classify_tasks) == 1
    assert state.live_inference_model_name == "hotm"
    save_bundle(seed=3, temperature=1.5)
    assert cw.process_one()
    assert os.path.exists(csv)


def test_start_classification_skips_done(app_project):
    proj, state, video = app_project
    h5 = h5_path_for_video(video)
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=8) as w:
        w.append(np.zeros((10, 8)))
    done_csv = outputs_csv_for_h5(h5, "m")
    pd.DataFrame({"a": [1]}).to_csv(done_csv, index=False)
    n = start_classification(state, "m", [h5])
    assert n == 0 and state.live_inference_model_name == "m"


def test_start_classification_requeues_stale_csv_after_retrain(app_project):
    """A CSV older than the bundle's saved weights counts as missing: after
    a same-name retrain, an existence-only check would queue nothing and
    keep presenting the PREVIOUS model's predictions under the new model's
    name (utils/naming.py outputs_csv_is_stale, shared with Api guided
    labeling and the disagreement report)."""
    proj, state, video = app_project
    h5 = h5_path_for_video(video)
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=8) as w:
        w.append(np.zeros((10, 8)))
    model_dir = os.path.join(proj.models_dir, "m")
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, "config.yaml"), "w") as f:
        f.write("behaviors: [a, b]\n")
    csv = outputs_csv_for_h5(h5, "m")
    pd.DataFrame({"a": [1]}).to_csv(csv, index=False)
    old = time.time() - 60
    os.utime(csv, (old, old))
    with open(os.path.join(model_dir, "model.npz"), "wb") as f:
        f.write(b"x")  # retrain: weights newer than the CSV
    proj.reload()
    assert start_classification(state, "m", [h5]) == 1
    # draining the queue and rewriting the CSV makes it current again
    os.utime(csv, None)
    state.classify_tasks.drain()
    assert start_classification(state, "m", [h5]) == 0


def test_record_command_recipe():
    cam = CameraSettings(
        name="c1", rtsp_url="rtsp://host/profile1", framerate=10, resolution=256,
        segment_seconds=600, crop_left_x=0.1, crop_top_y=0.0,
        crop_width=0.8, crop_height=1.0,
    )
    cmd = build_record_command(cam, "/x/c1_%05d.mp4", "/x/c1_playlist.m3u8")
    joined = " ".join(cmd)
    assert "rtsp://host/profile0" in joined  # high-quality substream swap
    assert "crop=iw*0.8:ih*1.0:iw*0.1:ih*0.0" in joined
    assert "scale=256:256:force_original_aspect_ratio=decrease" in joined
    assert "-hls_time 600" in joined and "program_date_time" in joined


def test_recording_manager_without_ffmpeg(tmp_path):
    mgr = RecordingManager(str(tmp_path))
    cam = CameraSettings(name="c1", rtsp_url="rtsp://x")
    if not ffmpeg_available():
        assert mgr.start(cam, "sess") is False
    assert mgr.stop("c1") is False  # nothing active


def test_classify_batch_for_already_loaded_model_completes(app_project, tmp_path):
    """A batch enqueued AFTER the model was loaded (empty-queue snapshot) must
    still emit progress, finish with 'Inference complete.', and clear the
    live model (review r2 finding: counters only reset on model change)."""
    proj, state, video = app_project
    cfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=7, lstm_hidden_size=8)
    params = jax.device_get(init_deltas_params(jax.random.key(2), cfg))
    bundle = ClassifierBundle(
        name="batchmodel", behaviors=["a", "b"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=8, encoder_identifier=proj.encoder_model_identifier,
    )
    bundle.save(os.path.join(proj.models_dir, "batchmodel"))
    proj.reload()

    # encode the video so an H5 exists
    queue_encode_task(state, video)
    EncodeWorker(state, config=EncodeConfig(chunk_frames=16)).process_one()
    state.classify_tasks.clear()

    cw = ClassifyWorker(state, config=InferenceConfig(chunk_frames=50, window_batch=16))
    state.live_inference_model_name = "batchmodel"
    assert cw._ensure_session() is not None  # model loads while queue is EMPTY

    progress = []
    state.callbacks.register(
        "updateInferenceProgress", lambda m, pct, msg: progress.append((pct, msg))
    )
    # batch starts later, through the real entry point (sets the batch flag)
    n = start_classification(state, "batchmodel", [h5_path_for_video(video)])
    assert n == 1
    assert cw.process_one()
    assert any(pct == 100.0 and "complete" in msg.lower() for pct, msg in progress)
    # an explicit batch DOES deselect the live model at completion
    assert state.live_inference_model_name is None
    assert state.batch_classification_active is False


def test_watcher_mark_handled_prevents_double_encode(tmp_path):
    """Imports/final segments queue their video directly; the watcher must
    NOT promote it again after settling (review r3 finding: forget() re-armed
    tracking, so every import was encoded twice)."""
    from cbas_tpu.ingest.watcher import RecordingWatcher

    ready = []
    w = RecordingWatcher(str(tmp_path), on_ready=ready.append, settle_s=0.0)
    p = str(tmp_path / "x.mp4")
    open(p, "wb").write(b"data")
    w.mark_handled(p)  # someone else queued it
    assert w.poll_once(now=1e9) == 0 and ready == []
    # forget() re-arms: the next stable sighting promotes again (re-encode flows)
    w.forget(p)
    w.poll_once(now=1e9)
    assert w.poll_once(now=2e9) == 1 and ready == [p]


def test_self_heal_retries_after_cooldown(monkeypatch):
    """A dead recording skipped by the cooldown must stay pending and restart
    on a later pass (review r3 finding: it was silently abandoned)."""
    from cbas_tpu.core.config import CameraSettings
    from cbas_tpu.ingest.record import RecordingManager

    mgr = RecordingManager("/tmp/nonexistent-recdir")

    class DeadProc:
        def poll(self):
            return 1

    mgr.active["cam"] = (DeadProc(), 0.0, "sess")
    mgr._last_restart["cam"] = __import__("time").time()  # inside cooldown
    started = []
    monkeypatch.setattr(mgr, "start", lambda cam, session: started.append(cam.name) or True)
    cams = {"cam": CameraSettings(name="cam", rtsp_url="rtsp://x")}

    mgr.check_and_heal(cams)
    assert started == [] and "cam" in mgr._pending_restart  # deferred, not dropped
    mgr._last_restart["cam"] = 0.0  # cooldown elapsed
    mgr.check_and_heal(cams)
    assert started == ["cam"] and "cam" not in mgr._pending_restart


def test_failed_classify_still_completes_batch(app_project):
    """A file that raises in infer_h5 must still advance the batch: progress
    reaches 100%, batch flag clears, the model deselects (r3 review finding:
    failures froze the batch below 100% and latched the flag)."""
    proj, state, video = app_project
    cfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=7, lstm_hidden_size=8)
    params = jax.device_get(init_deltas_params(jax.random.key(2), cfg))
    bundle = ClassifierBundle(
        name="failmodel", behaviors=["a", "b"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=8, encoder_identifier=proj.encoder_model_identifier,
    )
    bundle.save(os.path.join(proj.models_dir, "failmodel"))
    proj.reload()

    state.classify_tasks.clear()
    progress = []
    state.callbacks.register(
        "updateInferenceProgress", lambda m, pct, msg: progress.append((pct, msg))
    )
    # a bogus H5 path: infer_h5 will raise
    bogus = os.path.join(proj.recordings_dir, "nope_cls.h5")
    n = start_classification(state, "failmodel", [bogus])
    assert n == 1
    cw = ClassifyWorker(state, config=InferenceConfig(chunk_frames=50, window_batch=16))
    assert cw.process_one() is False  # the file failed...
    assert any(pct == 100.0 for pct, _ in progress)  # ...but the batch completed
    assert state.batch_classification_active is False
    assert state.live_inference_model_name is None


def test_classify_model_load_failure_fails_batch_loudly(app_project):
    """A bundle that cannot load must complete the batch as FAILED (drain the
    queue + 100% error event) instead of stranding tasks forever."""
    proj, state, video = app_project
    os.makedirs(os.path.join(proj.models_dir, "brokenmodel"), exist_ok=True)
    # config.yaml exists but there are no weights files at all
    with open(os.path.join(proj.models_dir, "brokenmodel", "config.yaml"), "w") as f:
        f.write("name: brokenmodel\nbehaviors: [a, b]\nseq_len: 7\n")
    proj.reload()

    state.classify_tasks.clear()
    progress = []
    state.callbacks.register(
        "updateInferenceProgress", lambda m, pct, msg: progress.append((pct, msg))
    )
    n = start_classification(state, "brokenmodel",
                             [os.path.join(proj.recordings_dir, "x_cls.h5")])
    assert n == 1
    cw = ClassifyWorker(state)
    assert cw.process_one() is False
    assert len(state.classify_tasks) == 0  # queue drained, not stranded
    assert state.batch_classification_active is False
    assert any(pct == 100.0 and "failed" in msg.lower() for pct, msg in progress)


def test_queueing_training_does_not_erase_inflight_cancel():
    """queue_task must not clear a cancel aimed at the RUNNING job; the flag
    is cleared when the next job starts (r3 review finding)."""
    from cbas_tpu.core.config import TrainingConfig

    state = AppState()
    tw = TrainWorker(state)
    state.training_cancel.set()  # user cancels the (conceptually running) job
    tw.queue_task(TrainingConfig(name="d2", behaviors=["a"], sequence_length=31))
    assert state.training_cancel.is_set()  # still set for the running job


def test_watcher_purges_deleted_files(tmp_path):
    """Dedupe state must not grow forever: entries for files deleted from
    disk are purged after 3 absent scans (and a reappearing path is new)."""
    ready = []
    w = RecordingWatcher(str(tmp_path), on_ready=ready.append, settle_s=0.0)
    p = str(tmp_path / "seg.mp4")
    open(p, "wb").write(b"data")
    w.poll_once(now=1.0)
    assert w.poll_once(now=2.0) == 1  # promoted into _known
    os.unlink(p)
    for now in (3.0, 4.0, 5.0):
        w.poll_once(now=now)
    assert p not in w._known and p not in w._pending and p not in w._missing


def test_start_classification_supersedes_other_models_queue(app_project):
    """Switching the live model while a different model's batch is still
    queued drops the stale tasks (queue items carry no model — they would
    otherwise be classified with the wrong one)."""
    proj, state, video = app_project
    h5 = h5_path_for_video(video)
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=8) as w:
        w.append(np.zeros((10, 8)))
    n = start_classification(state, "modelA", [h5])
    assert n == 1 and len(state.classify_tasks) == 1
    other = h5.replace("_cls.h5", "2_cls.h5")
    with hdf5_store.EmbeddingWriter(other, encoder_identifier="e", embed_dim=8) as w:
        w.append(np.zeros((10, 8)))
    start_classification(state, "modelB", [other])
    # modelA's queued file is gone; only modelB's remains
    assert state.live_inference_model_name == "modelB"
    remaining = []
    while True:
        item = state.classify_tasks.pop()
        if item is None:
            break
        remaining.append(item)
    assert remaining == [other]
    # same model again does NOT drop its own queue
    state.classify_tasks.extend([other])
    start_classification(state, "modelB", [h5])
    assert len(state.classify_tasks) >= 1


def test_classify_selection_before_project_load_retries(app_project):
    """A live-model selection made while no project is loaded must not latch:
    once a project exists, the session loads and the queue drains."""
    proj, state, video = app_project
    project_ref = state.project
    state.project = None
    state.live_inference_model_name = "somemodel"
    cw = ClassifyWorker(state, config=InferenceConfig(chunk_frames=50, window_batch=16))
    assert cw._ensure_session() is None
    assert cw._loaded_model is None  # not latched
    state.project = project_ref
    # now the lookup proceeds (model doesn't exist -> fail_batch path, which
    # is a LOADED decision rather than a silent eternal None)
    cw._ensure_session()
    assert state.live_inference_model_name is None  # failed batch deselected


def test_restart_continues_segment_numbering(tmp_path):
    """A (re)start into a directory already holding segments must continue
    the HLS numbering — restarting at 00000 would overwrite recorded video
    whose stamped H5s keep validating against content that no longer exists."""
    from cbas_tpu.ingest.record import build_record_command, next_segment_number

    d = str(tmp_path)
    assert next_segment_number(d, "cam") == 0
    for i in (0, 1, 7):
        (tmp_path / f"cam_{i:05d}.mp4").write_bytes(b"")
    (tmp_path / "other_00099.mp4").write_bytes(b"")  # different camera
    assert next_segment_number(d, "cam") == 8
    cam = CameraSettings(name="cam", rtsp_url="rtsp://h/s", framerate=10, resolution=256)
    cmd = build_record_command(cam, f"{d}/cam_%05d.mp4", f"{d}/p.m3u8", start_number=8)
    i = cmd.index("-start_number")
    assert cmd[i + 1] == "8"


def test_watcher_and_scan_skip_staging_artifacts(tmp_path):
    """*.tmp.mp4 staging files (crash-orphanable atomic-write temps) are
    invisible to both the watcher and the recording scan."""
    from cbas_tpu.ingest.watcher import RecordingWatcher
    from cbas_tpu.core.project import Project

    proj = Project.create_project(str(tmp_path), "p")
    rec = os.path.join(proj.recordings_dir, "s", "m0")
    os.makedirs(rec)
    open(os.path.join(rec, "m0_00001.mp4"), "wb").write(b"x")
    open(os.path.join(rec, "m0_00002.mp4.tmp.mp4"), "wb").write(b"x")
    proj.reload()
    vids = [os.path.basename(v)
        for subjects in proj.recordings.values()
        for r in subjects.values() for v in r.video_files]
    assert vids == ["m0_00001.mp4"]

    seen = []
    w = RecordingWatcher(proj.recordings_dir, on_ready=seen.append, settle_s=0.0)
    w.poll_once(now=0.0)
    w.poll_once(now=1.0)
    assert [os.path.basename(p) for p in seen] == ["m0_00001.mp4"]


def test_final_segment_skips_staging_and_aug_files(tmp_path):
    """stop() queues the newest REAL segment — not a '*.tmp.mp4' staging file
    or an '_aug' sibling that happens to be newer (the same filter every
    other scanner applies)."""
    queued = []
    mgr = RecordingManager(str(tmp_path), on_final_segment=queued.append)
    cam_dir = mgr.camera_dir("sess", "cam")
    os.makedirs(cam_dir)
    real = os.path.join(cam_dir, "cam_00002.mp4")
    for name in ("cam_00001.mp4", "cam_00002.mp4"):
        with open(os.path.join(cam_dir, name), "wb") as f:
            f.write(b"v")
    time.sleep(0.02)
    for name in ("cam_00002_aug.mp4", "cam_00003.mp4.tmp.mp4"):  # newer
        with open(os.path.join(cam_dir, name), "wb") as f:
            f.write(b"v")

    class FakeProc:
        stdin = None
        def poll(self): return 0
        def wait(self, timeout=None): return 0
        def kill(self): pass

    mgr.active["cam"] = (FakeProc(), time.time(), "sess")
    assert mgr.stop("cam")
    assert queued == [real]


def test_start_classification_api_skips_aug_h5(app_project):
    """Batch classification must not queue augmentation siblings' embeddings:
    nothing consumes their predictions (actogram stitching and the labeling
    lists both hide _aug artifacts)."""
    from cbas_tpu.app.api import Api

    proj, state, video = app_project
    api = Api(state)
    for stem in ("m0_00002", "m0_00002_aug"):
        h5 = os.path.join(os.path.dirname(video), f"{stem}_cls.h5")
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=8) as w:
            w.append(np.zeros((5, 8), np.float16))
    n = api.start_classification("m", [proj.recordings_dir])
    queued = state.classify_tasks.snapshot()
    assert n == len(queued)
    assert any(p.endswith("m0_00002_cls.h5") for p in queued)
    assert not any("_aug_cls.h5" in p for p in queued)


def test_encode_worker_does_not_chain_aug_into_classify(app_project, tmp_path):
    """The encode->live-classify chain must skip augmentation siblings:
    their embeddings feed training, but nothing consumes their predictions
    (same exclusion Api.start_classification applies)."""
    import shutil

    proj, state, video = app_project
    aug = video[:-4] + "_aug.mp4"
    shutil.copy(video, aug)
    state.live_inference_model_name = "whatever"
    state.encode_tasks.append(aug)
    state.encode_tasks.append(video)
    ew = EncodeWorker(state, config=EncodeConfig(chunk_frames=16))
    assert ew.process_one()  # aug
    assert ew.process_one()  # real
    chained = state.classify_tasks.snapshot()
    assert chained == [h5_path_for_video(video)], (
        "aug sibling's H5 must not enter the live classify queue"
    )


def test_outputs_csv_is_stale_pth_only_bundle(tmp_path):
    """Staleness keys on the newest of model.npz/model.pth: an imported
    reference bundle (pth-only, core/project.py Model fallback) whose
    weights were replaced must re-infer; a fresh CSV is trusted; a missing
    CSV is always stale; no weights at all trusts the CSV."""
    from cbas_tpu.utils.naming import outputs_csv_is_stale

    model_dir = str(tmp_path / "m")
    os.makedirs(model_dir)
    csv = str(tmp_path / "x_model_outputs.csv")

    assert outputs_csv_is_stale(csv, model_dir)  # no CSV yet

    with open(csv, "w") as f:
        f.write("a\n1\n")
    assert not outputs_csv_is_stale(csv, model_dir)  # no weights: trust CSV

    pth = os.path.join(model_dir, "model.pth")
    with open(pth, "wb") as f:
        f.write(b"w")
    os.utime(csv, (1.0, 1.0))  # CSV predates the pth weights
    assert outputs_csv_is_stale(csv, model_dir)

    os.utime(pth, (0.5, 0.5))  # CSV newer than the weights
    assert not outputs_csv_is_stale(csv, model_dir)

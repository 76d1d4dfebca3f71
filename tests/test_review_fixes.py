"""Regression tests for the code-review findings."""

import os
import threading

import numpy as np
import pytest

import jax

from cbas_tpu.app.state import AppState
from cbas_tpu.core import hdf5_store
from cbas_tpu.engine.data import WindowSource, build_manifest
from cbas_tpu.engine.train import train_head
from cbas_tpu.utils.naming import h5_path_for_video

DIM = 16


def make_sources(tmp_path, sep=3.0):
    rng = np.random.default_rng(0)
    root = str(tmp_path)
    instances = []
    for s in range(3):
        rel = f"recordings/x/m{s}/v.mp4"
        os.makedirs(os.path.join(root, os.path.dirname(rel)), exist_ok=True)
        h5 = h5_path_for_video(os.path.join(root, rel))
        feats = np.concatenate([
            rng.normal(sep / 2, 1.0, (60, DIM)), rng.normal(-sep / 2, 1.0, (60, DIM))
        ]).astype(np.float16)
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=DIM) as w:
            w.append(feats)
        instances.append({"video": rel, "start": 5, "end": 40, "label": "a"})
        instances.append({"video": rel, "start": 65, "end": 100, "label": "b"})
    manifest = build_manifest(root, instances, 5, ["a", "b"])
    return WindowSource(manifest, 5)


def test_resume_restores_best_not_last_weights(tmp_path):
    """After early plateau + resume, the returned weights must be the best
    epoch's, not the last epoch's (review finding #1)."""
    src = make_sources(tmp_path)
    ckpt = str(tmp_path / "state.npz")
    kw = dict(batch_size=32, lstm_hidden_size=8, seed=3, patience=10,
              checkpoint_path=ckpt)
    # Phase 1: 3 epochs with a high lr so later epochs can regress.
    p1, r1, best1 = train_head(src, src, 5, ["a", "b"], epochs=3, lr=5e-3, **kw)
    # Phase 2: resume for 2 more epochs with a destructive lr.
    p2, r2, best2 = train_head(src, src, 5, ["a", "b"], epochs=5, lr=5e-3,
                               resume=True, **kw)
    assert best2 >= best1 or best2 == best1
    if best2 == best1:
        # No later improvement: resumed run must return the phase-1 best
        # weights bit-for-bit (they were checkpointed).
        for k in p1:
            np.testing.assert_array_equal(p1[k], p2[k])
    hdf5_store.global_handle_cache.close_all()


def test_train_cancel_clears_for_next_task(tmp_path):
    """A cancelled job must not starve later queued jobs (finding #3).

    Semantics since the r3 worker review: the flag is cleared when the NEXT
    job STARTS (each job begins with a fresh flag), not by queue_task — so a
    cancel aimed at the running job can't be erased by queueing another."""
    from cbas_tpu.app.workers import TrainWorker

    state = AppState()
    worker = TrainWorker(state)
    state.training_cancel.set()  # as left by cancel_training_task mid-job

    ran = []

    def fake_job(*a, **kw):
        ran.append(kw.get("cancel_event").is_set())
        return None

    import cbas_tpu.app.workers as workers_mod

    orig = workers_mod.run_training_job
    workers_mod.run_training_job = fake_job
    try:
        from cbas_tpu.core.config import TrainingConfig

        with worker._lock:
            worker._queue.append(TrainingConfig(name="d", behaviors=["a"]))
        state.project = object()
        assert worker.process_one()
        # The next job started with a FRESH flag (stale cancel not inherited)
        assert ran == [False]
        assert not state.training_cancel.is_set()
    finally:
        workers_mod.run_training_job = orig


def test_load_project_clears_shutdown(tmp_path, monkeypatch):
    """kill_all_processes then load_project must yield live workers (finding #5)."""
    from cbas_tpu.app.api import Api
    from cbas_tpu.core.project import Project

    Project.create_project(str(tmp_path), "p")
    api = Api()
    api.state.shutdown.set()  # as left by kill_all_processes
    monkeypatch.setattr(
        "cbas_tpu.models.encoder.FrameEncoder",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("no weights")),
    )
    res = api.load_project(str(tmp_path / "p"))
    assert res["success"]
    assert not api.state.shutdown.is_set()
    assert all(w.is_alive() for w in api._workers)
    api.kill_all_processes()


def test_standardize_rejects_truncated_decode(tmp_path, monkeypatch):
    """A mid-video decode failure must not commit a partial output (finding #6)."""
    cv2 = pytest.importorskip("cv2")
    from cbas_tpu.ingest import standardize as st
    from cbas_tpu.ingest.decode import open_video

    src = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(50):
        w.write(np.full((64, 64, 3), i, np.uint8))
    w.release()

    real_open = st.open_video

    class Truncating:
        def __init__(self, inner):
            self._r = inner
            self.fps = inner.fps
            self.frame_count = inner.frame_count

        def read_batch(self, start, count):
            if start >= 20:
                return np.zeros((0, 64, 64, 3), np.uint8)  # decoder dies
            return self._r.read_batch(start, min(count, 20 - start))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._r.close()

    monkeypatch.setattr(st, "open_video", lambda p: Truncating(real_open(p)))
    dst = str(tmp_path / "out.mp4")
    with pytest.raises(IOError, match="truncated"):
        st.standardize_video(src, dst, fps=10, resolution=32)
    assert not os.path.exists(dst)
    assert not os.path.exists(dst + ".tmp.mp4")


def test_disagreement_report_generated_by_orchestrator(tmp_path):
    """generate_disagreements=True must actually write the report (finding #4)."""
    from cbas_tpu.core.config import TrainingConfig
    from cbas_tpu.core.project import Project
    from cbas_tpu.engine.orchestrator import run_training_job

    proj = Project.create_project(str(tmp_path), "p")
    rng = np.random.default_rng(0)
    ds = proj.create_dataset("d", ["a", "b"], [])
    labels = {"a": [], "b": []}
    for s in range(8):
        rel = f"recordings/s/m{s}/m{s}_00001.mp4"
        os.makedirs(os.path.join(proj.path, os.path.dirname(rel)), exist_ok=True)
        open(os.path.join(proj.path, rel), "wb").close()
        h5 = h5_path_for_video(os.path.join(proj.path, rel))
        feats = np.concatenate([
            rng.normal(2, 1, (60, DIM)), rng.normal(-2, 1, (60, DIM))
        ]).astype(np.float16)
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=DIM) as w:
            w.append(feats)
        labels["a"].append({"video": rel, "start": 5, "end": 40, "label": "a"})
        labels["b"].append({"video": rel, "start": 65, "end": 100, "label": "b"})
    # One deliberately wrong label so a disagreement block must exist.
    labels["b"].append({"video": "recordings/s/m0/m0_00001.mp4",
                        "start": 10, "end": 20, "label": "b"})
    ds.labels["labels"] = labels
    ds.save_labels()
    proj.reload()

    task = TrainingConfig(
        name="d", behaviors=["a", "b"], batch_size=64, learning_rate=5e-3,
        epochs=2, sequence_length=7, num_runs=1, num_trials=1,
        use_test=False, test_split=0.0, lstm_hidden_size=8,
    )
    model_dir = run_training_job(proj, task, seed=5, generate_disagreements=True)
    assert model_dir
    report = os.path.join(ds.path, "disagreement_report.yaml")
    assert os.path.exists(report)
    import yaml

    items = yaml.safe_load(open(report))
    assert isinstance(items, list) and items  # the injected error was flagged


def test_encode_sentinel_survives_full_queue(tmp_path, monkeypatch):
    """If the prefetch queue is full when the decoder finishes, the sentinel
    must still reach the consumer (a dropped sentinel deadlocks encode_file)."""
    import time

    from cbas_tpu.core.config import EncodeConfig
    from cbas_tpu.engine import encode as enc_mod

    n_frames, chunk = 8, 2  # 4 chunks through a 1-slot queue

    class FakeReader:
        fps = 10.0

        def __len__(self):
            return n_frames

        def read_green_batch(self, start, n):
            return np.zeros((n, 4, 4), np.uint8)

        def close(self):
            pass

    class SlowEncoder:
        identifier = "fake"
        embed_dim = DIM

        def encode_planes_async(self, planes, batch=None):
            time.sleep(0.15)  # consumer lags so the queue stays full
            return np.zeros((len(planes), DIM), np.float16), len(planes), True

        @staticmethod
        def to_host(pending):
            return pending[0][: pending[1]]

    monkeypatch.setattr(enc_mod, "open_video", lambda p: FakeReader())
    video = str(tmp_path / "recordings/s/m0/v.mp4")
    os.makedirs(os.path.dirname(video), exist_ok=True)
    open(video, "wb").close()

    done = []

    def run():
        done.append(
            enc_mod.encode_file(
                SlowEncoder(), video,
                config=EncodeConfig(chunk_frames=chunk, prefetch_chunks=1),
            )
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "encode_file deadlocked waiting for the sentinel"
    assert done and done[0] and os.path.exists(done[0])
    assert hdf5_store.num_frames(done[0]) == n_frames

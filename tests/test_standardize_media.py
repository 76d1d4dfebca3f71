"""Import/standardize/augment + media helper tests."""

import base64
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.app.media import grab_frame, video_thumbnail
from cbas_tpu.core.project import Project
from cbas_tpu.ingest.decode import open_video, probe
from cbas_tpu.ingest.standardize import (
    aug_path_for,
    augment_dataset,
    augment_frame,
    augment_video,
    crop_fractional,
    fit_square,
    import_videos,
    is_aug_video,
    resync_aug_labels,
    standardize_video,
)


def write_video(path, n=40, w=64, h=48, fps=20):
    wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(0)
    for i in range(n):
        frame = rng.integers(0, 256, (h, w, 3), np.uint8)
        frame[:, :, 0] = i * 5 % 256
        wtr.write(frame)
    wtr.release()
    return path


def test_crop_and_fit():
    frame = np.zeros((100, 200, 3), np.uint8)
    frame[:, 100:, :] = 255
    cropped = crop_fractional(frame, (0.5, 0.0, 0.5, 1.0))
    assert cropped.shape == (100, 100, 3) and cropped.min() == 255

    stretched = fit_square(frame, 64, stretch=True)
    assert stretched.shape == (64, 64, 3)
    padded = fit_square(frame, 64, stretch=False)
    assert padded.shape == (64, 64, 3)
    # Aspect-preserving: 200x100 -> 64x32 centered, rows 0-15 and 48-63 black.
    assert padded[:16].max() == 0 and padded[-16:].max() == 0


def test_standardize_video_fps_and_geometry(tmp_path):
    src = write_video(str(tmp_path / "src.mp4"), n=40, w=64, h=48, fps=20)
    dst = str(tmp_path / "out.mp4")
    standardize_video(src, dst, fps=10, resolution=32, stretch=False)
    info = probe(dst)
    assert (info["width"], info["height"]) == (32, 32)
    assert info["fps"] == pytest.approx(10, abs=0.5)
    # 2 seconds of source -> ~20 frames at 10 fps.
    assert abs(info["frame_count"] - 20) <= 1


def test_import_videos_copy_and_standardize(tmp_path):
    src = write_video(str(tmp_path / "in.mp4"))
    dest = str(tmp_path / "imported")
    out = import_videos([src], dest, standardize=False)
    assert out and os.path.getsize(out[0]) == os.path.getsize(src)
    out2 = import_videos([src], str(tmp_path / "imported2"), standardize=True, resolution=32)
    assert probe(out2[0])["width"] == 32


def test_augment_frame_semantics():
    frame = np.full((8, 8, 3), 128, np.uint8)
    frame[:, 0, :] = 0  # left column black
    out = augment_frame(frame)
    # hflip: black column moves to the right; brightness/contrast raise mid-grey.
    assert out[:, -1].mean() < out[:, 0].mean()
    mid = out[4, 4]
    # (0.502-0.5)*1.1+0.5+0.03 = 0.5322 -> ~136
    assert 130 <= mid.mean() <= 142


def test_augment_video_idempotent(tmp_path):
    src = write_video(str(tmp_path / "v.mp4"), n=10)
    out = augment_video(src)
    assert out == aug_path_for(src) and os.path.exists(out)
    assert is_aug_video(out) and not is_aug_video(src)
    mtime = os.path.getmtime(out)
    assert augment_video(src) == out
    assert os.path.getmtime(out) == mtime  # resumed, not rewritten
    assert probe(out)["frame_count"] == 10


def test_augment_dataset_and_resync(tmp_path):
    proj = Project.create_project(str(tmp_path), "p")
    rec = os.path.join(proj.recordings_dir, "s", "m0")
    os.makedirs(rec)
    video = write_video(os.path.join(rec, "m0_00001.mp4"), n=10)
    rel = os.path.relpath(video, proj.path)
    ds = proj.create_dataset("d", ["walk"], [])
    ds.labels["labels"]["walk"] = [{"video": rel, "start": 0, "end": 5, "label": "walk"}]
    ds.save_labels()
    proj.reload()

    new_ds = augment_dataset(proj, "d", "d_aug")
    assert os.path.exists(aug_path_for(video))
    insts = new_ds.labels["labels"]["walk"]
    assert len(insts) == 2
    videos = {i["video"] for i in insts}
    assert rel in videos and any(v.endswith("_aug.mp4") for v in videos)

    # Resync drops stale aug labels and recopies from sources.
    proj.reload()
    n = resync_aug_labels(proj, "d_aug")
    assert n == 1
    assert len(proj.datasets["d_aug"].labels["labels"]["walk"]) == 2


def test_thumbnail_and_grab(tmp_path):
    src = write_video(str(tmp_path / "v.mp4"), n=5)
    thumb = video_thumbnail(src, size=32)
    raw = base64.b64decode(thumb)
    assert raw[:2] == b"\xff\xd8"  # JPEG SOI
    assert grab_frame(str(tmp_path / "missing.mp4")) is None


def test_grab_frames_parallel(tmp_path):
    from cbas_tpu.app.media import grab_frames_parallel

    sources = {}
    for i in range(4):
        sources[f"cam{i}"] = (write_video(str(tmp_path / f"v{i}.mp4"), n=3), (32, 32))
    sources["dead"] = (str(tmp_path / "missing.mp4"), (32, 32))
    out = grab_frames_parallel(sources, max_workers=3)
    assert set(out) == set(sources)
    assert out["dead"] is None
    for i in range(4):
        assert base64.b64decode(out[f"cam{i}"])[:2] == b"\xff\xd8"
    assert grab_frames_parallel({}) == {}


def test_live_preview_emits_end_event(tmp_path):
    """LivePreview always fires on_end when the stream finishes — timeout,
    stop(), or source exhaustion — so the UI can reset its preview state
    (reference end_live_preview, record_page.js:223-231)."""
    import threading

    from cbas_tpu.app.media import LivePreview

    src = write_video(str(tmp_path / "clip.mp4"), n=10, w=32, h=32)
    frames, ended = [], threading.Event()
    p = LivePreview(src, on_frame=frames.append, max_fps=1000.0,
                    on_end=ended.set, timeout_s=5.0)
    p.start()
    assert ended.wait(10.0), "on_end never fired after the source ran out"
    assert frames, "no frames were emitted from a readable source"

    # unreadable source: no frames, but on_end still fires
    ended2 = threading.Event()
    p2 = LivePreview(str(tmp_path / "missing.mp4"), on_frame=frames.append,
                     on_end=ended2.set, timeout_s=2.0)
    p2.start()
    assert ended2.wait(10.0)


def test_standardize_tolerates_metadata_overcount(tmp_path, monkeypatch):
    """Containers routinely promise a few more frames than decode delivers
    (VFR / truncated tails): a small shortfall commits the shorter output
    instead of making the video permanently unimportable (r3 review finding);
    a LARGE mid-video decoder death still refuses to commit."""
    from cbas_tpu.ingest import standardize as st

    src = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(50):
        w.write(np.full((64, 64, 3), i, np.uint8))
    w.release()

    real_open = st.open_video

    class Overcounting:
        """Claims 2 more frames than it can decode (metadata overcount)."""

        def __init__(self, inner):
            self._r = inner
            self.fps = inner.fps
            self.frame_count = inner.frame_count + 2

        def read_batch(self, start, count):
            return self._r.read_batch(start, count)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._r.close()

    monkeypatch.setattr(st, "open_video", lambda p: Overcounting(real_open(p)))
    dst = str(tmp_path / "out.mp4")
    out = st.standardize_video(src, dst, fps=10, resolution=32)
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 50  # the really-decodable frames, not the promised 52


def test_augment_dataset_no_duplicate_labels_on_chained_aug(tmp_path):
    """Augmenting a dataset that ALREADY holds aug instances (e.g. one that
    went through a previous augment/resync) must not append a second copy of
    each aug instance (r3 review finding: double-weighted training windows)."""
    proj = Project.create_project(str(tmp_path), "p")
    rec = os.path.join(proj.recordings_dir, "s", "m0")
    os.makedirs(rec)
    video = write_video(os.path.join(rec, "m0_00001.mp4"), n=10)
    rel = os.path.relpath(video, proj.path)
    ds = proj.create_dataset("d", ["walk"], [])
    ds.labels["labels"]["walk"] = [{"video": rel, "start": 0, "end": 5, "label": "walk"}]
    ds.save_labels()
    proj.reload()

    first = augment_dataset(proj, "d", "d_aug")
    assert len(first.labels["labels"]["walk"]) == 2  # src + aug
    proj.reload()
    chained = augment_dataset(proj, "d_aug", "d_aug2")
    insts = chained.labels["labels"]["walk"]
    assert len(insts) == 2  # NOT 3: the existing aug instance is not re-added
    assert len({(i["video"], i["start"], i["end"]) for i in insts}) == 2


def test_import_videos_uniquifies_basename_collisions(tmp_path):
    """Two sources sharing a basename must both survive the import instead of
    the second silently clobbering the first (r3 review finding)."""
    os.makedirs(str(tmp_path / "camA")); os.makedirs(str(tmp_path / "camB"))
    a = write_video(str(tmp_path / "camA" / "v.mp4"), n=3)
    b = write_video(str(tmp_path / "camB" / "v.mp4"), n=3)
    dest = str(tmp_path / "dest")
    out = import_videos([a, b], dest, standardize=False)
    assert len(out) == 2 and len(set(out)) == 2
    assert all(os.path.exists(p) for p in out)

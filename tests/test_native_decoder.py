"""Native C++ decoder tests: parity with the OpenCV backend on real videos."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.ingest.decode import OpenCVVideoReader, open_video
from cbas_tpu.ingest.native import loader


pytestmark = pytest.mark.skipif(
    not loader.is_available(), reason="native decoder not built"
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    rng = np.random.default_rng(0)
    for i in range(75):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, :, 1] = (i * 3) % 256         # green encodes the frame index
        frame[:, :, 0] = rng.integers(0, 255)  # noise in other channels
        w.write(frame)
    w.release()
    return path


def test_metadata(video):
    r = loader.NativeVideoReader(video)
    assert (r.width, r.height) == (64, 48)
    assert r.frame_count == 75
    assert r.fps == pytest.approx(10, abs=0.1)
    r.close()


def test_sequential_and_random_access_match_cv2(video):
    native = loader.NativeVideoReader(video)
    ref = OpenCVVideoReader(video)
    # Sequential
    a = native.read_batch(0, 20)
    b = ref.read_batch(0, 20)
    assert a.shape == b.shape == (20, 48, 64, 3)
    # Codecs may dither chroma differently; the luma-dominant green plane of
    # our synthetic frames must match closely.
    assert np.abs(a[:, :, :, 1].astype(int) - b[:, :, :, 1].astype(int)).mean() < 2.0

    # Backward seek
    a2 = native.read_batch(5, 10)
    np.testing.assert_array_equal(a2, a[5:15])
    # Far forward seek
    a3 = native.read_batch(60, 10)
    b3 = ref.read_batch(60, 10)
    assert np.abs(a3[:, :, :, 1].astype(int) - b3[:, :, :, 1].astype(int)).mean() < 2.0
    # Read past EOF truncates
    tail = native.read_batch(70, 20)
    assert tail.shape[0] == 5
    native.close()
    ref.close()


def test_green_plane_matches_rgb(video):
    r = loader.NativeVideoReader(video)
    rgb = r.read_batch(10, 5)
    green = r.read_green_batch(10, 5)
    np.testing.assert_array_equal(green, rgb[:, :, :, 1])
    r.close()


def test_open_video_prefers_native(video):
    r = open_video(video, backend="native")
    assert isinstance(r, loader.NativeVideoReader)
    r.close()
    r2 = open_video(video, backend="auto")
    assert isinstance(r2, loader.NativeVideoReader)
    r2.close()


def test_frame_content_is_frame_indexed(video):
    """Green channel encodes the frame index -> verifies seek addressing."""
    r = loader.NativeVideoReader(video)
    for idx in (0, 7, 33, 74):
        frame = r.read_batch(idx, 1)[0]
        expected = (idx * 3) % 256
        assert abs(int(np.median(frame[:, :, 1])) - expected) <= 2, idx
    r.close()


def test_open_video_rejects_unknown_backend(video):
    with pytest.raises(ValueError):
        open_video(video, backend="natve")  # typo must not silently degrade


def test_open_video_auto_falls_back_on_zero_frame_count(video, monkeypatch):
    """Containers with neither nb_frames nor a duration make libav report 0
    frames; 'auto' must hand such files to cv2 (whose scan-count still counts
    them) instead of letting encode_file skip the video as empty."""
    from cbas_tpu.ingest import decode as decode_mod

    class _ZeroCount(loader.NativeVideoReader):
        def __init__(self, path):
            super().__init__(path)
            self.frame_count = 0

    monkeypatch.setattr(loader, "NativeVideoReader", _ZeroCount)
    r = decode_mod.open_video(video, backend="auto")
    assert isinstance(r, decode_mod.OpenCVVideoReader)
    assert r.frame_count == 75
    r.close()
    # explicit "native" returns what native sees (caller asked for it)
    r2 = decode_mod.open_video(video, backend="native")
    assert isinstance(r2, _ZeroCount)
    r2.close()

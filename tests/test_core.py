"""Tests for config, HDF5 store, label tools, and the project data model."""

import os

import numpy as np
import pandas as pd
import pytest

from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import CameraSettings, TrainingConfig, dump_yaml, load_yaml
from cbas_tpu.core.labels import (
    analyze_label_conflicts,
    clean_and_sort_labels,
    coverage_report,
    predictions_to_instances,
    predictions_to_instances_with_confidence,
    subtract_intervals,
)
from cbas_tpu.core.project import Project
from cbas_tpu.utils.naming import (
    h5_path_for_video,
    natural_sort_outputs,
    outputs_csv_for_h5,
    sort_videos_by_segment,
)


# -- config ------------------------------------------------------------------

def test_camera_settings_roundtrip(tmp_path):
    cam = CameraSettings(name="cam1", rtsp_url="rtsp://h/profile1", framerate=15)
    p = str(tmp_path / "config.yaml")
    dump_yaml(cam.to_dict(), p)
    loaded = CameraSettings.from_dict(load_yaml(p))
    assert loaded == cam
    assert loaded.record_url == "rtsp://h/profile0"


def test_training_config_validation():
    with pytest.raises(ValueError):
        TrainingConfig(sequence_length=30)
    with pytest.raises(ValueError):
        TrainingConfig(training_method="nope")
    cfg = TrainingConfig(name="d", behaviors=["a"], sequence_length=31)
    assert TrainingConfig.from_dict(cfg.to_dict()) == cfg


# -- naming -------------------------------------------------------------------

def test_naming_contract():
    assert h5_path_for_video("/x/cam_00001.mp4") == "/x/cam_00001_cls.h5"
    assert outputs_csv_for_h5("/x/cam_00001_cls.h5", "m") == "/x/cam_00001_m_outputs.csv"
    vids = ["/x/c_00010.mp4", "/x/c_00002.mp4", "/x/c_00001.mp4"]
    assert sort_videos_by_segment(vids)[0].endswith("00001.mp4")
    csvs = ["/x/c_00010_m_outputs.csv", "/x/c_00002_m_outputs.csv"]
    assert natural_sort_outputs(csvs, "m")[0].endswith("00002_m_outputs.csv")


# -- hdf5 store ---------------------------------------------------------------

def test_embedding_writer_atomic_and_stamped(tmp_path):
    out = str(tmp_path / "v_cls.h5")
    with hdf5_store.EmbeddingWriter(out, encoder_identifier="enc-x") as w:
        assert not os.path.exists(out)  # only the .tmp exists mid-write
        w.append(np.ones((10, 768), np.float32))
        w.append(np.zeros((5, 768), np.float16))
    assert os.path.exists(out) and not os.path.exists(out + ".tmp")
    assert hdf5_store.num_frames(out) == 15
    assert hdf5_store.encoder_stamp(out) == "enc-x"
    assert hdf5_store.is_stamp_valid(out, "enc-x")
    assert not hdf5_store.is_stamp_valid(out, "other-enc")
    data = hdf5_store.read_all(out)
    assert data.dtype == np.float16 and data.shape == (15, 768)
    assert np.all(data[:10] == 1) and np.all(data[10:] == 0)


def test_embedding_writer_failure_cleans_tmp(tmp_path):
    out = str(tmp_path / "v_cls.h5")
    try:
        with hdf5_store.EmbeddingWriter(out, encoder_identifier="e") as w:
            w.append(np.ones((2, 768)))
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not os.path.exists(out) and not os.path.exists(out + ".tmp")


def test_handle_cache_reads_and_closes(tmp_path):
    out = str(tmp_path / "v_cls.h5")
    with hdf5_store.EmbeddingWriter(out, encoder_identifier="e") as w:
        w.append(np.arange(20 * 768, dtype=np.float32).reshape(20, 768) % 7)
    cache = hdf5_store.HandleCache()
    win = cache.read_window(out, 3, 8)
    assert win.shape == (5, 768)
    assert len(cache) == 1
    cache.close_all()
    assert len(cache) == 0


# -- labels -------------------------------------------------------------------

def _prob_df(rows):
    return pd.DataFrame(rows, columns=["walk", "rest"])


def test_predictions_to_instances_threshold():
    df = _prob_df([[0.9, 0.1], [0.8, 0.2], [0.4, 0.6], [0.1, 0.9], [0.95, 0.05]])
    insts = predictions_to_instances(df, ["walk", "rest"], "v.mp4", threshold=0.7)
    assert insts == [
        {"video": "v.mp4", "start": 0, "end": 1, "label": "walk"},
        {"video": "v.mp4", "start": 3, "end": 3, "label": "rest"},
        {"video": "v.mp4", "start": 4, "end": 4, "label": "walk"},
    ]


def test_predictions_with_confidence_blocks_and_smoothing():
    df = _prob_df([[0.9, 0.1], [0.8, 0.2], [0.3, 0.7], [0.9, 0.1], [0.85, 0.15]])
    insts, ann = predictions_to_instances_with_confidence(df, ["walk", "rest"], "v.mp4")
    assert [i["label"] for i in insts] == ["walk", "rest", "walk"]
    assert insts[0]["confidence"] == pytest.approx((0.9 + 0.8) / 2)
    # Median smoothing (k=3) flips the lone 'rest' frame back to 'walk'.
    insts_s, _ = predictions_to_instances_with_confidence(
        df, ["walk", "rest"], "v.mp4", smoothing_window=3
    )
    assert [i["label"] for i in insts_s] == ["walk"]
    assert insts_s[0] == {
        "video": "v.mp4",
        "start": 0,
        "end": 4,
        "label": "walk",
        "confidence": pytest.approx(np.mean([0.9, 0.8, 0.7, 0.9, 0.85])),
    }


def test_subtract_intervals():
    inst = {"video": "v", "start": 10, "end": 30, "label": "walk"}
    pieces = subtract_intervals(inst, [(15, 20), (28, 40)])
    assert [(p["start"], p["end"]) for p in pieces] == [(10, 14), (21, 27)]
    assert subtract_intervals(inst, [(0, 100)]) == []


def test_clean_and_sort_labels_dedupes_trims_merges():
    doc = {
        "behaviors": ["a", "b"],
        "labels": {
            "a": [
                {"video": "v.mp4", "start": 0, "end": 10, "label": "a"},
                {"video": "v.mp4", "start": 0, "end": 10, "label": "a"},  # dup
                {"video": "v.mp4", "start": 11, "end": 14, "label": "a"},  # adjacent: merge
            ],
            "b": [
                {"video": "v.mp4", "start": 5, "end": 20, "label": "b"},  # overlaps a: trim
            ],
        },
    }
    conflicts = analyze_label_conflicts(doc)
    assert conflicts["total_duplicates"] == 1
    assert conflicts["total_overlaps"] >= 1

    cleaned = clean_and_sort_labels(doc)
    a_insts = cleaned["labels"]["a"]
    b_insts = cleaned["labels"]["b"]
    # First-wins by start: a(0,10) survives; b(5,20) trims to (11,20); the
    # later a(11,14) is fully covered by the trimmed b and is dropped.
    assert [(i["start"], i["end"]) for i in a_insts] == [(0.0, 10.0)]
    assert [(i["start"], i["end"]) for i in b_insts] == [(11.0, 20.0)]
    # Idempotent.
    assert clean_and_sort_labels(cleaned) == cleaned


def test_coverage_report():
    doc = {
        "labels": {
            "walk": [
                {"video": "rec/s1/v.mp4", "start": 0, "end": 9, "label": "walk"},
                {"video": "rec/s2/v.mp4", "start": 0, "end": 4, "label": "walk"},
            ]
        }
    }
    rep = coverage_report(doc, ["walk", "rest"])
    assert rep["rec/s1"] == {"walk": 10, "rest": 0}
    assert rep["rec/s2"] == {"walk": 5, "rest": 0}


# -- project ------------------------------------------------------------------

def make_project(tmp_path) -> Project:
    proj = Project.create_project(str(tmp_path), "proj")
    assert proj is not None
    return proj


def test_project_create_and_scan(tmp_path):
    proj = make_project(tmp_path)
    assert os.path.isdir(proj.recordings_dir)
    assert proj.encoder_model_identifier == "facebook/dinov2-with-registers-base"
    # duplicate create fails
    assert Project.create_project(str(tmp_path), "proj") is None

    cam = proj.create_camera("cam1", {"rtsp_url": "rtsp://x", "framerate": 10})
    assert cam is not None and proj.create_camera("cam1", {}) is None

    ds = proj.create_dataset("ds1", ["walk", "rest"], [])
    assert ds is not None
    assert ds.behaviors == ["walk", "rest"]
    assert ds.all_instances() == []

    # reload rediscovers entities from disk
    proj2 = Project(proj.path)
    assert "cam1" in proj2.cameras and "ds1" in proj2.datasets


def test_project_recording_scan_and_stale_sweep(tmp_path):
    proj = make_project(tmp_path)
    rec_dir = os.path.join(proj.recordings_dir, "sess1", "mouse1")
    os.makedirs(rec_dir)
    v1 = os.path.join(rec_dir, "mouse1_00001.mp4")
    v2 = os.path.join(rec_dir, "mouse1_00002.mp4")
    for v in (v1, v2):
        with open(v, "wb") as f:
            f.write(b"\x00")
    # v1 gets a valid stamped h5; v2 stays unencoded
    with hdf5_store.EmbeddingWriter(
        h5_path_for_video(v1), encoder_identifier=proj.encoder_model_identifier
    ) as w:
        w.append(np.zeros((4, 768)))

    proj.reload()
    rec = proj.recordings["sess1"]["mouse1"]
    assert rec.video_files == [v1, v2]
    assert rec.unencoded_files == [v2]
    assert proj.stale_or_missing_embeddings() == [v2]


def test_dataset_instance_counts(tmp_path):
    proj = make_project(tmp_path)
    ds = proj.create_dataset("d", ["walk"], [])
    ds.labels["labels"]["walk"] = [
        {"video": f"recordings/s/m{k}/v.mp4", "start": 0, "end": 9, "label": "walk"}
        for k in range(5)
    ]
    ds.save_labels()
    ds.update_instance_counts_in_config()
    metrics = ds.config["metrics"]["walk"]
    # 5 subjects, 80/20 split -> 4 train + 1 test subjects, 10 frames each.
    assert metrics["Train Inst (Frames)"] == "4 (40)"
    assert metrics["Test Inst (Frames)"] == "1 (10)"


def test_canonical_encoder_identity_fingerprints_local_checkpoints(tmp_path):
    """Same directory name, different weights -> different identities (no
    silent head-on-foreign-embeddings); same content anywhere -> equal;
    HF ids and bare stamp strings pass through untouched."""
    import json

    from cbas_tpu.utils.naming import canonical_encoder_identity as cid

    def mk(parent, blob):
        d = parent / "encoder"
        d.mkdir(parents=True)
        (d / "config.json").write_text(json.dumps({"hidden_size": 8}))
        (d / "model.safetensors").write_bytes(blob)
        return str(d)

    a = mk(tmp_path / "a", b"\x01" * 100)
    b = mk(tmp_path / "b", b"\x02" * 100)
    c = mk(tmp_path / "c", b"\x01" * 100)
    ia, ib, ic = cid(a), cid(b), cid(c)
    assert ia.startswith("encoder#") and ib.startswith("encoder#")
    assert ia != ib          # same name, different weights: must mismatch
    assert ia == ic          # content-identical: portable across locations
    assert cid("facebook/dinov3-vitb16") == "facebook/dinov3-vitb16"
    assert cid("demo_encoder#99673524") == "demo_encoder#99673524"
    # foreign absolute path (doesn't exist here): bare basename, which never
    # equals a fingerprinted local identity -> safe re-encode
    assert cid("/some/other/host/encoder") == "encoder"


def test_legacy_fingerprint_stamps_still_validate(tmp_path):
    """Stamps written by the pre-strided (head-64KiB-only) fingerprint must
    keep validating after an upgrade — otherwise every unchanged checkpoint
    would queue a full library re-encode (r3 review finding)."""
    import hashlib
    import json

    from cbas_tpu.utils.naming import (
        canonical_encoder_identity as cid,
        encoder_identity_candidates,
        identities_equivalent,
    )

    d = tmp_path / "encoder"
    d.mkdir()
    cfg_bytes = json.dumps({"hidden_size": 8}).encode()
    # > 2*64KiB so the strided algorithm reads middle+tail and DIFFERS from
    # the legacy head-only hash
    blob = bytes(range(256)) * 1024  # 256 KiB
    (d / "config.json").write_bytes(cfg_bytes)
    (d / "model.safetensors").write_bytes(blob)

    # reproduce the legacy (r2) algorithm independently
    h = hashlib.sha256()
    for name, data in (("config.json", cfg_bytes), ("model.safetensors", blob)):
        h.update(name.encode())
        h.update(str(len(data)).encode())
        h.update(data[:65536])
    legacy_stamp = f"encoder#{h.hexdigest()[:8]}"

    primary = cid(str(d))
    assert primary != legacy_stamp  # the algorithms genuinely diverge here
    assert legacy_stamp in encoder_identity_candidates(str(d))
    assert identities_equivalent(legacy_stamp, str(d))      # old stamp, new code
    assert identities_equivalent(primary, str(d))           # new stamp
    assert not identities_equivalent("encoder#deadbeef", str(d))  # wrong content


def test_classifications_bind_to_longest_video_stem(tmp_path):
    """cam_00001_aug's outputs must not parse as phantom model 'aug_m' on
    cam_00001 (review r3 finding: first prefix match won by scandir order)."""
    from cbas_tpu.core.project import Recording

    d = tmp_path / "rec"
    d.mkdir()
    for name in ("cam_00001.mp4", "cam_00001_aug.mp4",
                 "cam_00001_aug_m_outputs.csv", "cam_00001_m_outputs.csv"):
        (d / name).write_bytes(b"x")
    rec = Recording(str(d))
    assert set(rec.classifications) == {"m"}
    assert len(rec.classifications["m"]) == 2


def test_project_settings_encode_section_roundtrip(tmp_path):
    """The encode: YAML section (reuse_threshold etc.) loads into typed
    EncodeConfig and survives a settings round-trip."""
    from cbas_tpu.core.config import ProjectSettings, dump_yaml, load_yaml

    s = ProjectSettings.from_dict(
        {"encoder_model_identifier": "enc",
         "encode": {"reuse_threshold": 2.5, "chunk_frames": 128}}
    )
    assert s.encode.reuse_threshold == 2.5 and s.encode.chunk_frames == 128
    assert s.encode.h5_chunk_rows == 8192  # unspecified fields keep defaults

    p = tmp_path / "cbas_config.yaml"
    dump_yaml(s.to_dict(), str(p))
    s2 = ProjectSettings.from_dict(load_yaml(str(p)))
    assert s2.encode.reuse_threshold == 2.5
    # default settings leave reuse off (exact dense parity)
    assert ProjectSettings().encode.reuse_threshold == 0.0


def test_example_config_parses_into_project_settings():
    """examples/cbas_config.yaml.example (the reference's
    cbas_config.yaml.example analogue) must stay loadable by the typed
    config tree — it's the documented starting point for users."""
    from cbas_tpu.core.config import ProjectSettings, load_yaml

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "cbas_config.yaml.example")
    s = ProjectSettings.from_dict(load_yaml(path))
    assert s.encoder_model_identifier == "facebook/dinov2-with-registers-base"
    assert s.runtime.mesh_axis_names == ["data"]
    assert s.encode.chunk_frames == 480 and s.encode.reuse_threshold == 0.0


def test_clean_same_label_overlap_unions_instead_of_losing_frames():
    """walk[0,10] + walk[5,20] must clean to walk[0,20] — the reference drops
    the overlapping piece wholesale (label_train_page.py:920), permanently
    losing frames 11-20 of user labels; we deviate (documented) and union."""
    doc = {
        "behaviors": ["walk"],
        "labels": {"walk": [
            {"video": "v.mp4", "start": 0, "end": 10, "label": "walk"},
            {"video": "v.mp4", "start": 5, "end": 20, "label": "walk"},
        ]},
    }
    cleaned = clean_and_sort_labels(doc)
    assert [(i["start"], i["end"]) for i in cleaned["labels"]["walk"]] == [(0.0, 20.0)]
    assert clean_and_sort_labels(cleaned) == cleaned  # still idempotent


def test_dataset_normalizes_null_behavior_lists(tmp_path):
    """A hand-edited labels.yaml with `behavior:` (YAML null) must read as an
    empty list so every labels-iterating consumer (labeling session, label
    sets, training manifests, augmentation) survives the file."""
    from cbas_tpu.core.project import Dataset, Project

    proj = Project.create_project(str(tmp_path), "p")
    proj.create_dataset("beh", ["walk", "rest"], [])
    ds_path = os.path.join(proj.datasets_dir, "beh")
    with open(os.path.join(ds_path, "labels.yaml"), "w") as f:
        f.write(
            "behaviors:\n- walk\n- rest\nlabels:\n  walk:\n  rest:\n"
            "  - {video: v.mp4, start: 0, end: 3, label: rest}\n"
        )
    ds = Dataset(ds_path)
    assert ds.labels["labels"]["walk"] == []
    assert len(ds.labels["labels"]["rest"]) == 1
    assert len(ds.all_instances()) == 1
    # a labels.yaml whose labels: key itself is null heals to an empty dict
    with open(os.path.join(ds_path, "labels.yaml"), "w") as f:
        f.write("behaviors:\n- walk\nlabels:\n")
    assert Dataset(ds_path).labels["labels"] == {}

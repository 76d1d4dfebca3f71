"""API surface tests on a synthetic project (headless)."""

import os
import time

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cbas_tpu.app.api import Api
from cbas_tpu.app.preflight import (
    check_dataset_files_ready,
    get_disagreement_playlist,
    run_preflight_check,
)
from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import dump_yaml
from cbas_tpu.core.project import Project
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.vit import ViTConfig, init_vit_params
from cbas_tpu.utils.naming import h5_path_for_video

RES = 32
SMALL_CFG = ViTConfig(
    variant="dinov3", hidden_size=64, num_layers=2, num_heads=2, patch_size=16,
    num_register_tokens=4, intermediate_size=128, layer_norm_eps=1e-5,
)


@pytest.fixture
def api(tmp_path, monkeypatch):
    proj_dir = str(tmp_path)
    proj = Project.create_project(proj_dir, "p")

    # 4 subjects with real videos + labels
    for s in range(4):
        rec = os.path.join(proj.recordings_dir, "sess", f"m{s}")
        os.makedirs(rec)
        video = os.path.join(rec, f"m{s}_00001.mp4")
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
        for i in range(30):
            w.write(np.full((RES, RES, 3), (i * 8) % 255, np.uint8))
        w.release()

    ds = proj.create_dataset("d", ["walk", "rest"], [])
    labels = {"walk": [], "rest": []}
    for s in range(4):
        rel = f"recordings/sess/m{s}/m{s}_00001.mp4"
        labels["walk"].append({"video": rel, "start": 2, "end": 10, "label": "walk"})
        labels["rest"].append({"video": rel, "start": 15, "end": 25, "label": "rest"})
    ds.labels["labels"] = labels
    ds.save_labels()

    # Patch FrameEncoder loading to a tiny random model (no HF cache available).
    params = jax.device_get(init_vit_params(jax.random.key(0), SMALL_CFG))

    def fake_encoder(identifier, **kw):
        return FrameEncoder(identifier, params=params, cfg=SMALL_CFG,
                            compute_dtype=jnp.float32, mesh=kw.get("mesh"))

    monkeypatch.setattr("cbas_tpu.models.encoder.FrameEncoder", fake_encoder)

    api = Api()
    res = api.load_project(proj.path)
    assert res["success"]
    yield api
    api.kill_all_processes()


def test_load_project_sweeps_and_starts_workers(api):
    assert api.get_project_root().endswith("/p")
    status = api.get_cbas_status()
    assert status["project_loaded"] and status["encoder_ready"]
    # 4 unencoded videos were queued by the stale sweep.
    q = api.get_encoding_queue_status()
    assert q["total"] == 4


def test_camera_crud(api):
    assert api.create_camera("cam1", {"rtsp_url": "rtsp://x", "framerate": 10})
    assert not api.create_camera("cam1", {})
    assert api.get_camera_settings("cam1")["framerate"] == 10
    assert api.save_camera_settings("cam1", {"rtsp_url": "rtsp://y", "framerate": 15})
    assert api.get_camera_settings("cam1")["framerate"] == 15
    assert [c["name"] for c in api.get_camera_list()] == ["cam1"]
    assert api.save_all_camera_settings({"segment_seconds": 300})
    assert api.get_camera_settings("cam1")["segment_seconds"] == 300
    # name -> start-time dict, so the UI can render elapsed recording timers
    # (reference: record_page.py:437-447)
    assert api.get_active_streams() == {}
    assert api.delete_camera("cam1") and api.get_camera_list() == []


def test_rename_camera(api):
    import yaml

    assert api.create_camera("cam1", {"rtsp_url": "rtsp://x", "framerate": 10})
    assert api.create_camera("cam2", {"rtsp_url": "rtsp://y"})
    # collision with an existing camera refuses (reference:
    # record_page.py:329-332)
    assert not api.rename_camera("cam1", "cam2")
    # rename moves cameras/<old>/ and rewrites the config name
    assert api.rename_camera("cam1", "camA")
    assert {c["name"] for c in api.get_camera_list()} == {"camA", "cam2"}
    proj = api.state.project
    assert os.path.isdir(os.path.join(proj.cameras_dir, "camA"))
    assert not os.path.isdir(os.path.join(proj.cameras_dir, "cam1"))
    with open(os.path.join(proj.cameras_dir, "camA", "config.yaml")) as f:
        assert yaml.safe_load(f)["name"] == "camA"
    assert api.get_camera_settings("camA")["rtsp_url"] == "rtsp://x"
    # the new name becomes a path component: traversal is refused
    assert not api.rename_camera("camA", "../evil")
    # unknown source / no-op rename
    assert not api.rename_camera("ghost", "cam9")
    assert api.rename_camera("camA", "camA")
    # a from-disk reload sees the renamed camera
    assert api.reload_project_data()
    assert "camA" in {c["name"] for c in api.get_camera_list()}


def test_trees_and_labels(api):
    tree = api.get_record_tree()
    assert set(tree["sess"]) == {"m0", "m1", "m2", "m3"}
    vids = api.get_hierarchical_video_list()["sess"]["m0"]
    assert len(vids) == 1 and not vids[0]["encoded"]
    assert api.video_has_labels(os.path.join(api.state.project.path, vids[0]["path"]))

    # Whitelist-scoped video list (reference: label_train_page.py:362-400
    # filters the labeling list by the dataset's whitelisted dirs). Empty
    # whitelist = unrestricted; session-level entries cover their subjects.
    assert api.update_dataset_whitelist("d", ["sess/m1", "sess/m3"])
    scoped = api.get_hierarchical_video_list("d")
    assert set(scoped["sess"]) == {"m1", "m3"}
    assert api.update_dataset_whitelist("d", ["sess"])
    assert set(api.get_hierarchical_video_list("d")["sess"]) == {"m0", "m1", "m2", "m3"}
    assert api.update_dataset_whitelist("d", [])
    assert set(api.get_hierarchical_video_list("d")["sess"]) == {"m0", "m1", "m2", "m3"}

    cov = api.get_label_coverage_report("d")
    assert cov["recordings/sess/m0"]["walk"] == 9
    assert api.analyze_label_conflicts("d") == {
        "total_duplicates": 0, "total_overlaps": 0,
    }
    assert api.clean_and_sort_labels("d")
    insts = api.get_instances_for_behavior("d", "walk")
    assert len(insts) == 4


def test_preflight_gates(api):
    proj = api.state.project
    # H5s missing -> not ready.
    ready, msg = check_dataset_files_ready(proj, "d")
    assert not ready and ".h5" in msg
    # Preflight dry-runs the REAL splitter: 4 subjects at (0.65, 0.15, 0.2)
    # slice to val = int(0.15*4) = 0 subjects — the exact configuration the
    # old instance-fraction heuristic wrongly approved (training would then
    # run without early stopping). Must be reported invalid, naming the
    # empty validation set.
    res = run_preflight_check(proj, "d", 0.2)
    assert not res["is_valid"] and "EMPTY" in res["message"], res
    # Without a test reservation, leftovers become validation: valid.
    res_no_test = run_preflight_check(proj, "d", 0.0)
    assert res_no_test["is_valid"], res_no_test["message"]
    res2 = run_preflight_check(proj, "nope", 0.2)
    assert not res2["is_valid"]


def test_disagreement_playlist(api, tmp_path):
    proj = api.state.project
    ds = proj.datasets["d"]
    items = [
        {"video_path": "recordings/sess/m0/m0_00001.mp4", "start_frame": 1,
         "end_frame": 3, "human_label": "walk", "model_prediction": "rest",
         "model_confidence": 0.4},
        {"video_path": "recordings/sess/m0/m0_00001.mp4", "start_frame": 7,
         "end_frame": 9, "human_label": "walk", "model_prediction": "rest",
         "model_confidence": 0.9},
        {"video_path": "recordings/sess/m1/m1_00001_aug.mp4", "start_frame": 2,
         "end_frame": 4, "human_label": "rest", "model_prediction": "walk",
         "model_confidence": 0.7},
    ]
    dump_yaml(items, os.path.join(ds.path, "disagreement_report.yaml"))
    playlist = get_disagreement_playlist(proj, "d")
    # One per video (highest conf), aug remapped to canonical, sorted desc.
    assert len(playlist) == 2
    assert playlist[0]["model_confidence"] == 0.9
    assert playlist[1]["video_path"] == "recordings/sess/m1/m1_00001.mp4"


def test_labeling_via_api(api):
    proj = api.state.project
    video = os.path.join(proj.path, "recordings/sess/m0/m0_00001.mp4")
    assert api.start_labeling("d", video)
    assert api.get_current_labeling_video_path() == "recordings/sess/m0/m0_00001.mp4"
    api.jump_to_frame(27)
    api.label_frame(0)
    api.jump_to_frame(29)
    api.label_frame(0)
    result = api.save_session_labels()
    assert result["status"] == "success"
    reloaded = Project(proj.path).datasets["d"]
    spans = [(i["start"], i["end"]) for i in reloaded.labels["labels"]["walk"]
             if i["video"].endswith("m0_00001.mp4")]
    assert (27, 29) in spans


def test_dataset_management(api):
    assert api.create_dataset("d2", ["a"], [])
    assert "d2" in api.load_dataset_configs()
    assert api.update_dataset_whitelist("d2", ["sess"])
    assert api.load_dataset_configs()["d2"]["whitelist"] == ["sess"]
    assert api.recalculate_dataset_stats("d")
    assert api.delete_dataset("d2")
    assert not api.model_exists("whatever")
    assert api.get_available_models() == []


def test_visualization_endpoints(api, tmp_path):
    proj = api.state.project
    # Fake per-frame outputs for m0.
    import pandas as pd

    rec_dir = os.path.join(proj.recordings_dir, "sess", "m0")
    csv = os.path.join(rec_dir, "m0_00001_mymodel_outputs.csv")
    n = 3000
    rng = np.random.default_rng(0)
    walk = rng.uniform(0.8, 1.0, n)
    pd.DataFrame({"walk": walk, "rest": 1 - walk}).to_csv(csv, index=False)
    proj.reload()

    video = os.path.join(rec_dir, "m0_00001.mp4")
    assert api.get_predictions_for_video(video, "mymodel") == {
        "columns": ["walk", "rest"], "rows": n, "csv_path": csv,
        "model_name": "mymodel", "behaviors": ["walk", "rest"],
    }
    # One-arg reference shape: newest outputs CSV by mtime, any model.
    assert api.get_predictions_for_video(video)["model_name"] == "mymodel"
    # Sibling outputs must never win the by-mtime pick, even when newer:
    # the augmentation sibling's CSV and a longer-stem sibling video's CSV
    # both start with this video's stem + "_".
    aug_csv = os.path.join(rec_dir, "m0_00001_aug_mymodel_outputs.csv")
    pd.DataFrame({"walk": walk[:5], "rest": 1 - walk[:5]}).to_csv(aug_csv, index=False)
    sib_video = os.path.join(rec_dir, "m0_00001_retake.mp4")
    open(sib_video, "wb").close()
    sib_csv = os.path.join(rec_dir, "m0_00001_retake_othermodel_outputs.csv")
    pd.DataFrame({"walk": walk[:5], "rest": 1 - walk[:5]}).to_csv(sib_csv, index=False)
    future = time.time() + 60
    os.utime(aug_csv, (future, future))
    os.utime(sib_csv, (future, future))
    picked = api.get_predictions_for_video(video)
    assert picked["model_name"] == "mymodel" and picked["csv_path"] == csv
    for p in (aug_csv, sib_csv, sib_video):
        os.remove(p)
    # Reference-shaped zero-arg tree: [(session, [(subject, [{name,path}])])].
    ref_tree = api.get_classified_video_tree()
    assert ref_tree[0][0] == "sess"
    assert ref_tree[0][1][0] == ("m0", [{"name": "m0_00001.mp4", "path": video}])
    # Video-path ethogram (reference one-arg shape) returns {"name","blob"}.
    etho = api.generate_ethogram(video)
    assert etho and etho["name"] == "m0_00001.mp4" and etho["blob"]

    # Reference 9-positional export shape: (out_dir, session, subject, model,
    # behaviors, framerate, binsize, start_hour, threshold-as-percent).
    out_dir = str(tmp_path / "exports")
    os.makedirs(out_dir, exist_ok=True)
    path9 = api.generate_and_save_data(
        out_dir, "sess", "m0", "mymodel", ["walk"], 10, 1, 0, 50
    )
    assert path9 and path9.startswith(out_dir) and os.path.exists(path9)
    ours = api.generate_and_save_data(
        os.path.join(api.state.project.recordings_dir, "sess"),
        "m0", "mymodel", ["walk"], 10.0, 1, 0.5, out_dir,
    )
    import pandas as pd2
    assert pd2.read_csv(path9)["walk"].tolist() == pd2.read_csv(ours)["walk"].tolist()

    # Reference 4-arg playback shape (video, behaviors, colors, predictions):
    # model resolved from the newest CSV; session opens read-only.
    assert api.start_playback_session(
        video, ["walk", "rest"], ["#fff", "#000"],
        {"columns": ["walk", "rest"], "data": [[0.9, 0.1]]},
    )
    assert api.state.labeling_session is not None
    assert api.state.labeling_session.mode == "playback"
    assert api.get_inferred_session_dirs("mymodel") == ["sess"]
    assert "m0" in api.get_classified_video_tree("mymodel")["sess"]

    # The playback picker contract: VIDEO paths (not CSVs), aug siblings and
    # orphaned CSVs excluded (reference: label_train_page.py:449-466).
    aug_video = os.path.join(rec_dir, "m0_00001_aug.mp4")
    open(aug_video, "wb").close()
    pd.DataFrame({"walk": [0.9], "rest": [0.1]}).to_csv(
        os.path.join(rec_dir, "m0_00001_aug_mymodel_outputs.csv"), index=False
    )
    pd.DataFrame({"walk": [0.9], "rest": [0.1]}).to_csv(
        os.path.join(rec_dir, "m0_09999_mymodel_outputs.csv"), index=False
    )  # orphan: no m0_09999.mp4
    proj.reload()
    inferred = api.get_inferred_videos_for_session("mymodel", "sess")
    assert inferred["m0"] == [os.path.join(rec_dir, "m0_00001.mp4")]

    results = api.generate_actograms(
        root_dir=os.path.join(proj.recordings_dir, "sess"),
        subject="m0", model="mymodel", behaviors=["walk"],
        framerate=1000 / 86400, binsize_minutes=60, start_hour=0,
        threshold=0.5, lightcycle="LD", plot_acrophase=False, task_id=1,
    )
    assert results and "walk" in results

    # Stale task id suppressed.
    api.state.latest_viz_task_id = 99
    out = api.generate_actograms(
        root_dir=os.path.join(proj.recordings_dir, "sess"),
        subject="m0", model="mymodel", behaviors=["walk"],
        framerate=1000 / 86400, binsize_minutes=60, start_hour=0,
        threshold=0.5, lightcycle="LD", plot_acrophase=False, task_id=98,
    )
    # 98 becomes latest on entry, so it runs; then simulate supersession:
    assert out is not None

    path = api.generate_and_save_data(
        root_dir=os.path.join(proj.recordings_dir, "sess"),
        subject="m0", model="mymodel", behaviors=["walk", "rest"],
        framerate=1000 / 86400, binsize_minutes=60, threshold=0.5,
        out_dir=str(tmp_path),
    )
    assert path and os.path.exists(path)
    blob = api.generate_ethogram(csv, framerate=10)
    assert blob


def test_playback_session_loads_predictions_read_only(api):
    """Playback shows the MODEL's predictions through the labeling renderer
    with edits blocked (review r2 finding: model_name was ignored and the
    session stayed editable)."""
    import pandas as pd

    proj = api.state.project
    video = os.path.join(proj.recordings_dir, "sess", "m0", "m0_00001.mp4")
    csv = os.path.join(
        proj.recordings_dir, "sess", "m0", "m0_00001_playmodel_outputs.csv"
    )
    n = 30
    walk = np.zeros(n)
    walk[:15] = 0.9  # first half walk, second half rest
    pd.DataFrame({"walk": walk, "rest": 1 - walk}).to_csv(csv, index=False)

    # A model without a bundle on disk: behaviors come from the CSV columns.
    assert api.start_playback_session("d", "playmodel", video)
    s = api.session
    assert s.mode == "playback"
    pred_labels = {i["label"] for i in s.buffer if "confidence" in i}
    assert pred_labels  # predictions materialized on the timeline
    # read-only: edits and saves are rejected
    before = len(s.buffer)
    api.jump_to_frame(5)
    api.label_frame(0)
    api.jump_to_frame(8)
    api.label_frame(0)
    assert len(s.buffer) == before
    assert api.save_session_labels()["status"] == "error"
    # no predictions -> refused with an error callback
    assert not api.start_playback_session("d", "nomodel", video)


def test_read_text_file_is_project_scoped(api):
    """read_text_file serves project-internal artifacts only: absolute paths
    outside the project root (and traversal into them) return None."""
    proj = api.state.project
    inside = os.path.join(proj.path, "note.txt")
    open(inside, "w").write("hello")
    assert api.read_text_file(inside) == "hello"
    assert api.read_text_file("/etc/passwd") is None
    assert api.read_text_file(os.path.join(proj.path, "..", "..", "etc", "passwd")) is None
    assert api.read_text_file(os.path.join(proj.path, "missing.txt")) is None


def test_preflight_two_subjects_zero_test(api, tmp_path):
    """2 labeled subjects with no test reservation is a valid train/val
    split (splits.py zero-test slicer); only a test>0 run needs 3 groups."""
    proj = api.state.project
    ds = proj.create_dataset("two", ["walk"], [])
    rel = "recordings/s/m0/m0_00001.mp4"
    rel2 = "recordings/s/m1/m1_00001.mp4"
    ds.labels["labels"]["walk"] = [
        {"video": rel, "start": 0, "end": 30, "label": "walk"},
        {"video": rel2, "start": 0, "end": 30, "label": "walk"},
    ]
    ds.save_labels()
    proj.reload()
    res = run_preflight_check(proj, "two", 0.0)
    assert res["is_valid"], res["message"]
    res_t = run_preflight_check(proj, "two", 0.2)
    assert not res_t["is_valid"]


def test_preflight_ignores_stale_label_keys(api):
    """A label key absent from the config behavior list (renamed/removed
    behavior) must not change the verdict — training filters to
    task.behaviors, so preflight does too."""
    proj = api.state.project
    ds = proj.datasets["d"]
    ds.labels["labels"]["ghost_behavior"] = [
        {"video": "recordings/s/mX/mX_00001.mp4", "start": 0, "end": 5,
         "label": "ghost_behavior"},
    ]
    ds.save_labels()
    proj.reload()
    res = run_preflight_check(proj, "d", 0.0)
    assert res["is_valid"], res["message"]
    # and a null label list (hand-edited YAML) doesn't crash any consumer
    ds2 = proj.datasets["d"]
    ds2.labels["labels"]["nulled"] = None
    assert isinstance(ds2.all_instances(), list)


def test_wire_names_must_be_single_path_components(api):
    """Every Api method is HTTP-reachable; names that become path components
    must not escape the project tree (absolute paths, separators, '..')."""
    assert api.import_videos(["/nope.mp4"], "/tmp/evil", "x") == []
    assert api.import_videos(["/nope.mp4"], "..", "x") == []
    assert not api.create_camera("../outside", {"rtsp_url": "rtsp://h/s"})
    assert not api.save_camera_settings("a/b", {"rtsp_url": "rtsp://h/s"})
    assert not api.create_dataset("../d2", ["w"], [])
    assert not api.start_camera_stream("cam", "")  # blank session flattens tree
    # sane names still work
    assert api.create_dataset("ok_ds", ["w"], [])


def test_load_project_starts_selfheal_monitor(api):
    """The recording self-heal monitor must actually run (the machinery
    existed but was never started): a RecordingMonitor daemon thread is
    alive after load_project and stops on kill_all_processes."""
    import threading as _t

    names = [t.name for t in _t.enumerate()]
    assert "RecordingMonitor" in names
    assert api._monitor_stop is not None and not api._monitor_stop.is_set()
    api.kill_all_processes()
    assert api._monitor_stop.is_set()


def test_cancel_training_clears_queue(api):
    """Cancel stops the running job AND drops queued ones (reference
    workthreads.py:1069-1082) — cancelling a queued dataset must not kill
    the running job and then train the 'cancelled' one anyway."""
    from cbas_tpu.core.config import TrainingConfig

    tw = api.train_worker
    tw.queue_task(TrainingConfig(name="d", behaviors=["walk", "rest"]))
    tw.queue_task(TrainingConfig(name="d", behaviors=["walk", "rest"]))
    assert tw.pending() == 2
    api.cancel_training_task("d")
    assert tw.pending() == 0
    assert api.state.training_cancel.is_set()


def test_guided_labeling_reinfers_stale_csv(api):
    """start_labeling_with_preload must re-infer when the outputs CSV
    predates the model's saved weights: after a same-name retrain, a stale
    CSV would present the PREVIOUS model's predictions as review guidance
    (same staleness rule as the disagreement report)."""
    import time as _time

    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
    from cbas_tpu.utils.naming import h5_path_for_video, outputs_csv_for_h5

    for _ in range(600):  # wait for the stale sweep's encodes
        q = api.get_encoding_queue_status()
        if q["queued"] == 0 and q["done"] >= q["total"]:
            break
        _time.sleep(0.1)
    proj = api.state.project
    cfg = DeltasHeadConfig(in_features=64, out_features=2, seq_len=7, lstm_hidden_size=8)
    params = jax.device_get(init_deltas_params(jax.random.key(5), cfg))
    ClassifierBundle(
        name="gm", behaviors=["walk", "rest"], seq_len=7,
        params={k: np.asarray(v) for k, v in params.items()},
        lstm_hidden_size=8, encoder_identifier=proj.encoder_model_identifier,
    ).save(os.path.join(proj.models_dir, "gm"))
    proj.reload()

    video = os.path.join(proj.recordings_dir, "sess", "m0", "m0_00001.mp4")
    csv = outputs_csv_for_h5(h5_path_for_video(video), "gm")
    planted = pd.DataFrame({"walk": [0.123] * 30, "rest": [0.877] * 30})
    planted.to_csv(csv, index=False)
    os.utime(csv, (1.0, 1.0))  # older than model.npz

    assert api.start_labeling_with_preload("d", "gm", video, 1)
    df = pd.read_csv(csv)
    assert not np.allclose(df["walk"].to_numpy(), 0.123), (
        "stale CSV was served as guidance instead of re-inferring"
    )
    # a FRESH csv (newer than the weights) is reused, not re-inferred
    mtime = os.path.getmtime(csv)
    assert api.start_labeling_with_preload("d", "gm", video, 1)
    assert os.path.getmtime(csv) == mtime

"""Differential oracle: labeling-session setup vs the reference's actual code.

Runs the *actual* reference ``_start_labeling_worker``
(/root/reference/backend/label_train_page.py:593-715, GUI deps stubbed,
``next_video`` no-op'd so no cv2 capture is needed) against a real dataset
directory, and asserts our ``LabelingSession.__init__`` builds the identical
session buffer:

- human labels for the target video loaded with \\->/ path normalization
- review mode: predictions under the confidence threshold have every
  human-labeled interval SUBTRACTED (integer interval splitting with
  h_start-1 / h_end+1 edges) before entering the buffer

One intentional divergence is pinned: the reference's ``refilter_instances``
(label_train_page.py:1162-1220) re-admits raw predictions WITHOUT
re-subtracting the preserved human intervals — a prediction overlapping a
human label reappears in full after any threshold change, double-counting
those frames. Our ``LabelingSession.refilter`` re-applies the subtraction
(cbas_tpu/app/labeling.py:437-452); the agreement and divergence cases are
both asserted below.
"""

from __future__ import annotations

import os
import types

import numpy as np
import pytest
import yaml

from cbas_tpu.app.labeling import LabelingSession
from cbas_tpu.core.project import Project
from tests.conftest import load_reference_page, stub_module


@pytest.fixture()
def ref_ltp():
    """Reference label_train_page with every UI callback stubbed to a
    callable-returning callable (eel's ``eel.fn(...)()`` calling shape) and
    errors RECORDED (the worker swallows exceptions into an eel dialog —
    a silent failure would otherwise pass the oracle with an empty buffer)."""
    errors = []

    def _cb(*a, **k):
        return lambda *a2, **k2: None

    eel = stub_module(
        "eel",
        expose=lambda f: f,
        spawn=lambda *a, **k: None,
        setConfirmationModeUI=_cb,
        buildLabelingUI=_cb,
        setLabelingModeUI=_cb,
        highlightBehaviorRow=_cb,
        updateConfidenceBadge=_cb,
        showErrorOnLabelTrainPage=lambda msg: errors.append(msg) or (lambda: None),
    )
    gs = stub_module("gui_state", proj=None)
    stubs = {
        "eel": eel,
        "cmap": stub_module("cmap", Colormap=lambda name: (lambda v: f"c{v}")),
        "workthreads": stub_module("workthreads", log_message=lambda *a, **k: None),
        "gui_state": gs,
    }
    with load_reference_page("label_train_page", stubs) as mod:
        mod._oracle_errors = errors
        yield mod


BEHAVIORS = ["walk", "rest", "groom"]


def _make_project(tmp_path, human_labels):
    proj = Project.create_project(str(tmp_path / "projects"), "p")
    rec = os.path.join(proj.recordings_dir, "s1", "m0")
    os.makedirs(rec)
    video = os.path.join(rec, "m0_00001.mp4")
    open(video, "wb").close()
    ds_dir = os.path.join(proj.datasets_dir, "d1")
    os.makedirs(ds_dir)
    with open(os.path.join(ds_dir, "config.yaml"), "w") as f:
        yaml.dump({"name": "d1", "behaviors": BEHAVIORS}, f)
    labels = {b: [] for b in BEHAVIORS}
    for inst in human_labels:
        labels[inst["label"]].append(inst)
    with open(os.path.join(ds_dir, "labels.yaml"), "w") as f:
        yaml.dump({"behaviors": BEHAVIORS, "labels": labels}, f)
    return proj, video


def _random_instances(rng, n, rel_video, confidence=False, backslash_some=False):
    out = []
    for i in range(n):
        start = int(rng.integers(0, 500))
        inst = {
            "video": rel_video,
            "start": start,
            "end": start + int(rng.integers(0, 40)),
            "label": BEHAVIORS[int(rng.integers(len(BEHAVIORS)))],
        }
        if confidence:
            inst["confidence"] = round(float(rng.uniform(0, 1)), 3)
        if backslash_some and i % 3 == 0:
            inst["video"] = rel_video.replace("/", "\\")
        out.append(inst)
    return out


def _ref_session_buffer(ref_ltp, proj, video, preds):
    """Run the reference worker for real; return its session buffer."""
    import cbas as ref_cbas  # the loader put the real reference cbas in sys.modules

    gs = ref_ltp.gui_state
    gs.proj = types.SimpleNamespace(
        path=proj.path,
        datasets={"d1": ref_cbas.Dataset(os.path.join(proj.datasets_dir, "d1"))},
    )
    # session globals the worker resets (gui_state.py:44-64)
    gs.label_capture = None
    gs.label_dirty_instances = set()
    gs.label_suppressed_ids = set()
    gs.label_session_buffer = []
    gs.live_inference_model_name = "m1"
    # no cv2 capture: the buffer is fully built before next_video runs
    ref_ltp.next_video = lambda i: None
    ref_ltp._start_labeling_worker(
        "d1", video_to_open=video, preloaded_instances=preds or None
    )
    assert not ref_ltp._oracle_errors, ref_ltp._oracle_errors
    return gs.label_session_buffer


def _key(inst):
    return (inst["start"], inst["end"], inst["label"], inst.get("confidence", -1.0))


@pytest.mark.parametrize("seed", range(4))
def test_review_session_buffer_matches_reference(ref_ltp, tmp_path, seed):
    rng = np.random.default_rng(seed)
    rel = "recordings/s1/m0/m0_00001.mp4"
    humans = _random_instances(rng, 6, rel, backslash_some=True)
    proj, video = _make_project(tmp_path, humans)
    preds = _random_instances(rng, 12, rel, confidence=True)

    ref_buffer = _ref_session_buffer(ref_ltp, proj, video, preds)

    ours = LabelingSession(
        Project(proj.path), "d1", video,
        preloaded_instances=preds, model_name="m1", open_capture=False,
    )
    assert ours.mode == "review"
    assert sorted(ours.buffer, key=_key) == sorted(ref_buffer, key=_key)


def test_scratch_session_buffer_matches_reference(ref_ltp, tmp_path):
    rng = np.random.default_rng(99)
    rel = "recordings/s1/m0/m0_00001.mp4"
    humans = _random_instances(rng, 5, rel, backslash_some=True)
    proj, video = _make_project(tmp_path, humans)

    ref_buffer = _ref_session_buffer(ref_ltp, proj, video, preds=[])
    ours = LabelingSession(Project(proj.path), "d1", video, open_capture=False)
    assert ours.mode == "scratch"
    assert sorted(ours.buffer, key=_key) == sorted(ref_buffer, key=_key)
    # every human label is in, with the \\ spelling normalized
    assert len(ref_buffer) == len(humans)
    assert all("/" in i["video"] and "\\" not in i["video"] for i in ref_buffer)


def test_refilter_divergence_is_the_documented_resubtraction(ref_ltp, tmp_path):
    """Human label walk[100,200]; one prediction rest[150,300] conf 0.4.

    Setup (both): the prediction enters the buffer subtracted -> [201,300].
    Refilter to the same threshold: the reference rebuilds from RAW
    predictions and re-admits rest[150,300] IN FULL, overlapping the human
    label; we re-subtract, keeping [201,300]."""
    rel = "recordings/s1/m0/m0_00001.mp4"
    human = {"video": rel, "start": 100, "end": 200, "label": "walk"}
    proj, video = _make_project(tmp_path, [human])
    pred = {"video": rel, "start": 150, "end": 300, "label": "rest",
            "confidence": 0.4}

    ref_buffer = _ref_session_buffer(ref_ltp, proj, video, [pred])
    assert sorted(_key(i) for i in ref_buffer) == [
        (100, 200, "walk", -1.0), (201, 300, "rest", 0.4),
    ]
    # reference refilter: raw prediction returns whole (render no-op'd)
    ref_ltp.render_image = lambda *a, **k: None
    ref_ltp.update_counts = lambda *a, **k: None
    ref_ltp.refilter_instances(50, "below")
    assert sorted(_key(i) for i in ref_ltp.gui_state.label_session_buffer) == [
        (100, 200, "walk", -1.0), (150, 300, "rest", 0.4),  # overlap is back
    ]

    ours = LabelingSession(
        Project(proj.path), "d1", video,
        preloaded_instances=[pred], model_name="m1", open_capture=False,
    )
    ours.refilter(50, "below")
    assert sorted(_key(i) for i in ours.buffer) == [
        (100, 200, "walk", -1.0), (201, 300, "rest", 0.4),  # still subtracted
    ]


def test_refilter_agreement_without_overlap(ref_ltp, tmp_path):
    """Where no preserved instance overlaps a prediction, refilter agrees:
    threshold/mode gating, ancestry + deletion suppression."""
    rng = np.random.default_rng(7)
    rel = "recordings/s1/m0/m0_00001.mp4"
    proj, video = _make_project(tmp_path, [])
    preds = _random_instances(rng, 10, rel, confidence=True)

    for mode, threshold in [("below", 60), ("above", 30)]:
        ref_buffer = _ref_session_buffer(ref_ltp, proj, video, preds)
        suppressed = (preds[0]["start"], preds[0]["end"], preds[0]["label"])
        ref_ltp.gui_state.label_suppressed_ids = {suppressed}
        ref_ltp.render_image = lambda *a, **k: None
        ref_ltp.update_counts = lambda *a, **k: None
        ref_ltp.refilter_instances(threshold, mode)

        ours = LabelingSession(
            Project(proj.path), "d1", video,
            preloaded_instances=preds, model_name="m1", open_capture=False,
        )
        ours.suppressed_ids = {suppressed}
        ours.refilter(threshold, mode)
        assert (
            sorted(_key(i) for i in ours.buffer)
            == sorted(_key(i) for i in ref_ltp.gui_state.label_session_buffer)
        ), f"mode={mode} threshold={threshold}"

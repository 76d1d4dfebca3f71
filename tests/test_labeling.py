"""Labeling session engine tests: buffer setup, edits, refiltering, commit."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.app.labeling import LabelingSession
from cbas_tpu.core.project import Project


@pytest.fixture
def project(tmp_path):
    proj = Project.create_project(str(tmp_path), "p")
    rec = os.path.join(proj.recordings_dir, "s", "m0")
    os.makedirs(rec)
    video = os.path.join(rec, "m0_00001.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for i in range(100):
        w.write(np.full((32, 32, 3), i % 256, np.uint8))
    w.release()

    ds = proj.create_dataset("d", ["walk", "rest"], [])
    rel = os.path.relpath(video, proj.path)
    ds.labels["labels"]["walk"] = [
        {"video": rel, "start": 10, "end": 20, "label": "walk"}
    ]
    ds.save_labels()
    proj.reload()
    return proj, video, rel


def make_session(project_tuple, preloaded=None, **kw):
    proj, video, rel = project_tuple
    return LabelingSession(proj, "d", video, preloaded_instances=preloaded, **kw)


def test_session_loads_human_labels(project):
    s = make_session(project)
    assert s.total_frames == 100
    assert len(s.buffer) == 1 and s.buffer[0]["label"] == "walk"
    assert s.mode == "scratch"
    s.close()


def test_review_mode_subtracts_human_intervals(project):
    _, _, rel = project
    preds = [
        {"video": rel, "start": 5, "end": 30, "label": "rest", "confidence": 0.4},
        {"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.99},
    ]
    s = make_session(project, preloaded=preds)
    assert s.mode == "review"
    # High-confidence (0.99 >= 1.0? no, threshold 100% -> 1.0; 0.99 < 1.0 passes)
    spans = sorted((i["start"], i["end"], i.get("confidence") is not None) for i in s.buffer)
    # pred (5,30) is split around human (10,20) -> (5,9) and (21,30)
    assert (5, 9, True) in spans and (21, 30, True) in spans
    assert (10, 20, False) in spans
    assert (50, 60, True) in spans
    s.close()


def test_label_creation_two_keypresses(project):
    s = make_session(project)
    s.jump_to_frame(40)
    s.label_frame(1)         # start 'rest' at 40
    assert s.pending_type == 1
    s.jump_to_frame(55)
    s.label_frame(1)         # close at 55
    assert s.pending_type == -1
    spans = [(i["start"], i["end"], i["label"]) for i in s.buffer]
    assert (40, 55, "rest") in spans
    # Undo removes it.
    assert s.undo_last() is not None
    assert (40, 55, "rest") not in [(i["start"], i["end"], i["label"]) for i in s.buffer]
    s.close()


def test_overlap_rejected(project):
    errors = []
    s = make_session(project)
    s.callbacks.register("showErrorOnLabelTrainPage", errors.append)
    s.jump_to_frame(15)      # inside the human label -> relabel path not taken
    s.label_frame(1)
    # playhead inside existing instance with pending_type == -1 => relabel
    assert s.buffer[0]["label"] == "rest"
    s.buffer[0]["label"] = "walk"

    s.jump_to_frame(5)
    s.label_frame(1)
    s.jump_to_frame(15)      # would overlap (10,20)
    s.label_frame(1)
    assert errors  # rejected
    assert len([i for i in s.buffer if i["start"] == 5]) == 0
    s.close()


def test_relabel_promotes_prediction(project):
    _, _, rel = project
    preds = [{"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.5}]
    s = make_session(project, preloaded=preds)
    s.jump_to_frame(55)
    s.label_frame(0)  # relabel to walk
    inst = [i for i in s.buffer if i["start"] == 50][0]
    assert inst["label"] == "walk"
    assert "confidence" not in inst and inst["_confirmed"]
    assert inst["_parent_id"] == (50, 60, "rest")
    s.close()


def test_boundary_update_trims_neighbors(project):
    s = make_session(project)
    # Add a second instance adjacent to the human one.
    s.jump_to_frame(21)
    s.label_frame(1)
    s.jump_to_frame(40)
    s.label_frame(1)  # rest (21, 40)
    # Select it and pull its start left over the human label (10,20).
    s.selected_index = [i for i, x in enumerate(s.buffer) if x["start"] == 21][0]
    s.jump_to_frame(15)
    assert s.update_instance_boundary("start")
    inst = [x for x in s.buffer if x["label"] == "rest"][0]
    assert inst["start"] == 15
    walk = [x for x in s.buffer if x["label"] == "walk"][0]
    assert walk["end"] == 14  # trimmed
    s.close()


def test_delete_suppression_in_refilter(project):
    _, _, rel = project
    preds = [
        {"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.3},
        {"video": rel, "start": 70, "end": 80, "label": "rest", "confidence": 0.4},
    ]
    s = make_session(project, preloaded=preds)
    s.jump_to_frame(55)
    assert s.delete_instance()["start"] == 50
    # Refilter must not resurrect the deleted prediction.
    s.refilter(100, "below")
    starts = [i["start"] for i in s.buffer if "confidence" in i]
    assert 70 in starts and 50 not in starts
    # 'above' mode flips the filter.
    s.refilter(35, "above")
    starts = [i["start"] for i in s.buffer if "confidence" in i]
    assert starts == [70]
    s.close()


def test_confirm_and_save_scorched_earth(project):
    proj, video, rel = project
    preds = [{"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.5}]
    s = make_session(project, preloaded=preds)
    # Confirm the prediction via selection.
    s.jump_to_frame(50)
    s.jump_to_instance(1)  # selects something; find the prediction explicitly
    s.selected_index = [i for i, x in enumerate(s.buffer) if x["start"] == 50][0]
    assert s.confirm_selected() is True
    res = s.save()
    assert res["status"] == "success"

    reloaded = Project(proj.path).datasets["d"]
    rest = reloaded.labels["labels"]["rest"]
    assert len(rest) == 1 and rest[0]["start"] == 50
    assert "confidence" not in rest[0] and "_confirmed" not in rest[0]
    walk = reloaded.labels["labels"]["walk"]
    assert len(walk) == 1  # human label survived the rewrite
    s.close()


def test_save_no_changes(project):
    s = make_session(project)
    assert s.save() == {"status": "no_changes"}
    s.close()


def test_counts_and_timeline(project):
    _, _, rel = project
    preds = [{"video": rel, "start": 50, "end": 59, "label": "rest", "confidence": 0.5}]
    s = make_session(project, preloaded=preds)
    counts = s.counts()
    assert counts == {"walk": 11, "rest": 0}  # unconfirmed predictions don't count
    # per-behavior instance counts ride alongside frame counts (the reference
    # shows "instanceCount / frameCount" per row, label_train_page.js:939-943)
    assert s.instance_counts() == {"walk": 1, "rest": 0}
    assert s.render_payload(size=32)["instance_counts"] == {"walk": 1, "rest": 0}
    raster = s.timeline_raster(width=100)
    assert set(raster[10:21]) == {0}   # walk region
    assert set(raster[50:60]) == {1}   # prediction visible in normal mode
    s.confirmation_mode = True
    raster2 = s.timeline_raster(width=100)
    assert set(raster2[50:60]) == {-1}  # hidden when staging commit
    s.close()


def test_render_payload(project):
    s = make_session(project)
    s.jump_to_frame(3)
    payload = s.render_payload(size=64)
    assert payload["frame_index"] == 3 and payload["total_frames"] == 100
    assert payload["frame"] is not None
    assert payload["behaviors"] == ["walk", "rest"]
    assert len(payload["timeline"]) == 500
    assert len(payload["zoom_timeline"]) == 500
    s.close()


def test_zoom_window_and_raster(project):
    """The zoomed secondary timeline: a fixed 10%-of-video window centered on
    the playhead (or selection), rastered at full strip resolution
    (reference: backend/label_train_page.py:1963-2000)."""
    s = make_session(project)
    s.jump_to_frame(15)
    lo, hi = s.zoom_window()
    assert (lo, hi) == (10.0, 20.0)  # 10% of 100 frames, centered on 15
    # walk spans frames 10-20 -> fills the whole window
    z = s.timeline_raster(width=100, view_start=lo, view_end=hi)
    assert set(z) == {0}
    # window clamps at the ends of the video
    s.jump_to_frame(0)
    lo, hi = s.zoom_window()
    assert lo == 0.0 and hi == 5.0
    z = s.timeline_raster(width=100, view_start=lo, view_end=hi)
    assert set(z) == {-1}  # frames 0-4 unlabeled
    # selection overrides the playhead as zoom center
    s.selected_index = 0  # walk instance, midpoint 15
    lo, hi = s.zoom_window()
    assert (lo, hi) == (10.0, 20.0)
    payload = s.render_payload(size=64)
    assert payload["zoom_start"] == 10.0 and payload["zoom_end"] == 20.0
    s.close()


def test_review_filter_blocks_foreign_edits(project):
    _, _, rel = project
    preds = [{"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.5}]
    s = make_session(project, preloaded=preds, filter_for_behavior="rest")
    s.jump_to_frame(15)  # on the human 'walk' instance
    s.label_frame(1)
    assert s.buffer[0]["label"] == "walk"  # blocked
    assert s.delete_instance() is None      # blocked
    s.close()


def test_refilter_resubtracts_human_intervals(project):
    """Moving the confidence slider must not resurrect prediction spans that
    overlap human labels (review r2 finding: raw predictions re-entered the
    buffer whole, double-counting frames and tripping the overlap guard)."""
    _, _, rel = project
    preds = [{"video": rel, "start": 5, "end": 30, "label": "rest", "confidence": 0.4}]
    s = make_session(project, preloaded=preds)
    s.refilter(90, "below")  # prediction still passes (0.4 < 0.9)
    human = [(i["start"], i["end"]) for i in s.buffer if "confidence" not in i]
    pred_spans = [(i["start"], i["end"]) for i in s.buffer if "confidence" in i]
    for hs, he in human:
        for ps, pe in pred_spans:
            assert max(hs, ps) > min(he, pe), (
                f"prediction ({ps},{pe}) overlaps human label ({hs},{he})"
            )
    # the split pieces are back, not the raw (5,30) prediction
    assert (5, 30) not in pred_spans and (5, 9) in pred_spans
    s.close()


def test_boundary_noop_does_not_promote(project):
    """A rejected nudge (playhead past the instance end) must leave a
    prediction unpromoted and the session clean (review r2 finding)."""
    _, _, rel = project
    preds = [{"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.4}]
    s = make_session(project, preloaded=preds)
    s.selected_index = next(
        i for i, inst in enumerate(s.buffer) if "confidence" in inst
    )
    sel = s.buffer[s.selected_index]
    before_changes = s.has_changes()
    s.jump_to_frame(70)  # past the instance end
    assert s.update_instance_boundary("start") is False
    assert sel.get("confidence") is not None, "no-op nudge promoted the prediction"
    assert s.has_changes() == before_changes
    s.close()


def test_playback_mode_is_read_only(project):
    s = make_session(project)
    s.mode = "playback"
    n = len(s.buffer)
    s.jump_to_frame(40)
    s.label_frame(0)
    s.jump_to_frame(45)
    s.label_frame(0)
    assert len(s.buffer) == n and s.pending_type == -1
    assert s.delete_instance() is None
    assert s.save()["status"] == "error"
    s.close()


def test_fuzz_labeling_invariants(project):
    """Randomized operation sequences preserve the engine's invariants:
    instances stay in-bounds with start < end, never overlap, counts() always
    re-derives from the buffer, and the final buffer round-trips through
    save() into a fresh session. 3 seeds x 250 ops."""
    proj, video, rel = project

    def assert_invariants(s, tag):
        insts = sorted(s.buffer, key=lambda i: (i["start"], i["end"]))
        for inst in insts:
            assert 0 <= inst["start"] < inst["end"] <= s.total_frames - 1, (tag, inst)
            assert inst["label"] in s.behaviors, (tag, inst)
        for a, b in zip(insts, insts[1:]):
            assert a["end"] < b["start"], (tag, "overlap", a, b)
        counts = s.counts()
        expect = {b: 0 for b in s.behaviors}
        for inst in insts:
            expect[inst["label"]] += inst["end"] - inst["start"] + 1
        assert counts == expect, (tag, counts, expect)

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        s = make_session(project)
        try:
            for step in range(250):
                op = rng.integers(0, 8)
                if op == 0:
                    s.jump_to_frame(int(rng.integers(-5, 110)))
                elif op == 1:
                    s.next_frame(int(rng.integers(-16, 17)))
                elif op == 2:
                    s.label_frame(int(rng.integers(0, 2)))
                elif op == 3:
                    s.delete_instance()
                elif op == 4:
                    s.undo_last()
                elif op == 5:
                    s.jump_to_instance(int(rng.choice([-1, 1])))
                elif op == 6:
                    s.update_instance_boundary(
                        "start" if rng.integers(0, 2) else "end"
                    )
                else:
                    s.click_timeline(int(rng.integers(0, 1000)))
                assert_invariants(s, f"seed{seed} step{step} op{op}")

            # settle any pending label, then round-trip through save()
            s.pending_type, s.pending_start = -1, -1
            final = [
                {"start": i["start"], "end": i["end"], "label": i["label"]}
                for i in s.buffer
            ]
            s.dirty.add("fuzz")  # force a write even if ops net out to no-op
            result = s.save()
            assert result["status"] in ("success", "no_changes", "ok"), result
        finally:
            s.close()

        s2 = make_session(project)
        try:
            reloaded = [
                {"start": i["start"], "end": i["end"], "label": i["label"]}
                for i in s2.buffer
            ]
            key = lambda i: (i["start"], i["end"], i["label"])
            assert sorted(reloaded, key=key) == sorted(final, key=key), seed
        finally:
            s2.close()


def test_fuzz_clean_and_sort_properties():
    """Random messy label docs: after cleaning, per-video instances are
    sorted, non-overlapping, within the original span set, and cleaning is
    idempotent (clean(clean(x)) == clean(x)); conflict count drops to 0."""
    import numpy as np

    from cbas_tpu.core.labels import analyze_label_conflicts, clean_and_sort_labels

    for seed in range(6):
        rng = np.random.default_rng(seed)
        behaviors = ["walk", "rest", "groom"]
        doc = {"labels": {b: [] for b in behaviors}}
        for _ in range(rng.integers(5, 60)):
            b = behaviors[rng.integers(0, 3)]
            v = f"recordings/s/m{rng.integers(0, 3)}/v_00001.mp4"
            start = int(rng.integers(0, 400))
            end = start + int(rng.integers(0, 80))
            doc["labels"][b].append(
                {"video": v, "start": start, "end": end, "label": b}
            )
            if rng.random() < 0.3:  # exact duplicate
                doc["labels"][b].append(
                    {"video": v, "start": start, "end": end, "label": b}
                )

        cleaned = clean_and_sort_labels({"labels": {k: list(map(dict, v)) for k, v in doc["labels"].items()}})

        per_video = {}
        for b, insts in cleaned["labels"].items():
            for inst in insts:
                assert inst["label"] == b
                assert inst["start"] <= inst["end"]
                per_video.setdefault(inst["video"], []).append(inst)
        for v, insts in per_video.items():
            insts.sort(key=lambda i: i["start"])
            for a, c in zip(insts, insts[1:]):
                assert a["end"] < c["start"], (seed, v, a, c)

        conflicts = analyze_label_conflicts(cleaned)
        assert all(v == 0 for v in conflicts.values()), (seed, conflicts)

        again = clean_and_sort_labels(
            {"labels": {k: list(map(dict, vv)) for k, vv in cleaned["labels"].items()}}
        )
        norm = lambda d: {
            b: sorted(((i["video"], i["start"], i["end"]) for i in ii))
            for b, ii in d["labels"].items()
        }
        assert norm(again) == norm(cleaned), seed


def test_fuzz_subtract_intervals_frame_exact():
    """Random holes: the surviving pieces are exactly the instance's frames
    minus every hole frame — disjoint, ordered, within bounds."""
    import numpy as np

    from cbas_tpu.core.labels import subtract_intervals

    for seed in range(8):
        rng = np.random.default_rng(seed)
        start = int(rng.integers(0, 50))
        end = start + int(rng.integers(0, 200))
        inst = {"video": "v", "start": start, "end": end, "label": "walk"}
        holes = []
        for _ in range(rng.integers(0, 8)):
            hs = int(rng.integers(start - 20, end + 20))
            holes.append((hs, hs + int(rng.integers(0, 60))))

        pieces = subtract_intervals(inst, holes)

        want = set(range(start, end + 1))
        for hs, he in holes:
            want -= set(range(hs, he + 1))
        got = set()
        for p in pieces:
            ps, pe = int(p["start"]), int(p["end"])
            assert start <= ps <= pe <= end, (seed, p)
            span = set(range(ps, pe + 1))
            assert not (span & got), (seed, "pieces overlap")
            got |= span
            assert p["label"] == "walk" and p["video"] == "v"
        assert got == want, (seed, sorted(want - got)[:5], sorted(got - want)[:5])


def test_deleting_promoted_prediction_stays_deleted_after_refilter(project):
    """Edit (promote) a prediction, then delete it: refilter must not
    resurrect the original ghost via its _parent_id (r3 review finding —
    the reference only suppresses confidence-bearing instances,
    label_train_page.py:1595-1598)."""
    _, _, rel = project
    preds = [{"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.3}]
    s = make_session(project, preloaded=preds)
    s.selected_index = next(i for i, x in enumerate(s.buffer) if x["start"] == 50)
    s.jump_to_frame(62)
    assert s.update_instance_boundary("end")  # promotes, sets _parent_id
    inst = s.buffer[s.selected_index]
    assert "confidence" not in inst and "_parent_id" in inst
    s.jump_to_frame(55)
    removed = s.delete_instance()
    assert removed is not None and removed["start"] == 50
    s.refilter(100, "below")
    assert all(i["start"] != 50 for i in s.buffer)  # ghost stays dead
    s.close()


def test_nudge_keeps_single_frame_neighbor(project):
    """Trimming a neighbor down to exactly one frame must KEEP it — [f, f]
    is a valid label everywhere else (r3 review finding: >= dropped it)."""
    proj, video, rel = project
    ds = proj.datasets["d"]
    ds.labels["labels"]["rest"] = [
        {"video": rel, "start": 22, "end": 23, "label": "rest"}
    ]
    ds.save_labels()
    proj.reload()
    s = make_session(project)  # human labels: walk(10,20), rest(22,23)
    s.selected_index = next(i for i, x in enumerate(s.buffer) if x["label"] == "walk")
    s.jump_to_frame(22)
    assert s.update_instance_boundary("end")  # walk claims frame 22
    spans = sorted((i["start"], i["end"], i["label"]) for i in s.buffer)
    assert (10, 22, "walk") in spans
    assert (23, 23, "rest") in spans  # the 1-frame remainder survives
    s.close()


def test_confirm_blocked_for_non_target_behavior(project):
    """Review-by-behavior: confirming an off-target prediction must be
    blocked like every other edit path (r3 review finding)."""
    _, _, rel = project
    preds = [
        {"video": rel, "start": 50, "end": 60, "label": "rest", "confidence": 0.3},
        {"video": rel, "start": 70, "end": 80, "label": "walk", "confidence": 0.3},
    ]
    s = make_session(project, preloaded=preds, filter_for_behavior="walk")
    s.selected_index = next(
        i for i, x in enumerate(s.buffer) if x["label"] == "rest" and "confidence" in x
    )
    assert s.confirm_selected() is None  # blocked
    assert not s.buffer[s.selected_index].get("_confirmed", False)
    s.selected_index = next(
        i for i, x in enumerate(s.buffer) if x["label"] == "walk" and "confidence" in x
    )
    assert s.confirm_selected() is True  # target behavior confirms fine
    s.close()


def test_fuzz_review_mode_invariants(project):
    """Review-mode fuzz: random confirm/refilter/relabel/delete/nudge/undo
    sequences over preloaded predictions keep the buffer non-overlapping and
    in-bounds, never resurrect a deleted instance, and save() commits exactly
    the human + confirmed/promoted set. 3 seeds x 200 ops."""
    proj, video, rel = project
    rng0 = np.random.default_rng(99)
    preds = []
    f = 25
    while f < 95:
        span = int(rng0.integers(1, 6))
        preds.append({
            "video": rel, "start": f, "end": min(94, f + span),
            "label": ["walk", "rest"][int(rng0.integers(0, 2))],
            "confidence": float(rng0.uniform(0.3, 1.0)),
        })
        f += span + int(rng0.integers(2, 6))

    def assert_invariants(s, tag):
        insts = sorted(s.buffer, key=lambda i: (i["start"], i["end"]))
        for inst in insts:
            assert 0 <= inst["start"] <= inst["end"] <= s.total_frames - 1, (tag, inst)
            assert inst["label"] in s.behaviors, (tag, inst)
        for a, b in zip(insts, insts[1:]):
            assert a["end"] < b["start"], (tag, "overlap", a, b)

    for seed in (3, 4, 5):
        rng = np.random.default_rng(seed)
        s = make_session(project, preloaded=[dict(p) for p in preds])
        deleted_sigs = set()
        try:
            assert s.mode == "review"
            for step in range(200):
                op = rng.integers(0, 9)
                if op == 0:
                    s.jump_to_frame(int(rng.integers(0, 100)))
                elif op == 1:
                    s.jump_to_instance(int(rng.choice([-1, 1])))
                elif op == 2:
                    s.confirm_selected()
                elif op == 3:
                    removed = s.delete_instance()
                    if removed is not None:
                        deleted_sigs.add(
                            (removed["start"], removed["end"], removed["label"]))
                elif op == 4:
                    s.refilter(int(rng.integers(0, 101)),
                               ["below", "above"][int(rng.integers(0, 2))])
                elif op == 5:
                    s.label_frame(int(rng.integers(0, 2)))
                elif op == 6:
                    s.update_instance_boundary(
                        "start" if rng.integers(0, 2) else "end")
                elif op == 7:
                    s.undo_last()
                else:
                    s.next_frame(int(rng.integers(-10, 11)))
                assert_invariants(s, f"seed{seed} step{step} op{op}")

            # every deletion of a prediction registered a suppression entry,
            # so later refilters cannot resurrect the ghost
            if deleted_sigs:
                assert s.suppressed_ids, (seed, deleted_sigs)

            s.pending_type, s.pending_start = -1, -1
            committed = [
                i for i in s.buffer
                if "confidence" not in i or i.get("_confirmed", False)
            ]
            s.dirty.add("fuzz")
            res = s.save()
            assert res["status"] in ("success", "no_changes"), res
        finally:
            s.close()

        s2 = make_session(project)
        try:
            key = lambda i: (i["start"], i["end"], i["label"])
            want = sorted(
                ({"start": i["start"], "end": i["end"], "label": i["label"]}
                 for i in committed), key=key)
            got = sorted(
                ({"start": i["start"], "end": i["end"], "label": i["label"]}
                 for i in s2.buffer), key=key)
            assert got == want, (seed, got, want)
        finally:
            s2.close()


def test_clean_and_sort_drops_inverted_single_instance():
    """An inverted instance (start > end) that is ALONE on its video must be
    dropped like the multi-instance path drops it — it would otherwise
    produce negative frame counts downstream."""
    from cbas_tpu.core.labels import clean_and_sort_labels

    doc = {"behaviors": ["walk"], "labels": {"walk": [
        {"video": "v.mp4", "start": 100, "end": 50, "label": "walk"},
    ]}}
    cleaned = clean_and_sort_labels(doc)
    assert cleaned["labels"].get("walk", []) == []


def test_playback_stage_is_noop(project):
    """Ctrl+S in a read-only playback session must not stage: staging hides
    every unconfirmed prediction, which in playback is the whole timeline
    (Api.stage_for_commit guards on session mode)."""
    from cbas_tpu.app.api import Api

    _, _, rel = project
    preds = [{"video": rel, "start": 50, "end": 60, "label": "rest",
              "confidence": 0.9}]
    s = make_session(project, preloaded=preds, playback=True)
    api = Api()
    api.state.labeling_session = s
    try:
        assert s.mode == "playback"
        assert api.stage_for_commit() is True  # RPC succeeds...
        assert s.confirmation_mode is False    # ...but nothing staged
        assert any(r >= 0 for r in s.timeline_raster(width=100))
    finally:
        api.state.labeling_session = None
        s.close()


def test_save_commits_over_null_behavior_list(project):
    """A hand-edited ``behavior:`` key (YAML null) in labels.yaml must not
    eat the user's reviewed labels: save() reloads the file raw (bypassing
    Dataset.__init__'s normalization) and has to tolerate the null itself."""
    from cbas_tpu.core.config import dump_yaml, load_yaml

    proj, video, rel = project
    ds = proj.datasets["d"]
    master = load_yaml(ds.labels_path)
    master["labels"]["rest"] = None  # what `rest:` with no value parses to
    dump_yaml(master, ds.labels_path)

    s = make_session(project)
    s.jump_to_frame(40)
    s.label_frame(1)           # start pending 'rest'
    s.jump_to_frame(48)
    s.label_frame(1)           # close it
    assert s.save()["status"] == "success"
    s.close()

    reloaded = Project(proj.path).datasets["d"]
    rest = reloaded.labels["labels"]["rest"]
    assert len(rest) == 1 and rest[0]["start"] == 40 and rest[0]["end"] == 48

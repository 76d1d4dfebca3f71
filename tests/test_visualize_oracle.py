"""Differential oracle: visualization products vs the reference's actual code.

Loads the *actual* reference module (/root/reference/backend/visualize_page.py,
GUI deps stubbed) and compares its products with ours
(cbas_tpu/app/visualize.py):

- ethogram: the reference draws one ``ax.barh`` per contiguous behavior
  block (visualize_page.py:277-360); we intercept ``Axes.barh`` during its
  real ``generate_ethogram`` run and assert the captured (behavior, start,
  duration) bars equal our ``ethogram_events``
- binned CSV export: the reference's ``generate_and_save_data``
  (visualize_page.py:203-270) writes a BinnedData CSV; we run it for real
  and assert per-behavior column equality (NaN-aware) with our
  ``export_binned_csv`` over the same stitched segments

One intentional divergence is pinned rather than hidden: on an exact
probability tie the reference's row-max binarization
(``(df.T == df.max(axis=1)).T``, visualize_page.py:429) marks EVERY tied
behavior active — a single frame renders as two bars — while our argmax
assigns each frame to exactly one behavior (first of the tied columns),
matching the rest of the product surface (infer CSVs argmax, actogram
strict-max).
"""

from __future__ import annotations

import glob
import os
import types

import matplotlib

matplotlib.use("Agg")
import matplotlib.axes
import numpy as np
import pandas as pd
import pytest

from cbas_tpu.app import visualize
from tests.conftest import load_reference_page, stub_module


@pytest.fixture(scope="module")
def ref_vp():
    """Reference backend/visualize_page.py with GUI/runtime deps stubbed.

    eel isn't installed (we replaced the Eel websocket stack), workthreads
    spins up GUI worker threads, and gui_state holds runtime globals; the
    plotting/export functions under test only touch log_message /
    showErrorOnVisualizePage / gui_state.proj, all stubbed here. cbas is the
    real reference module (its Actogram does the export binning).
    """
    stubs = {
        "eel": stub_module(
            "eel",
            expose=lambda f: f,
            spawn=lambda *a, **k: None,
            showErrorOnVisualizePage=lambda *a, **k: (lambda *a2, **k2: None),
        ),
        "workthreads": stub_module("workthreads", log_message=lambda *a, **k: None),
        "gui_state": stub_module("gui_state", proj=None),
    }
    with load_reference_page("visualize_page", stubs) as mod:
        yield mod


BEHAVIORS = ["walk", "rest", "groom", "background"]


def _random_probs(rng, n):
    """Rows sum to 1, with runs of a dominant behavior like real blocks."""
    a = rng.gamma(0.35, size=(n, len(BEHAVIORS))) + 1e-6
    for s in range(0, n, 25):
        b = int(rng.integers(len(BEHAVIORS)))
        a[s : s + 25, b] += rng.uniform(0.5, 3)
    return a / a.sum(axis=1, keepdims=True)


class _BarhRecorder:
    """Intercept Axes.barh during the reference's real plot render.

    The reference computes ethogram events inside its plotting helper
    (visualize_page.py:289-301) — the bars it draws ARE its scientific
    output, so capturing the draw calls is the least-invasive way to
    extract them without re-implementing its recipe in the test.
    """

    def __init__(self, monkeypatch):
        self.bars = []
        orig = matplotlib.axes.Axes.barh

        def record(ax, *a, **kw):
            self.bars.append(
                {
                    "y": kw.get("y", a[0] if a else None),
                    "width": kw.get("width"),
                    "left": kw.get("left"),
                }
            )
            return orig(ax, *a, **kw)

        monkeypatch.setattr(matplotlib.axes.Axes, "barh", record)


def _ref_ethogram_events(ref_vp, monkeypatch, tmp_path, probs, name="cam_00001"):
    """Run the reference generate_ethogram for real; return {behavior:
    {(start, duration), ...}} reconstructed from its drawn bars."""
    rec = str(tmp_path)
    video = os.path.join(rec, f"{name}.mp4")
    open(video, "wb").close()
    pd.DataFrame(probs, columns=BEHAVIORS).to_csv(
        os.path.join(rec, f"{name}_m1_outputs.csv"), index=False
    )
    recorder = _BarhRecorder(monkeypatch)
    out = ref_vp.generate_ethogram(video)
    assert out is not None and out["name"] == f"{name}.mp4"
    # y-position -> behavior: the reference plots rows in column order with
    # 'background' moved last (visualize_page.py:284-287)
    order = [b for b in BEHAVIORS if b != "background"] + ["background"]
    events = {b: set() for b in BEHAVIORS}
    for bar in recorder.bars:
        events[order[int(bar["y"])]].add((int(bar["left"]), int(bar["width"])))
    return events


@pytest.mark.parametrize("seed", range(4))
def test_ethogram_bars_match_reference(ref_vp, monkeypatch, tmp_path, seed):
    rng = np.random.default_rng(seed)
    probs = _random_probs(rng, n=400)
    ref_events = _ref_ethogram_events(ref_vp, monkeypatch, tmp_path, probs)

    df = pd.DataFrame(probs, columns=BEHAVIORS)
    ours = visualize.ethogram_events(df, BEHAVIORS)
    for b in BEHAVIORS:
        assert set(ours.get(b, [])) == ref_events[b], f"behavior {b!r} diverged"


def test_ethogram_tie_divergence_is_pinned(ref_vp, monkeypatch, tmp_path):
    """Exact two-way tie on one frame: reference row-max binarization draws
    a bar for BOTH tied behaviors; our argmax assigns the frame to the
    first tied column only."""
    probs = np.full((5, len(BEHAVIORS)), 0.1)
    probs[:, 0] = 0.7            # walk dominates everywhere...
    probs[2, 0] = probs[2, 1] = 0.4  # ...except frame 2: walk/rest tie
    ref_events = _ref_ethogram_events(ref_vp, monkeypatch, tmp_path, probs)
    assert ref_events["walk"] == {(0, 5)}   # tie keeps walk active too
    assert ref_events["rest"] == {(2, 1)}   # ...and draws rest over it

    ours = visualize.ethogram_events(pd.DataFrame(probs, columns=BEHAVIORS), BEHAVIORS)
    assert set(ours["walk"]) == {(0, 5)}    # argmax: tie -> first column
    assert set(ours["rest"]) == set()


@pytest.mark.parametrize("seed", [0, 1])
def test_binned_export_matches_reference(ref_vp, tmp_path, seed):
    """The reference generate_and_save_data run for real over multiple
    natural-sort-ordered segment CSVs vs our stitch_outputs +
    export_binned_csv: per-behavior binned counts equal (NaN-aware).
    Segment numbers 2 < 10 order correctly only under natural sort."""
    rng = np.random.default_rng(200 + seed)
    rec = tmp_path / "recs" / "s1" / "m0"
    rec.mkdir(parents=True)
    for seg, n in [(2, 900), (10, 700), (11, 500)]:
        name = f"cam_{seg}"
        (rec / f"{name}.mp4").touch()
        pd.DataFrame(_random_probs(rng, n), columns=BEHAVIORS).to_csv(
            rec / f"{name}_m1_outputs.csv", index=False
        )
    out_ref = tmp_path / "out_ref"
    out_ref.mkdir()

    ref_vp.gui_state.proj = types.SimpleNamespace(
        recordings={"s1": {"m0": types.SimpleNamespace(path=str(rec))}}
    )
    try:
        # reference signature: (output_directory, root, sub_dir, model,
        # behaviors, framerate, binsize, start, threshold-percent) — all
        # GUI strings (visualize_page.py:203-213)
        ref_vp.generate_and_save_data(
            str(out_ref), "s1", "m0", "m1", list(BEHAVIORS), "10", "1", "0", "70"
        )
    finally:
        ref_vp.gui_state.proj = None
    ref_csvs = glob.glob(str(out_ref / "BinnedData_m0_m1_*.csv"))
    assert len(ref_csvs) == 1
    ref_df = pd.read_csv(ref_csvs[0])

    df = visualize.stitch_outputs(str(rec), "m1")
    ours_path = str(tmp_path / "ours.csv")
    assert visualize.export_binned_csv(
        df, BEHAVIORS, 10.0, 1, 0.70, ours_path
    ) == ours_path
    ours_df = pd.read_csv(ours_path)

    assert len(ours_df) == len(ref_df)
    for b in BEHAVIORS:
        np.testing.assert_allclose(
            ours_df[b].to_numpy(), ref_df[b].to_numpy(), err_msg=f"behavior {b!r}"
        )


def test_classified_video_tree_matches_reference(ref_vp, tmp_path):
    """The reference's nested-list classified-video tree
    (visualize_page.py:361-400) vs our zero-arg Api.get_classified_video_tree
    wire shape on the same recordings directory: identical structure."""
    from cbas_tpu.app.api import Api
    from cbas_tpu.app.state import AppState
    from cbas_tpu.core.project import Project

    proj = Project.create_project(str(tmp_path / "projects"), "p")
    rng = np.random.default_rng(7)
    layout = {
        "20240101": {"m0": [("m0_00001", True), ("m0_00002", False)]},
        "20240102": {"m1": [("m1_00001", True)], "m2": []},
    }
    for session, subjects in layout.items():
        for subject, videos in subjects.items():
            d = os.path.join(proj.recordings_dir, session, subject)
            os.makedirs(d)
            for stem, classified in videos:
                open(os.path.join(d, f"{stem}.mp4"), "wb").close()
                if classified:
                    pd.DataFrame(
                        _random_probs(rng, 10), columns=BEHAVIORS
                    ).to_csv(os.path.join(d, f"{stem}_m1_outputs.csv"), index=False)

    ref_vp.gui_state.proj = types.SimpleNamespace(recordings_dir=proj.recordings_dir)
    try:
        ref_tree = ref_vp.get_classified_video_tree()
    finally:
        ref_vp.gui_state.proj = None

    state = AppState()
    state.project = Project(proj.path)
    ours = Api(state).get_classified_video_tree()
    assert ours == ref_tree

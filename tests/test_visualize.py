"""Visualization tests: activity semantics, binning, actogram, ethogram, export."""

import base64
import os

import numpy as np
import pandas as pd
import pytest

from cbas_tpu.app.visualize import (
    Actogram,
    activity_from_probs,
    bin_activity,
    binned_export_filename,
    ethogram_blob,
    ethogram_events,
    export_binned_csv,
    render_actogram_figure,
    stitch_outputs,
)


def test_activity_requires_argmax_and_threshold():
    df = pd.DataFrame(
        {"walk": [0.9, 0.6, 0.4, 0.8], "rest": [0.1, 0.7, 0.3, 0.1]}
    )
    # frame0: walk argmax+above -> 1; frame1: rest argmax -> 0 for walk;
    # frame2: walk argmax but 0.4 < 0.7 -> 0; frame3: active.
    act = activity_from_probs(df, "walk", threshold=0.7)
    np.testing.assert_array_equal(act, [1, 0, 0, 1])
    assert activity_from_probs(df, "missing", 0.5).size == 0


def test_bin_activity_partial_final_bin():
    act = np.ones(10)
    np.testing.assert_array_equal(bin_activity(act, 4), [4, 4, 2])


def test_stitch_outputs_natural_order(tmp_path):
    for seg, val in ((10, 0.1), (2, 0.2)):
        pd.DataFrame({"walk": [val], "rest": [1 - val]}).to_csv(
            tmp_path / f"cam_{seg:05d}_m_outputs.csv", index=False
        )
    df = stitch_outputs(str(tmp_path), "m")
    # Segment 2 comes before segment 10.
    assert df["walk"].tolist() == [0.2, 0.1]
    assert stitch_outputs(str(tmp_path), "othermodel") is None


def make_prob_df(n_frames, framerate=10):
    """Two days of alternating 12h active / 12h rest at 10 fps (scaled down)."""
    rng = np.random.default_rng(0)
    walk = rng.uniform(0, 0.3, n_frames)
    # Activity bursts in the first half of each "day" (here: 1000-frame days)
    day = 1000
    for d in range(n_frames // day + 1):
        s = d * day
        walk[s : s + day // 2] = rng.uniform(0.8, 1.0, min(day // 2, n_frames - s))
    walk = walk[:n_frames]
    return pd.DataFrame({"walk": walk, "rest": 1 - walk})


@pytest.mark.parametrize("lightcycle", ["LD", "DD", "LL"])
def test_actogram_produces_blob(lightcycle):
    # framerate such that one day = 1000 frames: fr*86400 = 1000 -> fr ~ 0.01157
    fr = 1000 / 86400
    df = make_prob_df(2500)
    acto = Actogram(
        behavior="walk",
        framerate=fr,
        start=6.0,
        binsize_minutes=60,
        threshold=0.7,
        lightcycle=lightcycle,
        plot_acrophase=True,
        preloaded_df=df,
        model="m",
    )
    assert acto.blob is not None
    assert base64.b64decode(acto.blob)[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(acto.binned_activity) > 24


def test_actogram_invalid_params_no_blob():
    df = make_prob_df(100)
    assert Actogram("walk", 0, 0, 60, 0.5, preloaded_df=df).blob is None
    assert Actogram("walk", 10, 0, 0, 0.5, preloaded_df=df).blob is None
    assert Actogram("nope", 10, 0, 60, 0.5, preloaded_df=df).blob is None


def test_render_actogram_acrophase_points():
    # All activity at hours 0-6 of a 24h day, 1h bins.
    binned = np.zeros(48)
    binned[0:6] = 10
    binned[24:30] = 10
    fig = render_actogram_figure(
        binned, [h < 12 for h in range(24)], 24.0, 60, "t", 0.0, plot_acrophase=True
    )
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def _acrophase_xs(fig):
    """X positions of the red acrophase markers on the left (first-plot) half."""
    ax = fig.axes[0]
    xs = [ln.get_xdata()[0] for ln in ax.lines if ln.get_marker() == "o"]
    return sorted(x for x in xs if x < 24)


def test_acrophase_not_double_shifted_by_start_hour(tmp_path):
    """Recording starts at 06:00 with all activity at real hours 6-12: the
    marker must sit near the activity's center (~09:00) — the reference adds
    start_hour_offset to an already time-of-day-aligned grid (cbas.py:592)
    and would plot it at ~15:00 (documented deviation)."""
    import matplotlib.pyplot as plt

    binned = np.full(18, 0.0)  # 18 hours recorded: 06:00 -> 24:00
    binned[0:6] = 10           # activity 06:00-12:00
    fig = render_actogram_figure(
        binned, [h < 12 for h in range(24)], 24.0, 60, "t", 6.0,
        plot_acrophase=True,
    )
    xs = _acrophase_xs(fig)
    plt.close(fig)
    assert len(xs) == 1
    assert 7.0 < xs[0] < 11.0  # ~9h, NOT ~15h


def test_light_underlay_survives_odd_bin_sizes():
    """90-minute bins: the reference's repeat(60//90)=0 erases the LD
    underlay; the per-bin sampling keeps it exactly bins_per_period wide."""
    from cbas_tpu.app.visualize import _light_pattern

    cycle = [h < 12 for h in range(24)]
    for bsm in (90, 45, 60, 7):
        bp = int(24 * 60 / bsm)
        pattern, _ = _light_pattern(cycle, bp)
        assert pattern.shape == (bp,)
        assert pattern[0] == 1 and pattern[-1] == 0  # light morning, dark night
    # transition lands at noon for a divisor bin size
    pattern, _ = _light_pattern(cycle, 24)
    assert list(pattern[:12]) == [1] * 12 and list(pattern[12:]) == [0] * 12


def test_export_binned_csv(tmp_path):
    df = make_prob_df(2000)
    fr = 1000 / 86400
    out = export_binned_csv(
        df, ["walk", "rest"], fr, 60, 0.7, str(tmp_path / "binned.csv")
    )
    table = pd.read_csv(out)
    assert {"bin_index", "walk", "rest"} <= set(table.columns)
    assert len(table) >= 24
    name = binned_export_filename("mouse1", "m")
    assert name.startswith("BinnedData_mouse1_m_") and name.endswith(".csv")


def test_ethogram_events_and_blob():
    df = pd.DataFrame(
        {
            "walk": [0.9, 0.9, 0.1, 0.1, 0.9],
            "background": [0.1, 0.1, 0.9, 0.9, 0.1],
        }
    )
    ev = ethogram_events(df, ["walk", "background"])
    assert ev["walk"] == [(0, 2), (4, 1)]
    assert ev["background"] == [(2, 2)]
    blob = ethogram_blob(df, ["walk", "background"], framerate=10)
    assert base64.b64decode(blob)[:8] == b"\x89PNG\r\n\x1a\n"


def test_activity_threshold_zero_is_argmax_only():
    """threshold 0 must mean 'active iff argmax' — (probs*is_max) >= 0 marked
    every frame of every behavior active (review r2 finding)."""
    df = pd.DataFrame({"walk": [0.9, 0.2], "rest": [0.1, 0.8]})
    np.testing.assert_array_equal(activity_from_probs(df, "walk", 0.0), [1, 0])
    np.testing.assert_array_equal(activity_from_probs(df, "rest", 0.0), [0, 1])


def test_stitch_outputs_model_name_suffix_disambiguation(tmp_path):
    """'mouse_model' must not stitch 'big_mouse_model' CSVs when the real
    videos are present to disambiguate (review r2 finding)."""
    for stem, model, val in (
        ("cam_00001", "mouse_model", 0.1),
        ("cam_00001", "big_mouse_model", 0.9),
    ):
        pd.DataFrame({"walk": [val], "rest": [1 - val]}).to_csv(
            tmp_path / f"{stem}_{model}_outputs.csv", index=False
        )
    (tmp_path / "cam_00001.mp4").write_bytes(b"x")  # sibling disambiguates
    df = stitch_outputs(str(tmp_path), "mouse_model")
    assert df["walk"].tolist() == [0.1]


def test_stitch_outputs_excludes_aug_csvs(tmp_path):
    """_aug siblings are training-only artifacts; their classification CSVs
    must not double-count (and, via the lexicographic fallback, scramble)
    the actogram timeline."""
    for seg in (1, 2):
        pd.DataFrame({"walk": [seg / 10], "rest": [1 - seg / 10]}).to_csv(
            tmp_path / f"cam_{seg:05d}_m_outputs.csv", index=False
        )
        (tmp_path / f"cam_{seg:05d}.mp4").write_bytes(b"")
        pd.DataFrame({"walk": [0.9], "rest": [0.1]}).to_csv(
            tmp_path / f"cam_{seg:05d}_aug_m_outputs.csv", index=False
        )
        (tmp_path / f"cam_{seg:05d}_aug.mp4").write_bytes(b"")
    df = stitch_outputs(str(tmp_path), "m")
    assert len(df) == 2  # two real segments, no aug rows
    assert df["walk"].tolist() == [0.1, 0.2]

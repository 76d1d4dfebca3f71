"""Reuse-gated encode fidelity gate (reduced fixture).

The full-size measurement (ViT-B, 2000 frames at 256x256, tile x threshold
sweep) runs on the TPU host via ``python -m cbas_tpu.tools.reuse_fidelity``
and its table lives in docs/TPU.md. This test locks the recommended
default's behavior on a small fixture: the head's argmax predictions after
reuse-gated encode must agree with dense encode on >= 99% of frames, and
the reuse gate must actually engage on the static spans (otherwise the
throughput claim is vacuous).
"""

import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.tools.reuse_fidelity import run

# docs/TPU.md "Inter-frame embedding reuse": the tile-max gate (r5) reuses
# every static frame for any threshold in [4, 12] on the full-size fixture
# (84.8% = the fixture's static ceiling) while whole-frame MAD (r4) capped
# safe reuse at ~70%. 6.0 with the default 32px tile is the recommended
# middle of the plateau (~2.5x the per-tile noise floor at +-3 DN noise).
RECOMMENDED_THRESHOLD = 6.0
RECOMMENDED_TILE = 32


def test_reuse_default_threshold_agreement():
    report = run([RECOMMENDED_THRESHOLD], n_frames=300, size=64,
                 seq_len=15, epochs=3, tiny=True, tiles=[RECOMMENDED_TILE])
    row = report["rows"][0]
    assert row["reuse_pct"] >= 60.0, (
        f"gate barely engaged ({row['reuse_pct']}% reuse) — fixture or gate broken"
    )
    assert row["argmax_agreement_pct"] >= 99.0, (
        f"reuse at the recommended threshold changed predictions: "
        f"{row['argmax_agreement_pct']}% agreement"
    )
    assert row["cosine_mean"] >= 0.999


def test_tile_gate_sees_small_motion_whole_frame_misses():
    """The reason the tile gate exists: at a threshold above the whole-frame
    noise floor, the legacy gate reuses THROUGH motion frames (blind) while
    the tile gate re-keys on them. Compare key counts on the same clip."""
    r = run([6.0], n_frames=200, size=64, seq_len=15, epochs=2, tiny=True,
            tiles=[0, 32])
    frame_row = next(x for x in r["rows"] if x["tile"] == 0)
    tile_row = next(x for x in r["rows"] if x["tile"] == 32)
    # the whole-frame gate at T=6 swallows nearly everything (including
    # motion); the tile gate must keep re-keying on the moving bursts
    assert frame_row["reuse_pct"] > tile_row["reuse_pct"], (
        f"tile gate should re-key more than the blind whole-frame gate: "
        f"{tile_row} vs {frame_row}"
    )
    assert tile_row["argmax_agreement_pct"] >= 99.0

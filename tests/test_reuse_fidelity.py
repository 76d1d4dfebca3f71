"""Reuse-gated encode fidelity gate (reduced fixture).

The full-size measurement (ViT-B, 2000 frames at 256x256, thresholds
1/2/3/5) runs on the TPU host via ``python -m cbas_tpu.tools.reuse_fidelity``
and its table lives in docs/TPU.md. This test locks the recommended
default threshold's behavior on a small fixture: the head's argmax
predictions after reuse-gated encode must agree with dense encode on
>= 99% of frames, and the reuse gate must actually engage on the static
spans (otherwise the 3x throughput claim is vacuous).
"""

import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.tools.reuse_fidelity import run

# docs/TPU.md "Inter-frame embedding reuse": 1.0 is the measured default —
# the full-size table showed thresholds >= 2 swallow small-animal motion
# (whole-frame MAD barely moves), collapsing moving-class F1.
RECOMMENDED_THRESHOLD = 1.0


def test_reuse_default_threshold_agreement():
    report = run([RECOMMENDED_THRESHOLD], n_frames=300, size=64,
                 seq_len=15, epochs=3, tiny=True)
    row = report["rows"][0]
    assert row["reuse_pct"] >= 50.0, (
        f"gate barely engaged ({row['reuse_pct']}% reuse) — fixture or gate broken"
    )
    assert row["argmax_agreement_pct"] >= 99.0, (
        f"reuse at the recommended threshold changed predictions: "
        f"{row['argmax_agreement_pct']}% agreement"
    )
    assert row["cosine_mean"] >= 0.999

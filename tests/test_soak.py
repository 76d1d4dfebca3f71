"""Reduced-scale soak smoke: the sustained-cameras harness (tools/soak.py)
runs the production watcher -> encode -> live-classify stack against
wall-clock-paced segment arrivals and judges backlog boundedness.

The full-scale measurement (real ViT-B, 10 min, binary search) runs on the
TPU host via ``python -m cbas_tpu.tools.soak --search ...`` and is recorded
in benchmarks/bench_all.json; this test proves the harness itself: segments
flow through to CSVs, the trace is populated, and the sustained judgement
is reached on a tiny encoder.
"""

import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.tools.soak import run_soak


def test_soak_tiny_sustained(tmp_path):
    r = run_soak(cameras=2, minutes=0.3, segment_seconds=5, size=32,
                 tiny=True, project_dir=str(tmp_path))
    assert r.segments_delivered >= 4            # feeder paced correctly
    assert r.segments_encoded >= 2              # H5s written via the workers
    assert r.segments_classified >= 1           # live chain produced CSVs
    assert r.actograms_generated >= 1           # visualize path ran in-loop
    assert r.trace, "queue trace must be populated"
    # A 1-layer encoder on 32x32 5-second segments must keep up; if this
    # flakes the harness's sustained judgement itself is broken.
    assert r.sustained, r.reason

"""Smoke tests for the diagnostic CLIs that had no coverage.

``validate_kernels`` is the post-upgrade on-device numerics gate
(reference analog: ad-hoc notebook checks; here a CI-able exit code) —
on CPU it runs the Pallas kernels in interpret mode, which still catches
masking/packing logic bugs even though it can't prove Mosaic compilation.
``compare_encoders`` mirrors the reference's compare_encoders.py CLS
attention-map comparison.
"""

import os

import cv2
import numpy as np
import pytest

from cbas_tpu.tools.validate_kernels import main as validate_main


def test_validate_kernels_passes_on_tiny_geometries(capsys):
    # rope + non-rope + an odd token count (edge-block path), packed layout
    # covered by the d=64/even-H geometry.
    rc = validate_main(geometries=[(1, 2, 24, 8, True), (1, 2, 19, 64, False)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "packed vs fp64" in out  # the packed kernel actually ran
    assert "FAIL" not in out


def test_validate_kernels_detects_failure(capsys, monkeypatch):
    # Sabotage the fused kernel; the gate must return nonzero, proving the
    # tolerance check can actually fail (not a tautology).
    import cbas_tpu.tools.validate_kernels as vk
    import cbas_tpu.ops.flash_attention as fa

    real = fa.fused_attention

    def broken(q, k, v, scale, **kw):
        return real(q, k, v, scale * 1.5, **kw)

    monkeypatch.setattr(fa, "fused_attention", broken)
    rc = vk.main(geometries=[(1, 2, 16, 8, False)])
    assert rc != 0
    assert "FAIL" in capsys.readouterr().out


@pytest.mark.slow
def test_compare_encoders_writes_panel(tmp_path):
    img_path = str(tmp_path / "frame.png")
    rng = np.random.default_rng(0)
    cv2.imwrite(img_path, rng.integers(0, 255, (64, 64, 3), np.uint8))

    out = str(tmp_path / "cmp.png")
    from cbas_tpu.tools.compare_encoders import main as cmp_main

    cmp_main([
        "--image", img_path,
        "--encoders", "facebook/dinov3-vits16",
        "--out", out,
        "--random-init",
    ])
    assert os.path.getsize(out) > 5000

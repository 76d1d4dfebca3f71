"""Filename conventions shared across the framework.

These encode the on-disk contract inherited from the reference project layout
(reference: ProjectDirectory.md, backend/cbas.py:409,471,679-711): every video
``<stem>.mp4`` may have a sibling embedding file ``<stem>_cls.h5`` and per-model
probability tables ``<stem>_<model>_outputs.csv``.
"""

from __future__ import annotations

import os
import re
from typing import Optional

H5_SUFFIX = "_cls.h5"
OUTPUTS_SUFFIX = "_outputs.csv"


def h5_path_for_video(video_path: str) -> str:
    return os.path.splitext(video_path)[0] + H5_SUFFIX


def video_path_for_h5(h5_path: str) -> str:
    assert h5_path.endswith(H5_SUFFIX), h5_path
    return h5_path[: -len(H5_SUFFIX)] + ".mp4"


def outputs_csv_for_h5(h5_path: str, model_name: str) -> str:
    return h5_path.replace(H5_SUFFIX, f"_{model_name}{OUTPUTS_SUFFIX}")


def canonical_encoder_identity(identifier: str) -> str:
    """Machine-independent identity of an encoder identifier.

    HF-style ids ("facebook/dinov3-vitb16") are their own identity. Local
    checkpoint paths reduce to their directory/file basename so H5 stamps and
    model-bundle encoder guards written on one machine still match after the
    project moves (a project-local encoder resolves to a different absolute
    path on every host — see core/project.py encoder_model_identifier)."""
    s = identifier.rstrip("/\\")
    if os.path.isabs(s) or os.path.isdir(s) or os.path.isfile(s):
        return os.path.basename(s)
    return s


def outputs_csv_for_video(video_path: str, model_name: str) -> str:
    return os.path.splitext(video_path)[0] + f"_{model_name}{OUTPUTS_SUFFIX}"


def video_for_outputs_csv(csv_path: str, model_name: str) -> str:
    return csv_path.replace(f"_{model_name}{OUTPUTS_SUFFIX}", ".mp4")


_SEGMENT_RE = re.compile(r"_(\d+)(?:_aug)?\.mp4$")


def segment_index(video_path: str) -> int:
    """Numeric segment suffix of a recorded video file, or -1 if unnumbered.

    Recorded segments are named ``<camera>_%05d.mp4`` (reference:
    backend/cbas.py:686-689); augmented siblings carry an ``_aug`` suffix.
    """
    m = _SEGMENT_RE.search(os.path.basename(video_path))
    return int(m.group(1)) if m else -1


def sort_videos_by_segment(paths: list[str]) -> list[str]:
    return sorted(paths, key=segment_index)


def natural_sort_outputs(paths: list[str], model_name: str) -> list[str]:
    """Sort per-segment output CSVs in recording order.

    Mirrors the natural-sort-by-segment used when stitching actogram input CSVs
    (reference: backend/cbas.py:982-986).
    """
    rx = re.compile(r"_(\d+)_" + re.escape(model_name))

    def key(p: str) -> Optional[int]:
        m = rx.search(os.path.basename(p))
        return int(m.group(1)) if m else None

    if all(key(p) is not None for p in paths):
        return sorted(paths, key=key)
    return sorted(paths)

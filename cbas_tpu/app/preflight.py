"""Pre-training gates and review playlists.

Host-side checks that run before expensive device work:

- :func:`run_preflight_check` — simulates the 3-way subject split allocation
  and verifies behavior coverage (reference: backend/label_train_page.py:43-122)
- :func:`check_dataset_files_ready` — verifies every labeled video has its
  embedding file before training starts (reference: label_train_page.py:246-291)
- :func:`get_disagreement_playlist` — the review queue from
  disagreement_report.yaml: per-video best (highest-confidence) error, aug
  videos remapped to their canonical sources, top N
  (reference: label_train_page.py:1637-1701)
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Tuple

from cbas_tpu.core.config import load_yaml
from cbas_tpu.core.project import Project
from cbas_tpu.core.splits import subject_of
from cbas_tpu.utils.naming import h5_path_for_video


def run_preflight_check(project: Project, dataset_name: str, test_split: float) -> dict:
    """Fast file-only simulation of the split a training run would make."""
    try:
        dataset = project.datasets.get(dataset_name)
        if dataset is None:
            return {"is_valid": False, "message": "Dataset not found."}
        all_insts = dataset.all_instances()
        behaviors = set(dataset.config.get("behaviors", []))
        if not behaviors:
            return {"is_valid": False, "message": "Dataset has no defined behaviors."}

        group_insts: Dict[str, list] = defaultdict(list)
        group_behaviors: Dict[str, set] = defaultdict(set)
        for inst in all_insts:
            g = subject_of(inst)
            group_insts[g].append(inst)
            group_behaviors[g].add(inst["label"])
        groups = sorted(group_insts.keys())
        if len(groups) < 3:
            return {
                "is_valid": False,
                "message": f"Not enough subjects/groups ({len(groups)}) to form a 3-way split.",
            }

        total = len(all_insts)
        test_groups, val_groups, train_groups = set(), set(), set()
        test_count = 0
        for g in groups:
            if total > 0 and (test_count / total) < test_split:
                test_groups.add(g)
                test_count += len(group_insts[g])
        remaining = [g for g in groups if g not in test_groups]
        remaining_total = sum(len(group_insts[g]) for g in remaining)
        val_count = 0
        if remaining_total > 0:
            for g in remaining:
                if val_count / remaining_total < 0.2:
                    val_groups.add(g)
                    val_count += len(group_insts[g])
                else:
                    train_groups.add(g)
        else:
            train_groups = set(remaining)

        if not train_groups or not val_groups:
            return {
                "is_valid": False,
                "message": "Split resulted in an empty train or validation set.",
            }
        train_b = {b for g in train_groups for b in group_behaviors[g]}
        if train_b != behaviors:
            return {
                "is_valid": False,
                "message": f"Train set would be missing behaviors: {', '.join(sorted(behaviors - train_b))}",
            }
        val_b = {b for g in val_groups for b in group_behaviors[g]}
        if val_b != behaviors:
            return {
                "is_valid": False,
                "message": f"Validation set would be missing behaviors: {', '.join(sorted(behaviors - val_b))}",
            }
        test_b = {b for g in test_groups for b in group_behaviors[g]}
        if test_b and test_b != behaviors:
            return {
                "is_valid": True,
                "message": (
                    f"Warning: Test set will be missing behaviors: "
                    f"{', '.join(sorted(behaviors - test_b))}. Proceed with caution."
                ),
            }
        return {"is_valid": True, "message": "Split is valid. Ready to train."}
    except Exception as e:
        return {"is_valid": False, "message": f"An unexpected error occurred: {e}"}


def check_dataset_files_ready(project: Project, dataset_name: str) -> Tuple[bool, str]:
    """All labeled videos must have their ``*_cls.h5`` before training."""
    dataset = project.datasets.get(dataset_name)
    if dataset is None:
        return False, f"Dataset '{dataset_name}' not found."
    try:
        videos = {
            str(inst["video"])
            for insts in dataset.labels.get("labels", {}).values()
            for inst in insts
            if "video" in inst
        }
        if not videos:
            return False, "The dataset contains no labeled video instances."
        missing = [
            os.path.basename(rel)
            for rel in videos
            if not os.path.exists(h5_path_for_video(os.path.join(project.path, rel)))
        ]
        if not missing:
            return True, "All necessary files are ready for training."
        msg = (
            f"{len(missing)} of {len(videos)} required feature files (.h5) "
            "are still missing."
        )
        shown = missing[:3]
        msg += f"\nMissing: {', '.join(shown)}" + (", and others..." if len(missing) > 3 else "")
        return False, msg
    except Exception as e:
        return False, f"An unexpected error occurred: {e}"


def get_disagreement_playlist(
    project: Project, dataset_name: str, max_items: int = 50
) -> List[dict]:
    """Review queue: one highest-confidence disagreement per video, aug
    videos remapped to their canonical sources, sorted by confidence."""
    dataset = project.datasets.get(dataset_name)
    if dataset is None:
        return []
    report_path = os.path.join(dataset.path, "disagreement_report.yaml")
    if not os.path.exists(report_path):
        return []
    items = load_yaml(report_path) or []

    best_per_video: Dict[str, dict] = {}
    for item in items:
        video = str(item.get("video_path", ""))
        # _aug videos point the reviewer at the canonical source video.
        stem, ext = os.path.splitext(video)
        if stem.endswith("_aug"):
            canonical = stem[: -len("_aug")] + ext
            if os.path.exists(os.path.join(project.path, canonical)):
                item = dict(item)
                item["video_path"] = canonical
                video = canonical
        cur = best_per_video.get(video)
        if cur is None or item.get("model_confidence", 0) > cur.get("model_confidence", 0):
            best_per_video[video] = item

    playlist = sorted(
        best_per_video.values(),
        key=lambda x: x.get("model_confidence", 0),
        reverse=True,
    )
    return playlist[:max_items]

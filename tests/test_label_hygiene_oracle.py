"""Differential oracle: label hygiene vs the reference's actual code.

Loads the *actual* reference module (/root/reference/backend/label_train_page.py,
GUI/runtime deps stubbed) and runs its ``clean_and_sort_labels`` /
``analyze_label_conflicts`` (label_train_page.py:797-978) side by side with
ours (cbas_tpu/core/labels.py) on randomized label documents, so the cleanup
semantics the UI's "Clean & Sort" button applies are differentially tested,
not just re-derived from the same survey notes.

One deviation is deliberate and pinned here rather than papered over: on a
SAME-label overlap the reference discards the entire overlapping piece
(label_train_page.py:920 ``continue``) — walk[0,10] + walk[5,20] loses frames
11-20 of user labels permanently — while we trim-then-merge, resolving it to
the interval union (docs/Compatibility.md). The equality oracle therefore
generates docs free of same-label overlaps; a dedicated test asserts the
exact shape of the divergence on the cases where we intentionally differ.
"""

from __future__ import annotations

import copy
import os
import types
from collections import defaultdict

import pytest
import yaml

from cbas_tpu.core.labels import analyze_label_conflicts, clean_and_sort_labels
from tests.conftest import load_reference_page, stub_module


@pytest.fixture(scope="module")
def ref_ltp():
    """Reference backend/label_train_page.py with GUI deps stubbed.

    eel/cmap/watchdog aren't installed (we replaced the Eel websocket stack
    with a stdlib JSON-RPC+SSE server) and workthreads spins up GUI worker
    threads; none are touched by the pure label-hygiene functions under test.
    """
    stubs = {
        "eel": stub_module("eel", expose=lambda f: f, spawn=lambda *a, **k: None),
        "cmap": stub_module("cmap", Colormap=lambda *a, **k: None),
        "workthreads": stub_module("workthreads", log_message=lambda *a, **k: None),
        "gui_state": stub_module("gui_state", proj=None),
    }
    with load_reference_page("label_train_page", stubs) as mod:
        yield mod


def _ref_run(ref_ltp, tmp_path, labels_doc, fn_name):
    """Point the reference at a real labels.yaml (its functions take a
    dataset NAME and resolve gui_state.proj.datasets[name].labels_path,
    then read — and for cleaning, rewrite — the file)."""
    labels_path = os.path.join(str(tmp_path), "labels.yaml")
    with open(labels_path, "w") as f:
        yaml.dump(labels_doc, f, allow_unicode=True, sort_keys=False)
    ds = types.SimpleNamespace(labels_path=labels_path)
    ref_ltp.gui_state.proj = types.SimpleNamespace(datasets={"d": ds})
    try:
        result = getattr(ref_ltp, fn_name)("d")
    finally:
        ref_ltp.gui_state.proj = None
    if fn_name == "analyze_label_conflicts":
        return result
    assert result is True
    with open(labels_path) as f:
        return yaml.safe_load(f)


BEHAVIORS = ["walk", "rest", "groom", "eat"]
VIDEOS = ["s1/m0/m0_00001.mp4", "s1\\m1\\m1_00001.mp4", "s2/m0/m0_00002.mp4"]


def _random_doc(rng, n, allow_same_label_overlap, separator_variants=True):
    """A messy labels.yaml document: unsorted, duplicated (incl. separator
    variants of the same path), overlapping, with session keys to strip."""
    by_behavior = defaultdict(list)
    for _ in range(n):
        b = BEHAVIORS[int(rng.integers(len(BEHAVIORS)))]
        v = VIDEOS[int(rng.integers(len(VIDEOS)))]
        start = int(rng.integers(0, 400))
        inst = {
            "video": v,
            "start": start,
            "end": start + int(rng.integers(0, 60)),
            "label": b,
        }
        if rng.random() < 0.3:
            inst["_confirmed"] = True
        by_behavior[b].append(inst)
        if rng.random() < 0.25:  # exact duplicate, sometimes under \\ spelling
            dup = dict(inst)
            if separator_variants and rng.random() < 0.5:
                dup["video"] = dup["video"].replace("/", "\\")
            by_behavior[b].append(dup)
    if not allow_same_label_overlap:
        # Keep only the first instance of any same-video same-label
        # overlapping pair (where the two implementations deliberately
        # differ); cross-label overlaps — the interesting trim cases — stay.
        for b, insts in by_behavior.items():
            kept = []
            for inst in insts:
                clash = any(
                    k["video"].replace("\\", "/") == inst["video"].replace("\\", "/")
                    and max(k["start"], inst["start"]) <= min(k["end"], inst["end"])
                    and (inst["start"], inst["end"]) != (k["start"], k["end"])
                    for k in kept
                )
                if not clash:
                    kept.append(inst)
            by_behavior[b] = kept
    return {"behaviors": list(BEHAVIORS), "labels": dict(by_behavior)}


@pytest.mark.parametrize("seed", range(6))
def test_clean_and_sort_matches_reference(ref_ltp, tmp_path, seed):
    """Byte-equal cleaned documents on docs without same-label overlaps:
    dedupe (separator-normalized), cross-label trim (first-wins by
    start/longest), adjacent same-label merge, final sort, session-key
    stripping (reference: label_train_page.py:857-978)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    doc = _random_doc(rng, n=40, allow_same_label_overlap=False)

    ref_out = _ref_run(ref_ltp, tmp_path, copy.deepcopy(doc), "clean_and_sort_labels")
    ours = clean_and_sort_labels(copy.deepcopy(doc))

    # The reference leaves behaviors whose instances were all trimmed away as
    # absent keys, same as ours; compare the full normalized structure.
    assert ours["behaviors"] == ref_out["behaviors"]
    assert sorted(ours["labels"]) == sorted(ref_out["labels"])
    for b in ref_out["labels"]:
        assert ours["labels"][b] == ref_out["labels"][b], f"behavior {b!r} diverged"


@pytest.mark.parametrize("seed", range(6))
def test_conflict_dry_run_matches_reference(ref_ltp, tmp_path, seed):
    """Duplicate/overlap counts equal on fully random docs — including
    same-label overlaps: the dry-run COUNTING has no deviation, only the
    cleanup resolution does (reference: label_train_page.py:797-855)."""
    import numpy as np

    rng = np.random.default_rng(100 + seed)
    # The reference's dry run keys duplicates and overlap groups on the RAW
    # video string (label_train_page.py:824-843); ours normalizes \\ -> /
    # first (the dry run must predict what cleaning — which normalizes —
    # will touch). The equality claim therefore runs on separator-variant-
    # free docs; the divergence is pinned in the dedicated test below.
    doc = _random_doc(
        rng, n=40, allow_same_label_overlap=True, separator_variants=False
    )
    doc["labels"] = {
        b: [dict(i, video=i["video"].replace("\\", "/")) for i in insts]
        for b, insts in doc["labels"].items()
    }

    ref_counts = _ref_run(
        ref_ltp, tmp_path, copy.deepcopy(doc), "analyze_label_conflicts"
    )
    ours = analyze_label_conflicts(copy.deepcopy(doc))
    assert ours["total_duplicates"] == ref_counts["total_duplicates"]
    assert ours["total_overlaps"] == ref_counts["total_overlaps"]


def test_conflict_dry_run_separator_variants(ref_ltp, tmp_path):
    """Pinned intentional difference: instances of the SAME video under /
    and \\ spellings. The reference dry-run keys on the raw string, so it
    groups them as different videos (0 overlaps, 0 duplicates) even though
    its own cleaner WILL normalize and trim/dedupe them; our dry run
    normalizes first and reports exactly what cleaning will fix."""
    doc = {
        "behaviors": ["walk", "rest"],
        "labels": {
            "walk": [
                {"video": "s1/m0/v.mp4", "start": 0, "end": 10, "label": "walk"},
                {"video": "s1/m0/v.mp4", "start": 30, "end": 40, "label": "walk"},
                {"video": "s1\\m0\\v.mp4", "start": 30, "end": 40, "label": "walk"},
            ],
            "rest": [{"video": "s1\\m0\\v.mp4", "start": 5, "end": 20, "label": "rest"}],
        },
    }
    ref_counts = _ref_run(
        ref_ltp, tmp_path, copy.deepcopy(doc), "analyze_label_conflicts"
    )
    assert ref_counts["total_overlaps"] == 0  # the reference misses both
    assert ref_counts["total_duplicates"] == 0
    ours_counts = analyze_label_conflicts(copy.deepcopy(doc))
    assert ours_counts["total_overlaps"] == 1
    assert ours_counts["total_duplicates"] == 1
    # ...and both cleaners do trim it once the paths normalize:
    ref_clean = _ref_run(ref_ltp, tmp_path, copy.deepcopy(doc), "clean_and_sort_labels")
    ours_clean = clean_and_sort_labels(copy.deepcopy(doc))
    assert ours_clean["labels"] == ref_clean["labels"]


def test_same_label_overlap_divergence_is_the_documented_union(ref_ltp, tmp_path):
    """Pinned deviation (docs/Compatibility.md): walk[0,10] + walk[5,20].
    Reference discards the overlapping piece entirely — frames 11-20 of user
    labeling are silently lost; we trim-then-merge to the union [0,20]."""
    doc = {
        "behaviors": ["walk"],
        "labels": {
            "walk": [
                {"video": "s1/m0/v.mp4", "start": 0, "end": 10, "label": "walk"},
                {"video": "s1/m0/v.mp4", "start": 5, "end": 20, "label": "walk"},
            ]
        },
    }
    ref_out = _ref_run(ref_ltp, tmp_path, copy.deepcopy(doc), "clean_and_sort_labels")
    assert ref_out["labels"]["walk"] == [
        {"video": "s1/m0/v.mp4", "start": 0.0, "end": 10.0, "label": "walk"}
    ]
    ours = clean_and_sort_labels(doc)
    assert ours["labels"]["walk"] == [
        {"video": "s1/m0/v.mp4", "start": 0.0, "end": 20.0, "label": "walk"}
    ]

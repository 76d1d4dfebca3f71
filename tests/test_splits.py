"""Split provider tests, including seed-for-seed parity with the reference."""

import json

import pytest

from cbas_tpu.core.splits import (
    ManifestSplitProvider,
    RandomSplitProvider,
    dataset_fingerprint,
    subject_of,
    write_split_manifest,
)
from tests.conftest import load_reference_module


def make_instances(n_subjects=10, behaviors=("walk", "rest"), insts_per_subject=4):
    insts = []
    for s in range(n_subjects):
        for k in range(insts_per_subject):
            insts.append(
                {
                    "video": f"recordings/sess/subj{s}/subj{s}_{k:05d}.mp4",
                    "start": k * 10,
                    "end": k * 10 + 5,
                    "label": behaviors[(s + k) % len(behaviors)],
                }
            )
    return insts


def test_subject_of_normalizes_separators():
    assert subject_of({"video": r"a\b\c.mp4"}) == "a/b"


def test_random_split_deterministic_and_disjoint():
    insts = make_instances()
    subjects = sorted({subject_of(i) for i in insts})
    p = RandomSplitProvider(seed=7)
    s1 = p.get_split(0, subjects, insts, ["walk", "rest"])
    s2 = RandomSplitProvider(seed=7).get_split(0, subjects, insts, ["walk", "rest"])
    assert s1 == s2
    train, val, test = s1
    assert set(train) | set(val) | set(test) == set(subjects)
    assert not (set(train) & set(val)) and not (set(train) & set(test))


def test_random_split_matches_reference_seed_for_seed():
    ref_splits = load_reference_module("splits")
    insts = make_instances(n_subjects=12, behaviors=("a", "b", "c"))
    subjects = sorted({subject_of(i) for i in insts})
    behaviors = ["a", "b", "c"]
    for seed in (1, 42, 1234):
        for run in range(3):
            ours = RandomSplitProvider(seed=seed).get_split(run, subjects, insts, behaviors)
            theirs = ref_splits.RandomSplitProvider(seed=seed).get_split(
                run, subjects, insts, behaviors
            )
            assert ours == theirs, (seed, run)


def test_random_split_zero_test_ratio_matches_reference():
    ref_splits = load_reference_module("splits")
    insts = make_instances(n_subjects=9)
    subjects = sorted({subject_of(i) for i in insts})
    kw = dict(seed=42, split_ratios=(0.8, 0.0, 0.2), stratify=False)
    ours = RandomSplitProvider(**kw).get_split(0, subjects, insts, ["walk", "rest"])
    theirs = ref_splits.RandomSplitProvider(**kw).get_split(0, subjects, insts, ["walk", "rest"])
    assert ours == theirs


def test_fingerprint_matches_reference():
    ref_splits = load_reference_module("splits")
    insts = make_instances()
    labels = {"walk": [i for i in insts if i["label"] == "walk"],
              "rest": [i for i in insts if i["label"] == "rest"]}

    class FakeDataset:
        def __init__(self, labels):
            self.labels = {"labels": labels}

    ours = dataset_fingerprint(labels)
    theirs = ref_splits._generate_dataset_fingerprint(FakeDataset(labels))
    assert ours == theirs


def test_stratified_raises_without_fallback():
    # One behavior exists only for a single subject -> stratification impossible.
    insts = [
        {"video": "r/s0/v.mp4", "start": 0, "end": 1, "label": "rare"},
        {"video": "r/s1/v.mp4", "start": 0, "end": 1, "label": "common"},
        {"video": "r/s2/v.mp4", "start": 0, "end": 1, "label": "common"},
    ]
    subjects = ["r/s0", "r/s1", "r/s2"]
    p = RandomSplitProvider(seed=0)
    with pytest.raises(RuntimeError):
        p.get_split(0, subjects, insts, ["rare", "common"])
    # With fallback it degrades to a plain subject-disjoint split.
    train, val, test = p.get_split(0, subjects, insts, ["rare", "common"], allow_relaxed_fallback=True)
    assert set(train) | set(val) | set(test) == set(subjects)


def test_manifest_provider_roundtrip(tmp_path):
    insts = make_instances()
    labels = {"walk": insts}
    fp = dataset_fingerprint(labels)
    path = str(tmp_path / "splits.json")
    write_split_manifest(
        path,
        [{"train": ["a"], "validation": ["b"], "test": ["c"]}],
        fp,
    )
    prov = ManifestSplitProvider(path, fp)
    assert prov.get_split(0, [], [], []) == (["a"], ["b"], ["c"])
    with pytest.raises(IndexError):
        prov.get_split(5, [], [], [])
    with pytest.raises(ValueError):
        ManifestSplitProvider(path, "wrong-fingerprint")

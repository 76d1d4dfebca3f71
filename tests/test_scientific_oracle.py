"""Differential oracle: scientific host-side transforms vs the reference.

Loads the *actual* reference module (/root/reference/backend/cbas.py, with
its device/GUI dependencies stubbed) and asserts our pure reimplementations
produce identical results on randomized inputs:

- predictions_to_instances (threshold event extraction, cbas.py:903-926)
- predictions_to_instances_with_confidence (medfilt block grouping,
  cbas.py:928-956)
- compute_class_weights_from_instances (cbas.py:368-393)
- Actogram binned activity (argmax+threshold -> bin sums, cbas.py:958-1007)

These complement the existing oracles (splits, classifier head,
JonesLabModel artifact, golden training run) so every scientific output the
UI shows is differentially tested, not just re-derived from the same survey
notes.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

from tests.conftest import REFERENCE_BACKEND


@pytest.fixture(scope="module")
def ref_cbas(tmp_path_factory):
    """Reference backend/cbas.py with non-scientific deps stubbed.

    decord isn't installed (we replaced it with the C++ decoder) and
    gui_state holds runtime GUI globals; neither is touched by the pure
    functions under test. classifier_head/splits are the real reference
    modules.
    """
    import importlib.util

    proj_root = str(tmp_path_factory.mktemp("refproj"))
    import importlib.machinery

    def _stub_module(name):
        m = types.ModuleType(name)
        # a real ModuleSpec, or importlib.util.find_spec on the stub raises
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    stubs = {}
    if "decord" not in sys.modules:
        stubs["decord"] = _stub_module("decord")
    gs = _stub_module("gui_state")
    gs.proj = types.SimpleNamespace(path=proj_root)
    stubs["gui_state"] = gs

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    saved = {k: sys.modules.get(k) for k in
             list(stubs) + ["classifier_head", "backend", "backend.splits", "cbas_ref_oracle"]}
    try:
        sys.modules.update(stubs)
        _load("classifier_head", os.path.join(REFERENCE_BACKEND, "classifier_head.py"))
        backend_pkg = types.ModuleType("backend")
        backend_pkg.__path__ = [REFERENCE_BACKEND]
        sys.modules["backend"] = backend_pkg
        _load("backend.splits", os.path.join(REFERENCE_BACKEND, "splits.py"))
        mod = _load("cbas_ref_oracle", os.path.join(REFERENCE_BACKEND, "cbas.py"))
        yield types.SimpleNamespace(mod=mod, proj_root=proj_root)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


BEHAVIORS = ["walk", "rest", "groom", "background"]


def _random_probs(rng, n, peaky=True):
    """Rows sum to 1; peaky rows give realistic confident stretches."""
    a = rng.gamma(0.35 if peaky else 2.0, size=(n, len(BEHAVIORS)))
    # runs of the same argmax, like real behavior blocks
    for s in range(0, n, 25):
        b = int(rng.integers(len(BEHAVIORS)))
        a[s : s + 25, b] += rng.uniform(0, 3)
    return a / a.sum(axis=1, keepdims=True)


def _write_csv(tmp_path, probs, name="vid1"):
    csv = os.path.join(str(tmp_path), f"{name}_m1_outputs.csv")
    pd.DataFrame(probs, columns=BEHAVIORS).to_csv(csv, index=False)
    return csv


def _ref_dataset(ref):
    ds = types.SimpleNamespace(config={"behaviors": BEHAVIORS})
    return ds


@pytest.mark.parametrize("seed,threshold", [(0, 0.7), (1, 0.5), (2, 0.95), (3, 0.3)])
def test_predictions_to_instances_matches_reference(ref_cbas, tmp_path, seed, threshold):
    from cbas_tpu.core.labels import predictions_to_instances

    rng = np.random.default_rng(seed)
    probs = _random_probs(rng, 400)
    csv = _write_csv(tmp_path, probs)

    ref_inst = ref_cbas.mod.Dataset.predictions_to_instances(
        _ref_dataset(ref_cbas), csv, "m1", threshold=threshold
    )
    ours = predictions_to_instances(
        pd.read_csv(csv), BEHAVIORS, csv.replace("_m1_outputs.csv", ".mp4"),
        threshold=threshold,
    )
    assert len(ours) == len(ref_inst)
    for a, b in zip(ours, ref_inst):
        assert (a["start"], a["end"], a["label"], a["video"]) == (
            b["start"], b["end"], b["label"], b["video"])


@pytest.mark.parametrize("seed,smoothing", [(0, 1), (1, 5), (2, 4), (3, 15)])
def test_predictions_with_confidence_matches_reference(ref_cbas, tmp_path, seed, smoothing):
    from cbas_tpu.core.labels import predictions_to_instances_with_confidence

    rng = np.random.default_rng(100 + seed)
    probs = _random_probs(rng, 400)
    # the reference resolves instance video paths relative to the project
    # root, so the CSV must live under it
    vid_dir = os.path.join(ref_cbas.proj_root, "recordings", "s", "m")
    os.makedirs(vid_dir, exist_ok=True)
    csv = _write_csv(vid_dir, probs)

    ref_inst, ref_df = ref_cbas.mod.Dataset.predictions_to_instances_with_confidence(
        _ref_dataset(ref_cbas), csv, "m1", smoothing_window=smoothing
    )
    rel_video = os.path.relpath(
        csv.replace("_m1_outputs.csv", ".mp4"), start=ref_cbas.proj_root
    ).replace("\\", "/")
    ours, our_df = predictions_to_instances_with_confidence(
        pd.read_csv(csv), BEHAVIORS, rel_video, smoothing_window=smoothing
    )
    assert len(ours) == len(ref_inst)
    for a, b in zip(ours, ref_inst):
        assert (a["start"], a["end"], a["label"], a["video"]) == (
            b["start"], b["end"], b["label"], b["video"])
        assert a["confidence"] == pytest.approx(b["confidence"], rel=1e-12)
    # the annotated frame table drives the review timeline: grouping column
    # must agree frame for frame
    assert list(our_df["label_for_grouping"]) == list(ref_df["label_for_grouping"])


def test_class_weights_match_reference(ref_cbas):
    from cbas_tpu.engine.data import compute_class_weights

    rng = np.random.default_rng(7)
    insts = []
    for b in BEHAVIORS[:3]:  # one behavior absent entirely
        for _ in range(int(rng.integers(1, 12))):
            s = int(rng.integers(0, 500))
            insts.append({"label": b, "start": s, "end": s + int(rng.integers(0, 40))})
    ref_w = ref_cbas.mod.compute_class_weights_from_instances(insts, BEHAVIORS)
    ours = compute_class_weights(insts, BEHAVIORS)
    assert np.allclose(np.asarray(ours, float), np.asarray(ref_w, float), rtol=1e-9)


def test_infer_file_matches_genuine_reference(ref_cbas, tmp_path):
    """Product-level inference differential: our infer_file vs the
    reference's *actual* backend/cbas.py infer_file (not a re-implementation
    of its algorithm) on the same H5 and identical head weights — covers
    edge replicate-padding, temperature scaling, and the CSV artifact in one
    shot (reference: cbas.py:458-572)."""
    import torch

    from cbas_tpu.core import hdf5_store
    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.engine.infer import InferenceConfig, infer_file
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
    import jax

    behaviors = ["walk", "rest", "groom"]
    cfg = DeltasHeadConfig(in_features=64, out_features=3, seq_len=7, lstm_hidden_size=16)
    params = {
        k: np.asarray(v)
        for k, v in jax.device_get(init_deltas_params(jax.random.key(9), cfg)).items()
    }
    bundle = ClassifierBundle(
        name="ourm", behaviors=behaviors, seq_len=7, params=params,
        lstm_hidden_size=16, lstm_layers=1, temperature=1.37,
        encoder_identifier="enc",
    )

    rng = np.random.default_rng(11)
    features = rng.normal(size=(150, 64)).astype(np.float16)
    h5 = str(tmp_path / "vid_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="enc", embed_dim=64) as w:
        w.append(features)

    ref_head_mod = sys.modules["classifier_head"]
    model = ref_head_mod.ClassifierLSTMDeltas(
        in_features=64, out_features=3, seq_len=7, lstm_hidden_size=16, lstm_layers=1
    )
    model.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in params.items()})
    model.eval()
    ref_csv = ref_cbas.mod.infer_file(
        h5, model, "refm", behaviors, 7,
        device=torch.device("cpu"), temperature=1.37,
    )
    assert ref_csv is not None
    want = pd.read_csv(ref_csv)

    our_csv = infer_file(h5, bundle, config=InferenceConfig(chunk_frames=50, window_batch=32))
    got = pd.read_csv(our_csv)
    assert list(got.columns) == list(want.columns) == behaviors
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "seed,framerate,binsize,threshold,cycle",
    [(0, 10.0, 1, 0.5, "LD"), (1, 10.0, 5, 0.8, "DD"), (2, 0.0116, 60, 0.4, "LL")],
)
def test_actogram_binned_activity_matches_reference(
    ref_cbas, seed, framerate, binsize, threshold, cycle
):
    from cbas_tpu.app.visualize import Actogram

    rng = np.random.default_rng(200 + seed)
    n = 3000 if framerate > 1 else 600
    df = pd.DataFrame(_random_probs(rng, n), columns=BEHAVIORS)

    ref_act = ref_cbas.mod.Actogram(
        "walk", framerate, 6.0, binsize, threshold, cycle,
        plot_acrophase=True, preloaded_df=df,
    )
    ours = Actogram(
        behavior="walk", framerate=framerate, start=6.0, binsize_minutes=binsize,
        threshold=threshold, lightcycle=cycle, plot_acrophase=True,
        preloaded_df=df, model="m1",
    )
    assert ours.binned_activity == pytest.approx(ref_act.binned_activity)
    # both should have produced a plot blob for non-empty activity
    assert (ref_act.blob is None) == (not ours.blob)

"""Write-direction artifact oracle: bundles SAVED by this framework load in
the reference's actual consumer.

The read direction (reference-written bundles loaded by us, including the
genuine JonesLabModel artifact) is covered by test_legacy_bundle.py. This
closes the opposite claim — "reference installs can load our models"
(cbas_tpu/engine/classifier.py:7-8) — by running the real
``ClassificationThread._load_model`` (/root/reference/backend/workthreads.py:
372-451, GUI deps stubbed) against a directory our ``ClassifierBundle.save``
wrote, and asserting:

- the bundle loads as ClassifierLSTMDeltas with our hyperparameters,
- the loaded torch model's logits match our JAX head's exactly (the pth we
  write is a faithful torch state_dict),
- the calibration temperature round-trips through model_meta.json,
- the encoder-mismatch guard refuses our bundle in a foreign project,
- hyperparameter inference from weight shapes (workthreads.py:416-431) still
  works when our meta omits the lstm fields.
"""

from __future__ import annotations

import os
import types

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cbas_tpu.engine.classifier import ClassifierBundle, DELTAS_ARCH
from cbas_tpu.models.heads import DeltasHeadConfig, deltas_forward, init_deltas_params
from cbas_tpu.core.config import load_yaml
from tests.conftest import load_reference_page, stub_module

BEHAVIORS = ["eat", "drink", "rear", "climb", "rest"]


@pytest.fixture()
def ref_wt():
    errors = []

    def _cb(*a, **k):
        return lambda *a2, **k2: None

    stubs = {
        "eel": stub_module(
            "eel",
            expose=lambda f: f,
            spawn=lambda *a, **k: None,
            showErrorOnLabelTrainPage=lambda m: errors.append(m) or (lambda: None),
        ),
        "gui_state": stub_module(
            "gui_state",
            proj=None,
            print_lock=None,
            HEADLESS_MODE=True,
            log_queue=None,
            live_inference_model_object=None,
        ),
        "cmap": stub_module("cmap", Colormap=lambda name: (lambda v: f"c{v}")),
        "watchdog": stub_module("watchdog"),
        "watchdog.observers": stub_module("watchdog.observers", Observer=object),
        "watchdog.events": stub_module(
            "watchdog.events", FileSystemEventHandler=object
        ),
    }
    with load_reference_page("workthreads", stubs) as mod:
        mod._oracle_errors = errors
        yield mod


def _our_bundle(tmp_path, name="ours", temperature=1.7, encoder="enc-x",
                hidden=96, layers=2):
    cfg = DeltasHeadConfig(
        out_features=len(BEHAVIORS), seq_len=31,
        lstm_hidden_size=hidden, lstm_layers=layers,
    )
    params = init_deltas_params(jax.random.key(3), cfg)
    bundle = ClassifierBundle(
        name=name,
        behaviors=BEHAVIORS,
        seq_len=31,
        params={k: np.asarray(v) for k, v in params.items()},
        architecture=DELTAS_ARCH,
        lstm_hidden_size=hidden,
        lstm_layers=layers,
        temperature=temperature,
        encoder_identifier=encoder,
    )
    model_dir = str(tmp_path / name)
    bundle.save(model_dir)
    return bundle, cfg, model_dir


def _ref_load(ref_wt, model_dir, project_encoder):
    gs = ref_wt.gui_state
    name = os.path.basename(model_dir)
    model_obj = types.SimpleNamespace(
        path=model_dir, config=load_yaml(os.path.join(model_dir, "config.yaml"))
    )
    gs.proj = types.SimpleNamespace(
        models={name: model_obj}, encoder_model_identifier=project_encoder
    )
    thread = ref_wt.ClassificationThread("cpu")
    return thread._load_model(name)


def test_reference_loads_our_bundle_and_matches_logits(ref_wt, tmp_path):
    bundle, cfg, model_dir = _our_bundle(tmp_path)
    torch_model, meta = _ref_load(ref_wt, model_dir, project_encoder="enc-x")
    assert torch_model is not None, "reference loader rejected our bundle"
    assert type(torch_model).__name__ == "ClassifierLSTMDeltas"
    assert meta["hyperparameters"]["behaviors"] == BEHAVIORS
    assert meta["hyperparameters"]["seq_len"] == 31
    # temperature round-trips (the reference applies it at infer time,
    # backend/cbas.py:546 via workthreads.py:883)
    assert meta["calibration"]["temperature"] == pytest.approx(1.7)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 31, 768)).astype(np.float32)
    with torch.no_grad():
        want, _ = torch_model(torch.from_numpy(x))
    got, _ = deltas_forward(
        {k: jnp.asarray(v) for k, v in bundle.params.items()}, jnp.asarray(x), cfg
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5, atol=2e-5)


def test_reference_encoder_guard_refuses_foreign_bundle(ref_wt, tmp_path):
    _, _, model_dir = _our_bundle(tmp_path)
    torch_model, meta = _ref_load(ref_wt, model_dir, project_encoder="other-enc")
    assert torch_model is None and meta is None
    assert any("Encoder mismatch" in m for m in ref_wt._oracle_errors)


def test_reference_infers_hparams_when_our_meta_omits_them(ref_wt, tmp_path):
    """Strip the lstm_* hyperparameters from our meta: the reference's
    shape-inference (attention_head.weight //2, lstm.weight_ih_l<k> keys,
    workthreads.py:416-431) must still recover hidden=96, layers=2."""
    import json

    bundle, cfg, model_dir = _our_bundle(tmp_path)
    meta_path = os.path.join(model_dir, "model_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    for k in ("lstm_hidden_size", "lstm_layers"):
        del meta["hyperparameters"][k]
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    torch_model, loaded_meta = _ref_load(ref_wt, model_dir, project_encoder="enc-x")
    assert torch_model is not None
    assert loaded_meta["hyperparameters"]["lstm_hidden_size"] == 96
    assert loaded_meta["hyperparameters"]["lstm_layers"] == 2
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 31, 768)).astype(np.float32)
    with torch.no_grad():
        want, _ = torch_model(torch.from_numpy(x))
    got, _ = deltas_forward(
        {k: jnp.asarray(v) for k, v in bundle.params.items()}, jnp.asarray(x), cfg
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5, atol=2e-5)

"""Loading reference-style legacy (v2) model bundles: model.pth + config.yaml,
no model_meta.json — the JonesLabModel format (reference: README.md:176-194,
backend/workthreads.py:379-441)."""

import os

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import dump_yaml
from cbas_tpu.engine.classifier import LEGACY_ARCH, ClassifierBundle
from cbas_tpu.engine.infer import infer_file
from cbas_tpu.core.config import InferenceConfig
from tests.conftest import load_reference_module

ref_heads = load_reference_module("classifier_head")

BEHAVIORS = ["eating", "drinking", "rearing"]


@pytest.fixture
def legacy_bundle_dir(tmp_path):
    """A bundle exactly as the reference v2 pipeline would leave it."""
    torch.manual_seed(0)
    model = ref_heads.ClassifierLegacyLSTM(in_features=768, out_features=3, seq_len=31)
    with torch.no_grad():
        model.batch_norm.running_mean.uniform_(-0.2, 0.2)
        model.batch_norm.running_var.uniform_(0.8, 1.2)
    d = str(tmp_path / "JonesLabModel")
    os.makedirs(d)
    torch.save(model.state_dict(), os.path.join(d, "model.pth"))
    dump_yaml(
        {"name": "JonesLabModel", "behaviors": BEHAVIORS, "seq_len": 31},
        os.path.join(d, "config.yaml"),
    )
    return d, model


def test_legacy_bundle_loads_and_predicts(legacy_bundle_dir, tmp_path):
    d, torch_model = legacy_bundle_dir
    bundle = ClassifierBundle.load(d)
    assert bundle.architecture == LEGACY_ARCH
    assert bundle.behaviors == BEHAVIORS and bundle.seq_len == 31
    assert bundle.temperature == 1.0

    # Inference through the full halo-chunked pipeline.
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(80, 768)).astype(np.float16)
    h5 = str(tmp_path / "v_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e") as w:
        w.append(feats)
    csv = infer_file(h5, bundle, config=InferenceConfig(chunk_frames=50, window_batch=16))
    got = pd.read_csv(csv)
    assert list(got.columns) == BEHAVIORS and len(got) == 80

    # Oracle: the reference's forward_nodrop over edge-padded windows.
    torch_model.eval()
    t = torch.from_numpy(feats.astype(np.float32))
    padded = torch.cat([t[0:1].repeat(15, 1), t, t[-1:].repeat(15, 1)])
    probs = []
    with torch.no_grad():
        for i in range(80):
            logits = torch_model.forward_nodrop(padded[i : i + 31].unsqueeze(0))
            probs.append(torch.softmax(logits, dim=1).numpy()[0])
    np.testing.assert_allclose(got.to_numpy(), np.stack(probs), rtol=1e-4, atol=1e-4)


# -- The genuine JonesLab artifact as oracle ---------------------------------

JONESLAB_DIR = "/root/reference/models/JonesLabModel"
JONESLAB_BEHAVIORS = [
    "eating", "drinking", "rearing", "climbing", "digging",
    "nesting", "resting", "grooming", "exploring",
]


@pytest.mark.skipif(
    not os.path.isdir(JONESLAB_DIR), reason="reference artifact not available"
)
def test_genuine_joneslab_model_matches_reference_torch(tmp_path):
    """Load the real v2-format JonesLabModel bundle shipped with the reference
    (models/JonesLabModel/model.pth + config.yaml:1-12: 9 behaviors, seq_len
    31, loaded by the reference at backend/workthreads.py:434-439) and match
    infer_file probabilities against the reference torch ClassifierLegacyLSTM
    running the same checkpoint. This is the strongest artifact-compatibility
    oracle available: a genuine field-trained model, not a synthesized
    lookalike."""
    bundle = ClassifierBundle.load(JONESLAB_DIR)
    assert bundle.architecture == LEGACY_ARCH
    assert bundle.behaviors == JONESLAB_BEHAVIORS
    assert bundle.seq_len == 31
    assert bundle.lstm_hidden_size == 64 and bundle.lstm_layers == 1

    rng = np.random.default_rng(7)
    n_frames = 120
    feats = rng.normal(size=(n_frames, 768)).astype(np.float16)
    h5 = str(tmp_path / "jl_cls.h5")
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e") as w:
        w.append(feats)
    csv = infer_file(
        h5, bundle, config=InferenceConfig(chunk_frames=64, window_batch=32)
    )
    got = pd.read_csv(csv)
    assert list(got.columns) == JONESLAB_BEHAVIORS and len(got) == n_frames

    torch_model = ref_heads.ClassifierLegacyLSTM(
        in_features=768, out_features=9, seq_len=31
    )
    sd = torch.load(
        os.path.join(JONESLAB_DIR, "model.pth"), map_location="cpu",
        weights_only=True,
    )
    torch_model.load_state_dict(sd)
    torch_model.eval()
    t = torch.from_numpy(feats.astype(np.float32))
    half = 31 // 2
    padded = torch.cat([t[0:1].repeat(half, 1), t, t[-1:].repeat(half, 1)])
    probs = []
    with torch.no_grad():
        for i in range(n_frames):
            logits = torch_model.forward_nodrop(padded[i : i + 31].unsqueeze(0))
            probs.append(torch.softmax(logits, dim=1).numpy()[0])
    np.testing.assert_allclose(got.to_numpy(), np.stack(probs), rtol=1e-4, atol=1e-4)

"""The committed quickstart project (examples/demo_project) works offline.

A fresh clone must be able to: load the project, resolve its in-project
encoder (relative identifier + HF-style config.json), re-encode the committed
videos, load the committed model bundle past the encoder guard, and get the
predictions the bundle was trained to produce — with no network and no
pretrained weights (reference analogue: models/JonesLabModel).
"""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "examples", "demo_project")


@pytest.fixture()
def project(tmp_path):
    # Work on a copy: loading/encoding writes into the project tree.
    root = str(tmp_path / "demo")
    shutil.copytree(DEMO, root)
    from cbas_tpu.core.project import Project

    return Project(root)


def test_encoder_resolves_in_project(project):
    ident = project.encoder_model_identifier
    assert os.path.isabs(ident) and ident.endswith("demo_encoder")
    from cbas_tpu.models.vit import config_for_identifier

    cfg = config_for_identifier(ident)
    assert cfg.hidden_size == 128 and cfg.num_layers == 2  # from config.json


@pytest.mark.slow
def test_quickstart_encode_and_infer(project):
    import jax.numpy as jnp

    from cbas_tpu.core.config import EncodeConfig
    from cbas_tpu.engine.classifier import ClassifierBundle
    from cbas_tpu.engine.encode import encode_file
    from cbas_tpu.engine.infer import infer_file
    from cbas_tpu.models.encoder import FrameEncoder

    videos = [v for v in project.all_video_files() if "mouse0" in v]
    assert videos, "committed demo project must ship videos"
    todo = project.stale_or_missing_embeddings()
    assert set(videos) <= set(todo)  # H5s are not committed: stale sweep queues

    encoder = FrameEncoder(project.encoder_model_identifier, compute_dtype=jnp.float32)
    h5 = encode_file(encoder, videos[0], config=EncodeConfig(chunk_frames=64))
    assert h5 and os.path.exists(h5)

    # The committed bundle passes the encoder guard against the resolved path
    # (canonical identity) and separates the two synthetic behaviors.
    bundle = ClassifierBundle.load(
        os.path.join(project.models_dir, "demo_behaviors_model"),
        expected_encoder=project.encoder_model_identifier,
    )
    csv = infer_file(h5, bundle)
    import pandas as pd

    probs = pd.read_csv(csv)
    n = len(probs)
    assert n == 300
    assert probs.iloc[30 : n // 2 - 30]["active"].mean() > 0.9
    assert probs.iloc[n // 2 + 30 : -30]["rest"].mean() > 0.9

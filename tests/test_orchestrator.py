"""Full training-job orchestration test on a synthetic on-disk project."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import TrainingConfig
from cbas_tpu.core.project import Project
from cbas_tpu.engine.classifier import ClassifierBundle
from cbas_tpu.engine.infer import infer_file
from cbas_tpu.engine.orchestrator import generate_disagreement_report, run_training_job
from cbas_tpu.utils.naming import h5_path_for_video

DIM = 32
FRAMES = 160


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    proj = Project.create_project(str(root), "p")
    rng = np.random.default_rng(0)
    ds = proj.create_dataset("behav", ["walk", "rest"], [])

    labels = {"walk": [], "rest": []}
    for s in range(8):
        rec_dir = os.path.join(proj.recordings_dir, "sess", f"m{s}")
        os.makedirs(rec_dir)
        video = os.path.join(rec_dir, f"m{s}_00001.mp4")
        with open(video, "wb") as f:
            f.write(b"")
        h5 = h5_path_for_video(video)
        feats = np.zeros((FRAMES, DIM), np.float16)
        half = FRAMES // 2
        feats[:half] = rng.normal(2.0, 1.0, (half, DIM))
        feats[half:] = rng.normal(-2.0, 1.0, (FRAMES - half, DIM))
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier=proj.encoder_model_identifier, embed_dim=DIM) as w:
            w.append(feats)
        rel = os.path.relpath(video, proj.path)
        labels["walk"].append({"video": rel, "start": 10, "end": 60, "label": "walk"})
        labels["rest"].append({"video": rel, "start": half + 10, "end": half + 50, "label": "rest"})

    ds.labels["labels"] = labels
    ds.save_labels()
    proj.reload()
    return proj


@pytest.fixture(scope="module")
def trained_model_dir(project):
    task = TrainingConfig(
        name="behav",
        behaviors=["walk", "rest"],
        batch_size=64,
        learning_rate=5e-3,
        epochs=2,
        sequence_length=7,
        training_method="weighted_loss",
        patience=3,
        num_runs=1,
        num_trials=1,
        use_test=True,
        test_split=0.2,
        lstm_hidden_size=16,
    )
    messages = []
    model_dir = run_training_job(
        project, task, progress_callback=messages.append, seed=11
    )
    assert model_dir is not None
    return model_dir


def test_bundle_artifacts_written(project, trained_model_dir):
    for f in ("model.npz", "model.pth", "config.yaml", "model_meta.json"):
        assert os.path.exists(os.path.join(trained_model_dir, f)), f
    ds_dir = project.datasets["behav"].path
    assert os.path.exists(os.path.join(ds_dir, "performance_report.yaml"))
    assert os.path.exists(os.path.join(ds_dir, "confusion_matrix_validation_BEST.png"))
    assert os.path.exists(os.path.join(ds_dir, "f1-score_epochs_plot.png"))

    with open(os.path.join(ds_dir, "performance_report.yaml")) as f:
        report = yaml.safe_load(f)
    assert report["model_name"] == "behav_model"
    assert report["split_information"]["train_subjects"]
    assert report["run_results"][0]["validation_report"]
    assert report["training_parameters"]["temperature"] > 0

    # Dataset card updated with metrics + canonical counts.
    cfg = yaml.safe_load(open(os.path.join(ds_dir, "config.yaml")))
    assert cfg["state"] == "trained" and cfg["trained_model"] == "behav_model"
    assert "Train Inst (Frames)" in cfg["metrics"]["walk"]


def test_bundle_loads_and_infers(project, trained_model_dir):
    bundle = ClassifierBundle.load(
        trained_model_dir, expected_encoder=project.encoder_model_identifier
    )
    assert bundle.behaviors == ["walk", "rest"]
    rec = project.recordings["sess"]["m0"]
    h5 = rec.encoding_files[0]
    csv = infer_file(h5, bundle)
    df = pd.read_csv(csv)
    assert len(df) == FRAMES
    # The learned model separates the two halves of the video.
    first_half = df.iloc[20:60]["walk"].mean()
    second_half = df.iloc[100:140]["rest"].mean()
    assert first_half > 0.8 and second_half > 0.8


def test_disagreement_report(project, trained_model_dir):
    bundle = ClassifierBundle.load(trained_model_dir)
    ds = project.datasets["behav"]
    train_insts = ds.all_instances()
    # Inject a wrong label so at least one disagreement block exists.
    bad = dict(train_insts[0])
    bad["label"] = "rest"  # frames 10-60 are actually 'walk'
    task = TrainingConfig(
        name="behav", behaviors=["walk", "rest"], sequence_length=7, lstm_hidden_size=16
    )
    path = generate_disagreement_report(project, task, bundle, [bad])
    items = yaml.safe_load(open(path))
    assert items and items[0]["human_label"] == "rest"
    assert items[0]["model_prediction"] == "walk"
    assert 0 < items[0]["model_confidence"] <= 1.0


def test_no_test_split_keeps_ratio_for_training():
    """use_test=False must not silently reserve test_split for validation
    (review r2 finding: 20% of subjects vanished into the val set)."""
    from cbas_tpu.core.config import TrainingConfig
    from cbas_tpu.engine.orchestrator import default_split_ratios

    with_test = TrainingConfig(name="d", behaviors=["a"], use_test=True, test_split=0.2)
    without = TrainingConfig(name="d", behaviors=["a"], use_test=False, test_split=0.2)
    assert default_split_ratios(with_test) == (0.65, 0.15, 0.2)
    assert default_split_ratios(without) == (0.85, 0.15, 0.0)


def test_custom_weights_method_trains_and_records(project, tmp_path):
    """training_method=custom_weights flows from TrainingConfig through the
    orchestrator into the loss weights (reference: workthreads.py:632-633,
    weights ordered by the task's behavior list) and the report artifact."""

    task = TrainingConfig(
        name="behav",
        behaviors=["walk", "rest"],
        batch_size=64,
        learning_rate=5e-3,
        epochs=1,
        sequence_length=7,
        training_method="custom_weights",
        custom_weights={"walk": 3.0},  # missing behaviors default to 1.0
        num_runs=1,
        num_trials=1,
        use_test=False,
        lstm_hidden_size=16,
    )
    model_dir = run_training_job(project, task, seed=7)
    assert model_dir is not None
    # the report lands in the dataset dir (reference: workthreads.py:917)
    report = yaml.safe_load(
        open(os.path.join(project.datasets["behav"].path, "performance_report.yaml"))
    )
    params = report["training_parameters"]
    assert params["training_method"] == "custom_weights"
    assert params["custom_weights"] == {"walk": 3.0}


def test_experiment_run_does_not_touch_production_bundle(project, trained_model_dir):
    """A run with its own output_dir (sweep combos, evaluate replicates)
    writes its bundle INSIDE output_dir and must not clobber the production
    models/ bundle — parallel sweep workers would race there and a live
    ClassifyWorker could hot-reload a torn bundle."""
    import time

    prod_npz = os.path.join(trained_model_dir, "model.npz")
    before = os.path.getmtime(prod_npz)
    time.sleep(0.05)

    task = TrainingConfig(
        name="behav", behaviors=["walk", "rest"], batch_size=64,
        learning_rate=5e-3, epochs=1, sequence_length=7, patience=2,
        num_runs=1, num_trials=1, use_test=False, test_split=0.0,
        lstm_hidden_size=8,
    )
    out_dir = os.path.join(project.path, "experiments", "combo_h8")
    model_dir = run_training_job(project, task, output_dir=out_dir, seed=3)
    assert model_dir == os.path.join(out_dir, "behav_model")
    assert os.path.exists(os.path.join(model_dir, "model.npz"))
    # production bundle untouched (same file, same mtime, same hyperparams)
    assert os.path.getmtime(prod_npz) == before
    prod = ClassifierBundle.load(trained_model_dir)
    assert prod.lstm_hidden_size == 16  # not the combo's 8

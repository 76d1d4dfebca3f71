"""Plot artifacts, split-evaluation helper, and the bounded log queue.

The plot suite must keep the reference's artifact *filenames*
(reference: backend/workthreads.py:1084-1168) — downstream tooling and the
dataset card link to them by name — so these tests pin the name contract,
not pixel contents.
"""

import os

import jax
import numpy as np

from cbas_tpu.core import hdf5_store
from cbas_tpu.core.config import TrainingConfig
from cbas_tpu.engine.evaluate_split import evaluate_params_on_manifest
from cbas_tpu.engine.metrics import PerformanceReport, report_and_cm
from cbas_tpu.engine.plots import (
    plot_epoch_metric,
    plot_run_metrics,
    save_confusion_matrix_plot,
)
from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
from cbas_tpu.utils import logging as cbas_logging

BEHAVIORS = ["walk", "rest", "groom"]


def _report(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    y = rng.integers(0, len(BEHAVIORS), 60)
    p = rng.integers(0, len(BEHAVIORS), 60)
    rep, _ = report_and_cm(y, p, BEHAVIORS)
    return rep


# ---------------------------------------------------------------------------
# Plots: artifact creation + reference filename contract
# ---------------------------------------------------------------------------

def test_confusion_matrix_plot_written(tmp_path):
    cm = np.array([[5, 1, 0], [0, 6, 2], [1, 0, 7]])
    out = str(tmp_path / "cm.png")
    save_confusion_matrix_plot(cm, out, labels=BEHAVIORS)
    assert os.path.getsize(out) > 1000  # a real PNG, not a touch()


def test_confusion_matrix_plot_skips_empty(tmp_path):
    out = str(tmp_path / "cm.png")
    save_confusion_matrix_plot(np.array([]), out, labels=[])
    assert not os.path.exists(out)


def test_epoch_metric_plot_filename_contract(tmp_path):
    reports = [
        PerformanceReport(_report(i), np.zeros((3, 3)), _report(i + 10), np.zeros((3, 3)))
        for i in range(3)
    ]
    plot_epoch_metric(reports, "f1-score", BEHAVIORS, str(tmp_path))
    # reference names the artifact <metric>_epochs_plot.png (workthreads.py)
    assert (tmp_path / "f1-score_epochs_plot.png").exists()


def test_epoch_metric_plot_empty_reports_is_noop(tmp_path):
    plot_epoch_metric([], "f1-score", BEHAVIORS, str(tmp_path))
    assert list(tmp_path.iterdir()) == []


def test_run_metrics_plot_writes_all_three_metrics(tmp_path):
    reports = [_report(i) for i in range(4)]
    plot_run_metrics(reports, BEHAVIORS, str(tmp_path), plot_suffix="runs")
    for metric in ("precision", "recall", "f1-score"):
        assert (tmp_path / f"{metric}_runs_plot.png").exists()


# ---------------------------------------------------------------------------
# evaluate_params_on_manifest: report shape over a real H5-backed manifest
# ---------------------------------------------------------------------------

def test_evaluate_params_on_manifest_report_shape(tmp_path):
    dim, seq_len, frames = 16, 5, 40
    h5 = str(tmp_path / "vid_cls.h5")
    rng = np.random.default_rng(0)
    with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=dim) as w:
        w.append(rng.normal(size=(frames, dim)).astype(np.float16))

    half = seq_len // 2
    manifest = [
        (h5, center, center % len(BEHAVIORS))
        for center in range(half, frames - half)
    ]
    task = TrainingConfig(
        behaviors=list(BEHAVIORS), sequence_length=seq_len,
        lstm_hidden_size=8, lstm_layers=1,
    )
    cfg = DeltasHeadConfig(
        in_features=dim, out_features=len(BEHAVIORS), seq_len=seq_len,
        lstm_hidden_size=8, lstm_layers=1,
    )
    params = init_deltas_params(jax.random.PRNGKey(0), cfg)
    try:
        out = evaluate_params_on_manifest(params, task, manifest, batch_size=8)
    finally:
        hdf5_store.global_handle_cache.close_all()

    # reference report shape: per-behavior dicts + weighted avg + square cm
    for b in BEHAVIORS + ["weighted avg"]:
        assert "f1-score" in out["report"][b]
    assert out["cm"].shape == (3, 3)
    assert int(out["cm"].sum()) == len(manifest)


def test_evaluate_params_on_manifest_empty_manifest(tmp_path):
    task = TrainingConfig(behaviors=list(BEHAVIORS), sequence_length=5,
                          lstm_hidden_size=8, lstm_layers=1)
    cfg = DeltasHeadConfig(in_features=768, out_features=3, seq_len=5,
                           lstm_hidden_size=8, lstm_layers=1)
    params = init_deltas_params(jax.random.PRNGKey(0), cfg)
    out = evaluate_params_on_manifest(params, task, [], batch_size=8)
    assert out["report"] == {} and out["cm"].size == 0


# ---------------------------------------------------------------------------
# Bounded log queue: never blocks, drops on overflow, drains in order
# ---------------------------------------------------------------------------

def _drain_all():
    cbas_logging.drain_log_queue()


def test_log_message_formats_and_enqueues(capsys):
    _drain_all()
    line = cbas_logging.log_message("hello queue", "INFO")
    assert line.endswith("[INFO] hello queue")
    assert cbas_logging.drain_log_queue() == [line]
    assert "hello queue" in capsys.readouterr().out


def test_log_error_goes_to_stderr(capsys):
    _drain_all()
    cbas_logging.log_message("boom", "ERROR")
    captured = capsys.readouterr()
    assert "boom" in captured.err and "boom" not in captured.out
    _drain_all()


def test_unknown_level_falls_back_to_info():
    _drain_all()
    line = cbas_logging.log_message("weird", "SHOUT")
    assert "[INFO] weird" in line
    _drain_all()


def test_queue_overflow_drops_instead_of_blocking():
    _drain_all()
    for i in range(cbas_logging.LOG_QUEUE_MAX + 50):
        cbas_logging.log_message(f"m{i}", to_queue=True)
    drained = cbas_logging.drain_log_queue()
    assert len(drained) == cbas_logging.LOG_QUEUE_MAX
    # oldest survive; overflow drops the NEWEST (put_nowait fails), so the
    # head of the queue is still m0
    assert drained[0].endswith("m0")
    assert cbas_logging.drain_log_queue() == []


def test_drain_respects_max_items():
    _drain_all()
    for i in range(5):
        cbas_logging.log_message(f"d{i}")
    first = cbas_logging.drain_log_queue(max_items=2)
    rest = cbas_logging.drain_log_queue()
    assert len(first) == 2 and len(rest) == 3

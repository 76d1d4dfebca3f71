"""Training engine tests: loss/optimizer parity with torch, end-to-end learning."""

import os
import threading

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from cbas_tpu.core import hdf5_store
from cbas_tpu.engine.calibrate import fit_temperature_from_logits
from cbas_tpu.engine.data import (
    BalancedSampler,
    SequentialSampler,
    WindowSource,
    build_manifest,
    compute_class_weights,
    iter_batches,
)
from cbas_tpu.engine.metrics import f1_of
from cbas_tpu.engine.train import (
    covariance_loss,
    evaluate_on_split,
    make_optimizer,
    masked_cross_entropy,
    train_head,
)
from cbas_tpu.models.heads import DeltasHeadConfig
from tests.conftest import load_reference_module

ref_heads = load_reference_module("classifier_head")

DIM = 32


# ---------------------------------------------------------------------------
# Loss parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_weights", [False, True])
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_cross_entropy_matches_torch(use_weights, smoothing):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 16).astype(np.int64)
    weights = rng.uniform(0.5, 2.0, 5).astype(np.float32) if use_weights else None

    crit = torch.nn.CrossEntropyLoss(
        weight=torch.from_numpy(weights) if use_weights else None,
        label_smoothing=smoothing,
    )
    want = float(crit(torch.from_numpy(logits), torch.from_numpy(labels)))
    got = float(
        masked_cross_entropy(
            jnp.asarray(logits),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(weights) if use_weights else None,
            smoothing,
        )
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_masking_ignores_invalid_rows():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 8).astype(np.int32)
    base = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), None, 0.1))
    # Append garbage rows labeled -1: loss must not change.
    logits2 = np.concatenate([logits, rng.normal(size=(4, 3)).astype(np.float32) * 100])
    labels2 = np.concatenate([labels, np.full(4, -1, np.int32)])
    got = float(masked_cross_entropy(jnp.asarray(logits2), jnp.asarray(labels2), None, 0.1))
    assert got == pytest.approx(base, rel=1e-6)


def test_covariance_loss_matches_reference():
    rng = np.random.default_rng(2)
    latent = rng.normal(size=(32, 12)).astype(np.float32)

    rawm = torch.from_numpy(latent)
    rawm_c = rawm - rawm.mean(dim=0)
    covm = (rawm_c.T @ rawm_c) / (rawm_c.shape[0] - 1)

    def off_diagonal(x):
        n, m = x.shape
        return x.flatten()[:-1].view(n - 1, n + 1)[:, 1:].flatten()

    want = float(torch.sum(torch.pow(off_diagonal(covm), 2)))
    got = float(covariance_loss(jnp.asarray(latent), jnp.ones(32, bool)))
    assert got == pytest.approx(want, rel=1e-4)
    # Masked rows are excluded.
    latent2 = np.concatenate([latent, np.full((4, 12), 1e6, np.float32)])
    valid = np.concatenate([np.ones(32, bool), np.zeros(4, bool)])
    got2 = float(covariance_loss(jnp.asarray(latent2), jnp.asarray(valid)))
    assert got2 == pytest.approx(want, rel=1e-4)


def test_adam_matches_torch_with_decay_groups():
    """Our optax chain must track torch.optim.Adam with per-group weight decay."""
    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    g0 = np.float32(0.2)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.integers(0, 3, 8).astype(np.int64)

    # torch: params {"w": matrix (decay 0.01), "gate": scalar (decay 1e-3)}
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tg = torch.nn.Parameter(torch.tensor(g0))
    opt = torch.optim.Adam(
        [{"params": [tw]}, {"params": [tg], "weight_decay": 1e-3}],
        lr=1e-2,
        weight_decay=0.01,
    )
    for _ in range(5):
        opt.zero_grad()
        logits = torch.from_numpy(x) @ tw * torch.sigmoid(tg)
        loss = torch.nn.functional.cross_entropy(logits, torch.from_numpy(y))
        loss.backward()
        opt.step()

    params = {"w": jnp.asarray(w0), "gate": jnp.asarray(g0)}
    optimizer = make_optimizer(lr=1e-2, weight_decay=0.01)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        logits = jnp.asarray(x) @ p["w"] * jax.nn.sigmoid(p["gate"])
        return masked_cross_entropy(logits, jnp.asarray(y.astype(np.int32)), None, 0.0)

    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(params["gate"]), float(tg.detach()), rtol=1e-4)


# ---------------------------------------------------------------------------
# Data layer
# ---------------------------------------------------------------------------

def make_labeled_project(tmp_path, n_subjects=4, frames=200, seq_len=7, seed=0):
    """Synthetic project: per-subject H5 embeddings + separable labeled spans."""
    rng = np.random.default_rng(seed)
    root = str(tmp_path)
    instances = []
    centers = {"walk": 2.0, "rest": -2.0}
    for s in range(n_subjects):
        rel = f"recordings/sess/m{s}/m{s}_00001.mp4"
        os.makedirs(os.path.join(root, os.path.dirname(rel)), exist_ok=True)
        h5 = os.path.join(root, rel).replace(".mp4", "_cls.h5")
        feats = np.zeros((frames, DIM), np.float16)
        half = frames // 2
        feats[:half] = rng.normal(centers["walk"], 1.0, (half, DIM))
        feats[half:] = rng.normal(centers["rest"], 1.0, (frames - half, DIM))
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=DIM) as w:
            w.append(feats)
        instances.append({"video": rel, "start": 10, "end": 60, "label": "walk"})
        instances.append({"video": rel, "start": half + 10, "end": half + 40, "label": "rest"})
    return root, instances, ["walk", "rest"]


def test_build_manifest_window_bounds(tmp_path):
    root, instances, behaviors = make_labeled_project(tmp_path, n_subjects=1, frames=50, seq_len=7)
    # Instance at the file edge: centers too close to the end are dropped.
    instances = [{"video": instances[0]["video"], "start": 45, "end": 49, "label": "walk"}]
    manifest = build_manifest(root, instances, 7, behaviors)
    assert [c for _, c, _ in manifest] == [45, 46]  # 46 + 3 < 50


def test_window_source_gather(tmp_path):
    root, instances, behaviors = make_labeled_project(tmp_path, n_subjects=1)
    manifest = build_manifest(root, instances, 7, behaviors)
    src = WindowSource(manifest, 7)
    x, y = src.gather([0, 1, len(manifest) - 1])
    assert x.shape == (3, 7, DIM) and x.dtype == np.float32
    assert y.tolist() == [0, 0, 1]
    hdf5_store.global_handle_cache.close_all()


def test_balanced_sampler_distribution():
    # 90/10 imbalance -> balanced stream.
    manifest = [("f", i, 0) for i in range(90)] + [("f", i, 1) for i in range(10)]
    sampler = BalancedSampler(manifest, 2, seed=0)
    assert len(sampler) == 100
    idx = sampler.epoch_indices()
    labels = np.array([manifest[i][2] for i in idx])
    assert (labels == 0).sum() == 50 and (labels == 1).sum() == 50
    # Length pads to a multiple of available classes.
    sampler3 = BalancedSampler(manifest + [("f", 0, 2)], 3, seed=0)
    assert len(sampler3) % 3 == 0


def test_iter_batches_pads_final():
    manifest = [("f", i, 0) for i in range(10)]

    class FakeSource(WindowSource):
        def gather(self, indices):
            return (
                np.zeros((len(indices), 7, DIM), np.float32),
                np.zeros(len(indices), np.int32),
            )

    src = FakeSource(manifest, 7)
    batches = list(iter_batches(src, SequentialSampler(10), 4))
    assert [b[2] for b in batches] == [4, 4, 2]
    assert all(b[0].shape == (4, 7, DIM) for b in batches)
    assert batches[-1][1][2:].tolist() == [-1, -1]


def test_compute_class_weights_matches_reference():
    insts = [{"label": "a"}] * 8 + [{"label": "b"}] * 2
    w = compute_class_weights(insts, ["a", "b", "c"])
    assert w.sum() == pytest.approx(3.0)
    assert w[1] == pytest.approx(4 * w[0])  # inverse frequency
    assert w[2] > w[1]  # absent class gets the epsilon weight


def test_compute_class_weights_strips_labels():
    """Whitespace-padded labels are trained on (build_manifest strips them),
    so they must be counted the same way — a mismatch gives the class a
    1/epsilon weight that collapses every other class to ~0."""
    insts = [{"label": "a "}] * 8 + [{"label": " b"}] * 2
    w = compute_class_weights(insts, ["a", "b"])
    assert w[1] == pytest.approx(4 * w[0])
    assert w.max() < 3  # nobody got the absent-class epsilon weight


def test_window_source_span_preload_and_budget(tmp_path, monkeypatch):
    """preload=True holds only each file's referenced span (offset-correct
    gathers), and an over-budget projection falls back to lazy reads."""
    root, instances, behaviors = make_labeled_project(tmp_path, n_subjects=1)
    manifest = build_manifest(root, instances, 7, behaviors)
    lazy = WindowSource(manifest, 7)
    x0, y0 = lazy.gather(list(range(len(manifest))))

    pre = WindowSource(manifest, 7, preload=True)
    assert pre._ram is not None
    rows, off = next(iter(pre._ram.values()))
    assert off > 0 and rows.shape[0] < 200  # span, not the whole 200-row file
    x1, y1 = pre.gather(list(range(len(manifest))))
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_array_equal(y0, y1)

    monkeypatch.setenv("CBAS_TRAIN_RAM_BUDGET", "1")
    tight = WindowSource(manifest, 7, preload=True)
    assert tight._ram is None  # over budget -> lazy fallback
    x2, _ = tight.gather(list(range(len(manifest))))
    np.testing.assert_array_equal(x0, x2)
    hdf5_store.global_handle_cache.close_all()


# ---------------------------------------------------------------------------
# End-to-end training
# ---------------------------------------------------------------------------

def test_train_head_learns_and_reports(tmp_path):
    root, instances, behaviors = make_labeled_project(tmp_path)
    seq_len = 7
    train_insts = [i for i in instances if "m0" in i["video"] or "m1" in i["video"]]
    val_insts = [i for i in instances if "m2" in i["video"]]
    test_insts = [i for i in instances if "m3" in i["video"]]

    train_src = WindowSource(build_manifest(root, train_insts, seq_len, behaviors), seq_len)
    val_src = WindowSource(build_manifest(root, val_insts, seq_len, behaviors), seq_len)
    test_src = WindowSource(build_manifest(root, test_insts, seq_len, behaviors), seq_len)

    messages = []
    params, reports, best_epoch = train_head(
        train_src,
        val_src,
        seq_len,
        behaviors,
        batch_size=64,
        lr=5e-3,
        epochs=3,
        patience=3,
        lstm_hidden_size=16,
        progress_callback=messages.append,
        label_smoothing=0.1,
    )
    assert params is not None and best_epoch >= 0
    assert len(reports) <= 3 and reports[best_epoch].val_report
    assert f1_of(reports[best_epoch].val_report, "weighted avg") > 0.95
    assert any("Epoch" in m for m in messages)

    cfg = DeltasHeadConfig(
        in_features=DIM, out_features=2, seq_len=seq_len, lstm_hidden_size=16
    )
    res = evaluate_on_split(params, cfg, test_src, behaviors, batch_size=64)
    assert f1_of(res["report"], "weighted avg") > 0.95
    assert res["cm"].shape == (2, 2)
    hdf5_store.global_handle_cache.close_all()


def test_train_cancel_returns_immediately(tmp_path):
    root, instances, behaviors = make_labeled_project(tmp_path, n_subjects=1)
    src = WindowSource(build_manifest(root, instances, 7, behaviors), 7)
    ev = threading.Event()
    ev.set()
    params, reports, best = train_head(
        src, None, 7, behaviors, cancel_event=ev, epochs=5, batch_size=32, lstm_hidden_size=8
    )
    assert params is None and best == -1
    hdf5_store.global_handle_cache.close_all()


def test_fit_temperature_matches_torch_lbfgs():
    rng = np.random.default_rng(7)
    # Miscalibrated model: logits are 3x too sharp for an ~75% accuracy, so the
    # NLL has an interior optimum near T=3 that both optimizers must find.
    base = rng.normal(0, 1, (400, 4)).astype(np.float32)
    labels = np.where(
        rng.uniform(size=400) < 0.75, base.argmax(1), rng.integers(0, 4, 400)
    ).astype(np.int64)
    logits = base * 3.0

    got = fit_temperature_from_logits(logits, labels)

    # Reference procedure (backend/workthreads.py:103-137).
    T = torch.nn.Parameter(torch.ones(1))
    opt = torch.optim.LBFGS([T], lr=0.01, max_iter=50)
    lg, lb = torch.from_numpy(logits), torch.from_numpy(labels)

    def closure():
        opt.zero_grad()
        temp = torch.clamp(torch.nn.functional.softplus(T) + 1e-3, max=10.0)
        loss = torch.nn.functional.cross_entropy(lg / temp, lb)
        loss.backward()
        return loss

    opt.step(closure)
    ref_temp = float(torch.clamp(torch.nn.functional.softplus(T) + 1e-3, max=10.0))

    def nll_at(temp):
        return float(
            torch.nn.functional.cross_entropy(lg / temp, lb)
        )

    # Both move in the right direction; our optimizer converges fully, so its
    # NLL must be at least as good as the reference's partially-converged LBFGS
    # (documented deviation: we return the true optimum).
    assert got > 1.0 and ref_temp > 1.0  # overconfidence -> temperature above 1
    assert nll_at(got) <= nll_at(ref_temp) + 1e-6
    assert nll_at(got) < nll_at(1.0)  # better than uncalibrated

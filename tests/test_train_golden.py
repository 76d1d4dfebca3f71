"""Whole-loop training-quality golden run: JAX vs the reference torch stack.

The component pieces are parity-tested exactly elsewhere (head logits in
test_heads_parity, CE/covariance/Adam groups/temperature in test_train).
This closes the loop at the level that matters scientifically: train our
``train_head`` AND a torch loop built on the REFERENCE ``ClassifierLSTMDeltas``
module (loaded from /root/reference) on the *same* synthetic dataset with the
*same* hyperparameters, and require both to reach the same model quality.
SURVEY §7 calls this out explicitly: the reference publishes no training
numbers, so the golden run is self-generated (reference training loop:
backend/cbas.py:1274-1422).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sklearn_metrics = pytest.importorskip("sklearn.metrics")

from cbas_tpu.core import hdf5_store
from cbas_tpu.engine.data import WindowSource, build_manifest
from cbas_tpu.engine.metrics import f1_of
from cbas_tpu.engine.train import train_head
from tests.conftest import load_reference_module
from tests.test_train import make_labeled_project

ref_heads = load_reference_module("classifier_head")

SEQ_LEN = 31  # the reference champion config (models/JonesLabModel/config.yaml)
HIDDEN = 16
LR = 1e-3
EPOCHS = 4
BATCH = 64
SMOOTHING = 0.1


def _gather_all(root, instances, behaviors):
    manifest = build_manifest(root, instances, SEQ_LEN, behaviors)
    src = WindowSource(manifest, SEQ_LEN)
    x, y = src.gather(list(range(len(manifest))))
    return src, x.astype(np.float32), y.astype(np.int64)


def _cov_loss_torch(rawm):
    # reference: off_diagonal(cov(rawm))**2 summed (backend/cbas.py:1262-1265,
    # 1338-1344)
    centered = rawm - rawm.mean(dim=0, keepdim=True)
    cov = centered.T @ centered / max(rawm.shape[0] - 1, 1)
    off = (cov**2).sum() - (torch.diagonal(cov) ** 2).sum()
    return off


def _train_torch_reference(xtr, ytr, xva, yva, dim):
    torch.manual_seed(0)
    model = ref_heads.ClassifierLSTMDeltas(
        in_features=dim, out_features=2, seq_len=SEQ_LEN, lstm_hidden_size=HIDDEN
    )
    # reference optimizer: Adam with a separate 1e-3 weight-decay group for
    # the gate (backend/cbas.py:1306-1309)
    gate = [p for n, p in model.named_parameters() if n == "gate"]
    rest = [p for n, p in model.named_parameters() if n != "gate"]
    opt = torch.optim.Adam(
        [{"params": rest}, {"params": gate, "weight_decay": 1e-3}], lr=LR
    )
    crit = torch.nn.CrossEntropyLoss(label_smoothing=SMOOTHING)
    xtr_t = torch.from_numpy(xtr)
    ytr_t = torch.from_numpy(ytr)
    rng = np.random.default_rng(0)
    best = 0.0
    for _ in range(EPOCHS):
        model.train()
        order = rng.permutation(len(ytr))
        for i in range(0, len(order), BATCH):
            idx = torch.from_numpy(order[i : i + BATCH].copy())
            logits, rawm = model(xtr_t[idx])
            loss = crit(logits, ytr_t[idx]) + _cov_loss_torch(rawm)
            opt.zero_grad()
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            pred = model(torch.from_numpy(xva))[0].argmax(dim=1).numpy()
        best = max(
            best, sklearn_metrics.f1_score(yva, pred, average="weighted")
        )
    return best


def test_training_quality_matches_reference_stack(tmp_path):
    root, instances, behaviors = make_labeled_project(
        tmp_path, n_subjects=4, frames=400, seq_len=SEQ_LEN
    )
    train_insts = [i for i in instances if "m0" in i["video"] or "m1" in i["video"]]
    val_insts = [i for i in instances if "m2" in i["video"]]

    train_src, xtr, ytr = _gather_all(root, train_insts, behaviors)
    val_src, xva, yva = _gather_all(root, val_insts, behaviors)
    dim = xtr.shape[-1]

    params, reports, best_epoch = train_head(
        train_src,
        val_src,
        SEQ_LEN,
        behaviors,
        batch_size=BATCH,
        lr=LR,
        epochs=EPOCHS,
        patience=EPOCHS,
        lstm_hidden_size=HIDDEN,
        label_smoothing=SMOOTHING,
        seed=0,
    )
    assert params is not None
    jax_f1 = f1_of(reports[best_epoch].val_report, "weighted avg")

    torch_f1 = _train_torch_reference(xtr, ytr, xva, yva, dim)

    # Both stacks must converge on the separable task, and to the same
    # quality: a broken loss/optimizer/gradient path on either side shows up
    # as a gap long before it shows up as an exception.
    assert jax_f1 > 0.9, f"JAX training underperforms: val F1 {jax_f1:.3f}"
    assert torch_f1 > 0.9, f"torch reference underperforms: val F1 {torch_f1:.3f}"
    assert abs(jax_f1 - torch_f1) < 0.08, (
        f"training-quality gap: JAX {jax_f1:.3f} vs torch {torch_f1:.3f}"
    )
    hdf5_store.global_handle_cache.close_all()

"""Mid-training checkpoint/resume tests."""

import os

import numpy as np
import pytest

import jax

from cbas_tpu.engine.data import WindowSource, build_manifest
from cbas_tpu.engine.train import (
    load_train_state,
    make_optimizer,
    save_train_state,
    train_head,
)
from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params
from cbas_tpu.core import hdf5_store
from cbas_tpu.utils.naming import h5_path_for_video

DIM = 16


def test_state_roundtrip(tmp_path):
    cfg = DeltasHeadConfig(in_features=DIM, out_features=2, seq_len=5, lstm_hidden_size=8)
    params = init_deltas_params(jax.random.key(0), cfg)
    opt = make_optimizer(1e-3, 1e-4)
    opt_state = opt.init(params)
    best = init_deltas_params(jax.random.key(1), cfg)  # distinct best weights
    path = str(tmp_path / "state.npz")
    save_train_state(path, params, opt_state, best,
                     {"epoch": 3, "best_f1": 0.5, "best_epoch": 2, "no_improve": 1})
    p2, o2, b2, meta = load_train_state(path, params, opt_state)
    assert meta["epoch"] == 3 and meta["best_f1"] == 0.5
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(p2[k]))
        np.testing.assert_array_equal(np.asarray(best[k]), np.asarray(b2[k]))
    # Optimizer moments restored leaf-for-leaf.
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def make_sources(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path)
    instances = []
    for s in range(3):
        rel = f"recordings/x/m{s}/v.mp4"
        os.makedirs(os.path.join(root, os.path.dirname(rel)), exist_ok=True)
        h5 = h5_path_for_video(os.path.join(root, rel))
        feats = np.concatenate([
            rng.normal(1.5, 1.0, (60, DIM)), rng.normal(-1.5, 1.0, (60, DIM))
        ]).astype(np.float16)
        with hdf5_store.EmbeddingWriter(h5, encoder_identifier="e", embed_dim=DIM) as w:
            w.append(feats)
        instances.append({"video": rel, "start": 5, "end": 40, "label": "a"})
        instances.append({"video": rel, "start": 65, "end": 100, "label": "b"})
    behaviors = ["a", "b"]
    manifest = build_manifest(root, instances, 5, behaviors)
    return WindowSource(manifest, 5), behaviors


def test_resume_continues_training(tmp_path):
    src, behaviors = make_sources(tmp_path)
    ckpt = str(tmp_path / "train_state.npz")
    kw = dict(batch_size=32, lr=5e-3, lstm_hidden_size=8, seed=3,
              checkpoint_path=ckpt)

    # Run 2 epochs, checkpointing each.
    p1, r1, _ = train_head(src, src, 5, behaviors, epochs=2, patience=10, **kw)
    assert os.path.exists(ckpt)

    # Resume for 2 more epochs. Reports are ABSOLUTE-epoch aligned (callers
    # index reports[best_epoch]): the resumed-over epochs hold empty
    # placeholders and the new epochs land at their true indices.
    p2, r2, best2 = train_head(src, src, 5, behaviors, epochs=4, patience=10,
                               resume=True, **kw)
    assert p2 is not None
    assert len(r2) == 4
    assert all(r.val_report for r in r2[2:])  # really-trained epochs
    # best_epoch always indexes a REAL report: resumed-over epochs are
    # placeholders except the checkpointed best, which is restored from meta
    assert 0 <= best2 < len(r2) and r2[best2].val_report

    # Without resume, all 4 epochs run.
    p3, r3, _ = train_head(src, src, 5, behaviors, epochs=4, patience=10,
                           batch_size=32, lr=5e-3, lstm_hidden_size=8, seed=3)
    assert len(r3) == 4
    hdf5_store.global_handle_cache.close_all()

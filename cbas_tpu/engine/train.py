"""Head training: jit-compiled optax loop with the reference's loss recipe.

Reproduces ``train_lstm_model`` (backend/cbas.py:1274-1422) as a TPU program:

- torch-Adam-semantics optimizer (L2 added to gradients before the moments)
  with the separate 1e-3 weight-decay group for the fusion ``gate``
  (backend/cbas.py:1306-1309)
- cross-entropy with optional class weights + label smoothing, matching
  torch.nn.CrossEntropyLoss numerics including the weighted-mean reduction
- the covariance-decorrelation auxiliary loss on the attended latent: sum of
  squared off-diagonals of the batch covariance (backend/cbas.py:1338-1344)
- class-balanced oversampled train stream, per-epoch train+val reports,
  early stopping on the validation F1 of ``optimization_target``

Batches have one static shape; padded rows carry label -1 and are masked out
of every reduction, so the whole step jit-compiles once.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cbas_tpu.engine.data import (
    BalancedSampler,
    DeviceWindowStore,
    SequentialSampler,
    WindowSource,
    iter_batches,
)
from cbas_tpu.engine.metrics import PerformanceReport, f1_of, report_and_cm
from cbas_tpu.models.heads import DeltasHeadConfig, deltas_forward, init_deltas_params
from cbas_tpu.utils.metrics import TRAIN_STEPS, metrics

Params = dict


# ---------------------------------------------------------------------------
# Loss pieces
# ---------------------------------------------------------------------------

def masked_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray],
    label_smoothing: float,
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(weight, label_smoothing) with -1 masking.

    torch semantics: per-sample NLL weighted by the target's class weight; the
    smoothing term sums class-weighted log-probs / C; mean reduction divides
    by the sum of target weights.
    """
    C = logits.shape[-1]
    valid = labels >= 0
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)

    w = class_weights if class_weights is not None else jnp.ones((C,), logits.dtype)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    smooth = -(logp * w[None, :]).sum(-1) / C
    wi = w[safe_labels] * valid
    per = (1.0 - label_smoothing) * nll * wi + label_smoothing * smooth * valid
    return per.sum() / jnp.maximum(wi.sum(), 1e-9)


def covariance_loss(latent: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared off-diagonals of the valid-row batch covariance."""
    n = valid.sum()
    mask = valid[:, None].astype(latent.dtype)
    mean = (latent * mask).sum(0) / jnp.maximum(n, 1)
    centered = (latent - mean) * mask
    cov = centered.T @ centered / jnp.maximum(n - 1, 1)
    off = (cov**2).sum() - (jnp.diagonal(cov) ** 2).sum()
    return jnp.where(n > 1, off, 0.0)


# ---------------------------------------------------------------------------
# Optimizer (torch.optim.Adam semantics, per-group weight decay)
# ---------------------------------------------------------------------------

def make_optimizer(lr: float, weight_decay: float, gate_decay: float = 1e-3):
    def gate_mask(params):
        return {k: k == "gate" for k in params}

    def rest_mask(params):
        return {k: k != "gate" for k in params}

    steps = []
    if gate_decay:
        steps.append(optax.masked(optax.add_decayed_weights(gate_decay), gate_mask))
    if weight_decay:
        steps.append(optax.masked(optax.add_decayed_weights(weight_decay), rest_mask))
    steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr)]
    return optax.chain(*steps)


# ---------------------------------------------------------------------------
# Compiled programs
# ---------------------------------------------------------------------------

def _gather_windows(feats: jnp.ndarray, centers: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """(R, D) device buffer + (B,) centers -> (B, seq_len, D) fp32 windows."""
    half = seq_len // 2
    offsets = jnp.arange(-half, half + 1, dtype=jnp.int32)
    return feats[centers[:, None] + offsets[None, :]].astype(jnp.float32)


def _dp_shardings(mesh):
    """(replicated, batch) NamedShardings for assembling a step's in_shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    return repl, bsh


def build_train_step(
    cfg: DeltasHeadConfig,
    optimizer,
    class_weights: Optional[np.ndarray],
    label_smoothing: float,
    jit: bool = True,
    gather_seq_len: Optional[int] = None,
    mesh=None,
):
    """Compiled train step.

    Two data paths: host windows (``step(params, opt, x, y, rng)`` with
    x = (B, T, D)) or device-resident gather (``gather_seq_len`` set:
    ``step(params, opt, feats, centers, y, rng)`` slices the windows from the
    HBM-resident embedding buffer inside the program).

    With a mesh, the batch args are sharded on the "data" axis and params /
    optimizer state are replicated; GSPMD auto-inserts the gradient psum, so
    the math keeps global-batch semantics — numerically the single-device
    program (modulo reduction order).
    """
    cw = jnp.asarray(class_weights, jnp.float32) if class_weights is not None else None

    def loss_fn(params, x, y, rng):
        logits, latent = deltas_forward(params, x, cfg, train=True, rng=rng)
        valid = y >= 0
        ce = masked_cross_entropy(logits, y, cw, label_smoothing)
        cov = covariance_loss(latent, valid)
        return ce + cov, (ce, cov)

    if gather_seq_len is None:
        def step(params, opt_state, x, y, rng):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
    else:
        def step(params, opt_state, feats, centers, y, rng):
            x = _gather_windows(feats, centers, gather_seq_len)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    if not jit:
        return step
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    repl, bsh = _dp_shardings(mesh)
    if gather_seq_len is None:
        in_sh = (repl, repl, bsh, bsh, repl)
    else:
        in_sh = (repl, repl, repl, bsh, bsh, repl)
    return jax.jit(
        step,
        donate_argnums=(0, 1),
        in_shardings=in_sh,
        out_shardings=(repl, repl, repl),
    )


def build_logits_program(
    cfg: DeltasHeadConfig, gather_seq_len: Optional[int] = None, mesh=None
):
    if gather_seq_len is None:
        def logits(params, x):
            return deltas_forward(params, x, cfg, train=False)[0]
    else:
        def logits(params, feats, centers):
            x = _gather_windows(feats, centers, gather_seq_len)
            return deltas_forward(params, x, cfg, train=False)[0]

    if mesh is None:
        return jax.jit(logits)
    repl, bsh = _dp_shardings(mesh)
    in_sh = (repl, bsh) if gather_seq_len is None else (repl, repl, bsh)
    return jax.jit(logits, in_shardings=in_sh, out_shardings=bsh)


def collect_logits_source(
    params,
    logits_prog,
    source: WindowSource,
    sampler,
    batch_size: int,
    cancel_event: Optional[threading.Event] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(logits (N, C), labels (N,)) over a source's valid rows.

    The single batched-eval loop shared by prediction (argmax consumers) and
    temperature calibration (raw-logit consumer) — padded rows (beyond
    n_valid) and corrupt rows (label -1) are excluded under one rule.
    """
    zs: List[np.ndarray] = []
    ys: List[np.ndarray] = []
    for x, y, n_valid in iter_batches(source, sampler, batch_size):
        if cancel_event is not None and cancel_event.is_set():
            break
        logits = np.asarray(logits_prog(params, jnp.asarray(x)))[:n_valid]
        keep = y[:n_valid] >= 0
        zs.append(logits[keep])
        ys.append(y[:n_valid][keep])
    if not zs:
        return np.zeros((0, 1), np.float32), np.array([], np.int32)
    return np.concatenate(zs), np.concatenate(ys)


def predict_source(
    params,
    logits_prog,
    source: WindowSource,
    sampler,
    batch_size: int,
    cancel_event: Optional[threading.Event] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(y_true, y_pred) over a source; padded/corrupt rows excluded."""
    logits, y_true = collect_logits_source(
        params, logits_prog, source, sampler, batch_size, cancel_event
    )
    if logits.size == 0:
        return np.array([], np.int32), np.array([], np.int32)
    return y_true, logits.argmax(1)


def predict_store(
    params,
    logits_prog,
    store: DeviceWindowStore,
    sampler,
    batch_size: int,
    cancel_event: Optional[threading.Event] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(y_true, y_pred) with windows gathered from the device-resident store."""
    y_true: List[np.ndarray] = []
    y_pred: List[np.ndarray] = []
    indices = sampler.epoch_indices()
    for start in range(0, len(indices), batch_size):
        if cancel_event is not None and cancel_event.is_set():
            break
        chunk = indices[start : start + batch_size]
        centers, labels = store.batch_indices(chunk, batch_size)
        logits = np.asarray(logits_prog(params, store.features, jnp.asarray(centers)))
        keep = labels >= 0
        y_true.append(labels[keep])
        y_pred.append(logits.argmax(1)[keep])
    if not y_true:
        return np.array([], np.int32), np.array([], np.int32)
    return np.concatenate(y_true), np.concatenate(y_pred)


# Device-resident training data is used when the stacked embeddings fit this
# HBM budget (v5e has 16 GB; the encoder itself is long gone during training).
DEVICE_DATA_BUDGET_BYTES = 4 * 1024**3


def _manifest_bytes(manifest, ram=None) -> int:
    import h5py

    from cbas_tpu.core.hdf5_store import DATASET_NAME

    total = 0
    for path in {e[0] for e in manifest}:
        if ram is not None and path in ram:
            total += ram[path][0].nbytes  # (span rows, offset) tuple
            continue
        with h5py.File(path, "r") as f:
            total += int(np.prod(f[DATASET_NAME].shape)) * 2  # fp16
    return total


# ---------------------------------------------------------------------------
# Mid-training checkpointing (the reference keeps best-state in RAM only;
# SURVEY.md §5 "no mid-training optimizer/step checkpointing")
# ---------------------------------------------------------------------------

def save_train_state(path: str, params, opt_state, best_params, meta: dict) -> None:
    """Persist (params, optimizer state, best-so-far weights, metadata) atomically.

    The pytrees are flattened to ordered leaves; restoring rebuilds them from
    templates produced by the same code, so no structure serialization is
    needed. ``best_params`` may equal ``params`` when no improvement happened
    yet.
    """
    import json

    leaves = jax.tree.leaves((params, opt_state, best_params))
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(jax.device_get(leaves))}
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=json.dumps(meta), **arrays)
    import os

    os.replace(tmp, path)


def load_train_state(path: str, params_template, opt_state_template):
    """Returns (params, opt_state, best_params, meta) per the templates."""
    import json

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    treedef = jax.tree.structure(
        (params_template, opt_state_template, params_template)
    )
    params, opt_state, best_params = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, best_params, meta


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------

def train_head(
    train_source: WindowSource,
    val_source: Optional[WindowSource],
    seq_len: int,
    behaviors: Sequence[str],
    cancel_event: Optional[threading.Event] = None,
    batch_size: int = 512,
    lr: float = 1e-4,
    epochs: int = 10,
    class_weights: Optional[np.ndarray] = None,
    patience: int = 3,
    progress_callback: Optional[Callable[[str], None]] = None,
    optimization_target: str = "weighted avg",
    weight_decay: float = 0.0,
    label_smoothing: float = 0.0,
    lstm_hidden_size: int = 64,
    lstm_layers: int = 1,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    resume: bool = False,
    device_data: bool = True,
    mesh=None,
) -> Tuple[Optional[dict], Optional[List[PerformanceReport]], int]:
    """Train a deltas head; returns (best params as numpy dict, reports, best_epoch).

    Mirrors the reference's control flow: balanced oversampled train stream,
    full train+val evaluation each epoch, best-by-val-F1 with early stopping,
    per-batch cancellation (backend/cbas.py:1274-1422).

    With ``checkpoint_path`` the full train state (params + optimizer moments
    + loop metadata) is persisted after every epoch, and ``resume=True``
    continues an interrupted run from the last completed epoch — a durability
    improvement over the reference, which keeps best-state in RAM only.
    """
    if len(train_source) == 0:
        return None, None, -1

    cancel_event = cancel_event or threading.Event()
    repl_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cbas_tpu.parallel.mesh import data_axis_size, pad_to_multiple

        # Fixed-shape batches must divide the mesh; round the batch size up
        # (iter_batches / batch_indices already pad partial batches).
        batch_size = pad_to_multiple(batch_size, data_axis_size(mesh))
        repl_sharding = NamedSharding(mesh, P())
    cfg = DeltasHeadConfig(
        in_features=train_source.embed_dim,
        out_features=len(behaviors),
        seq_len=seq_len,
        lstm_hidden_size=lstm_hidden_size,
        lstm_layers=lstm_layers,
    )
    key = jax.random.key(seed)
    key, init_key = jax.random.split(key)
    params = init_deltas_params(init_key, cfg)

    has_val = val_source is not None and len(val_source) > 0

    # Device-resident data path: embeddings live in HBM once and windows are
    # gathered inside the jitted step (per-batch H2D = a few KB of indices).
    train_store = val_store = None
    if device_data:
        try:
            train_ram = getattr(train_source, "_ram", None)
            val_ram = getattr(val_source, "_ram", None) if has_val else None
            total = _manifest_bytes(train_source.manifest, train_ram)
            if has_val:
                total += _manifest_bytes(val_source.manifest, val_ram)
            if total <= DEVICE_DATA_BUDGET_BYTES:
                train_store = DeviceWindowStore(
                    train_source.manifest, seq_len, sharding=repl_sharding,
                    ram=train_ram,
                )
                if has_val:
                    val_store = DeviceWindowStore(
                        val_source.manifest, seq_len, sharding=repl_sharding,
                        ram=val_ram,
                    )
        except Exception as e:
            print(f"Device-data path unavailable ({e}); using host windows.")
            train_store = val_store = None
    gather = seq_len if train_store is not None else None

    optimizer = make_optimizer(lr, weight_decay)
    opt_state = optimizer.init(params)
    step = build_train_step(
        cfg, optimizer, class_weights, label_smoothing, gather_seq_len=gather, mesh=mesh
    )
    logits_prog = build_logits_program(cfg, gather_seq_len=gather, mesh=mesh)

    train_sampler = BalancedSampler(train_source.manifest, len(behaviors), seed=seed)

    best_f1, best_params, best_epoch = -1.0, None, -1
    epoch_reports: List[PerformanceReport] = []
    no_improve = 0
    start_epoch = 0
    best_report_payload: Optional[dict] = None

    import os

    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        params, opt_state, ckpt_best, meta = load_train_state(
            checkpoint_path, params, opt_state
        )
        start_epoch = int(meta["epoch"]) + 1
        best_f1 = float(meta["best_f1"])
        best_epoch = int(meta["best_epoch"])
        no_improve = int(meta["no_improve"])
        key = jax.random.key(seed + 7919 * start_epoch)  # fresh stream post-resume
        if best_epoch >= 0:
            # The checkpointed best weights, not the last epoch's. Copy: the
            # donated step invalidates restored buffers.
            best_params = jax.tree.map(lambda a: a.copy(), ckpt_best)
        print(f"Resumed training from epoch {start_epoch} ({checkpoint_path}).")
        # Replay the sampler so epoch streams continue where they left off.
        for _ in range(start_epoch):
            train_sampler.epoch_indices()
        # Keep epoch_reports index-aligned with ABSOLUTE epoch numbers:
        # callers index reports[best_epoch], so the resumed-over epochs get
        # empty placeholders (plot series render them as gaps).
        epoch_reports.extend(
            PerformanceReport({}, np.array([]), {}, np.array([]))
            for _ in range(start_epoch)
        )
        best_report_payload = meta.get("best_reports")
        if best_report_payload and 0 <= best_epoch < start_epoch:
            # restore the real report at the checkpointed best epoch
            epoch_reports[best_epoch] = PerformanceReport(
                best_report_payload.get("train_report") or {},
                np.asarray(best_report_payload.get("train_cm") or []),
                best_report_payload.get("val_report") or {},
                np.asarray(best_report_payload.get("val_cm") or []),
            )
        if has_val and no_improve >= patience:
            # The checkpointed run had already early-stopped; training even
            # one more epoch would drift past the stop the first run
            # committed to.
            print("Checkpoint is already early-stopped; not training further.")
            start_epoch = epochs

    for e in range(start_epoch, epochs):
        if cancel_event.is_set():
            if best_params is None and not has_val and epoch_reports:
                # No-val runs never set best_params inside the loop (nothing
                # to compare); a cancel must still return the trained-so-far
                # weights, not discard every completed epoch.
                best_params, best_epoch = params, len(epoch_reports) - 1
            return (jax.device_get(best_params) if best_params is not None else None,
                    epoch_reports, best_epoch)
        if progress_callback:
            progress_callback(f"Training Epoch {e + 1}/{epochs}...")

        if train_store is not None:
            epoch_idx = train_sampler.epoch_indices()
            for i, start in enumerate(range(0, len(epoch_idx), batch_size)):
                if cancel_event.is_set():
                    break
                centers, labels = train_store.batch_indices(
                    epoch_idx[start : start + batch_size], batch_size
                )
                key, step_key = jax.random.split(key)
                with metrics.timed(TRAIN_STEPS):
                    params, opt_state, loss = step(
                        params, opt_state, train_store.features,
                        jnp.asarray(centers), jnp.asarray(labels), step_key,
                    )
                if i % 50 == 0:
                    print(f"[Epoch {e + 1}/{epochs} Batch {i}] Loss: {float(loss):.4f}")
        else:
            for i, (x, y, _) in enumerate(iter_batches(train_source, train_sampler, batch_size)):
                if cancel_event.is_set():
                    break
                key, step_key = jax.random.split(key)
                with metrics.timed(TRAIN_STEPS):
                    params, opt_state, loss = step(
                        params, opt_state, jnp.asarray(x), jnp.asarray(y), step_key
                    )
                if i % 50 == 0:
                    print(f"[Epoch {e + 1}/{epochs} Batch {i}] Loss: {float(loss):.4f}")

        def cancel_return():
            # Mirror of the loop-top cancel branch: return only COMPLETE
            # epochs' results.
            nonlocal best_params, best_epoch
            if best_params is None and not has_val and epoch_reports:
                best_params, best_epoch = params, len(epoch_reports) - 1
            return (jax.device_get(best_params) if best_params is not None else None,
                    epoch_reports, best_epoch)

        if cancel_event.is_set():
            # Canceled mid-epoch: skip evaluation entirely — don't spend
            # device time on a result that must be discarded anyway.
            return cancel_return()

        # Per-epoch evaluation (balanced train stream + sequential val).
        eval_sampler = BalancedSampler(
            train_source.manifest, len(behaviors), seed=seed + 1000 + e
        )
        if train_store is not None:
            t_true, t_pred = predict_store(
                params, logits_prog, train_store, eval_sampler, batch_size, cancel_event
            )
        else:
            t_true, t_pred = predict_source(
                params, logits_prog, train_source, eval_sampler, batch_size, cancel_event
            )
        if cancel_event.is_set():
            # Cancel landed during the train-set eval: t_true is a truncated
            # prefix (or empty) — don't record it or count it as no_improve.
            return cancel_return()
        if t_true.size == 0:
            # Keep reports index-aligned with epoch numbers even for a
            # skipped evaluation (callers index reports[best_epoch]).
            epoch_reports.append(PerformanceReport({}, np.array([]), {}, np.array([])))
            no_improve += 1
            if no_improve >= patience:
                break
            continue
        train_report, train_cm = report_and_cm(t_true, t_pred, behaviors)

        val_report, val_cm = {}, np.array([])
        if has_val:
            if val_store is not None:
                v_true, v_pred = predict_store(
                    params, logits_prog, val_store,
                    SequentialSampler(len(val_source)), batch_size, cancel_event,
                )
            else:
                v_true, v_pred = predict_source(
                    params,
                    logits_prog,
                    val_source,
                    SequentialSampler(len(val_source)),
                    batch_size,
                    cancel_event,
                )
            if v_true.size:
                val_report, val_cm = report_and_cm(v_true, v_pred, behaviors)

        if cancel_event.is_set():
            # A cancel that landed DURING evaluation truncated the predict
            # loops: recording the partial prefix could beat the genuine
            # best_f1 and be checkpointed as the production winner, and an
            # empty val eval would inflate no_improve into a phantom
            # early-stop on resume. Discard the epoch's evaluation.
            return cancel_return()

        epoch_reports.append(PerformanceReport(train_report, train_cm, val_report, val_cm))

        cur_val = f1_of(val_report, optimization_target)
        cur_train = f1_of(train_report, optimization_target)
        val_str = f"{cur_val:.4f}" if has_val else "N/A"
        if progress_callback:
            progress_callback(f"Epoch {e + 1} Val F1: {val_str}")
        print(
            f"--- Epoch {e + 1} | Train F1: {cur_train:.4f} | Val F1: {val_str} "
            f"({optimization_target}) ---"
        )

        if cur_val > best_f1:
            best_f1, best_epoch = cur_val, e
            best_params = jax.tree.map(lambda a: a.copy(), params)
            no_improve = 0
            # Checkpoint the best epoch's REPORTS too: a resumed run that
            # never improves must still return a real report at best_epoch
            # (callers record reports[best_epoch] as the winner).
            best_report_payload = {
                "train_report": train_report, "train_cm": train_cm.tolist(),
                "val_report": val_report, "val_cm": val_cm.tolist(),
            }
        else:
            no_improve += 1

        if checkpoint_path:
            save_train_state(
                checkpoint_path, params, opt_state,
                best_params if best_params is not None else params,
                {"epoch": e, "best_f1": best_f1, "best_epoch": best_epoch,
                 "no_improve": no_improve, "seed": seed,
                 "best_reports": best_report_payload},
            )

        if has_val and no_improve >= patience:
            print(f"Early stopping triggered at epoch {e + 1}.")
            break

    if best_params is None and epochs > 0 and not has_val and epoch_reports:
        best_params, best_epoch = params, len(epoch_reports) - 1
    if best_params is None:
        return None, None, -1
    return (
        {k: np.asarray(v) for k, v in jax.device_get(best_params).items()},
        epoch_reports,
        best_epoch,
    )


def evaluate_on_split(
    params: dict,
    cfg: DeltasHeadConfig,
    source: WindowSource,
    behaviors: Sequence[str],
    batch_size: int = 512,
) -> dict:
    """One-shot evaluation: {"report": ..., "cm": ...} (backend/cbas.py:1222-1251)."""
    logits_prog = build_logits_program(cfg)
    dev_params = {k: jnp.asarray(v) for k, v in params.items()}
    y_true, y_pred = predict_source(
        dev_params, logits_prog, source, SequentialSampler(len(source)), batch_size
    )
    if y_true.size == 0:
        return {"report": {}, "cm": np.array([])}
    rep, cm = report_and_cm(y_true, y_pred, behaviors)
    return {"report": rep, "cm": cm}

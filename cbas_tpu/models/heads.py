"""Behavior-classification heads as pure-JAX sequence models.

Numerics-exact rebuilds of the reference heads (backend/classifier_head.py):

- :func:`deltas_forward` — the production ``ClassifierLSTMDeltas``: EMA-smoothed
  CLS stream + velocity + acceleration bottlenecks, biLSTM over the fused
  stream, temperature-softmax attention pooling over the center window, a
  parallel linear branch on the smoothed CLS center window, and a learnable
  sigmoid gate fusing the two.
- :func:`legacy_forward` — the v2 ``ClassifierLegacyLSTM`` kept for loading old
  model bundles.

Parameters are flat dicts keyed by torch ``state_dict`` names (a valid JAX
pytree), so reference ``model.pth`` checkpoints round-trip without remapping.
All matmuls keep torch's (out, in) weight layout and apply ``x @ W.T + b``.
Dropout/noise only fire when ``train=True`` and an rng is supplied; eval mode
is deterministic and matches torch eval output to float32 tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cbas_tpu.models.lstm import init_lstm_params, lstm_forward
from cbas_tpu.ops.ema import robust_deltas

Params = Dict[str, jnp.ndarray]

LN_EPS = 1e-5  # torch nn.LayerNorm default
BN_EPS = 1e-5  # torch nn.BatchNorm1d default


def _linear(params: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params[f"{name}.weight"].T + params[f"{name}.bias"]


def _layer_norm(params: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * params[f"{name}.weight"] + params[f"{name}.bias"]).astype(x.dtype)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU() default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


def _dropout(x: jnp.ndarray, p: float, train: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    if not train or p <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


# ---------------------------------------------------------------------------
# ClassifierLSTMDeltas
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DeltasHeadConfig:
    """Hyperparameters of the deltas head (backend/classifier_head.py:62-64)."""

    in_features: int = 768
    out_features: int = 2
    seq_len: int = 31
    bottleneck_dim: int = 128
    dropout_p: float = 0.15
    use_acceleration: bool = True
    ema_alpha: float = 0.3
    center_window_size: int = 5
    lstm_hidden_size: int = 64
    lstm_layers: int = 1

    @property
    def hsl(self) -> int:
        return self.seq_len // 2


def _center_bounds(hsl: int, sw: int, length: int) -> Tuple[int, int]:
    return max(0, hsl - sw), min(length, hsl + sw + 1)


def init_deltas_params(key: jax.Array, cfg: DeltasHeadConfig, dtype=jnp.float32) -> Params:
    """torch-equivalent initialization (U(±1/sqrt(fan_in)) linears, etc.)."""
    params: Params = {}

    def linear(name: str, fan_in: int, fan_out: int) -> None:
        nonlocal key
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(fan_in)
        params[f"{name}.weight"] = jax.random.uniform(
            kw, (fan_out, fan_in), dtype, minval=-bound, maxval=bound
        )
        params[f"{name}.bias"] = jax.random.uniform(
            kb, (fan_out,), dtype, minval=-bound, maxval=bound
        )

    linear("cls_bottleneck.0", cfg.in_features, cfg.bottleneck_dim)
    linear("delta_bottleneck.0", cfg.in_features, cfg.bottleneck_dim)
    streams = 2
    if cfg.use_acceleration:
        linear("acc_bottleneck.0", cfg.in_features, cfg.bottleneck_dim)
        streams = 3
    for ln in ("cls_ln", "delta_ln") + (("acc_ln",) if cfg.use_acceleration else ()):
        params[f"{ln}.weight"] = jnp.ones((cfg.bottleneck_dim,), dtype)
        params[f"{ln}.bias"] = jnp.zeros((cfg.bottleneck_dim,), dtype)
    linear("lin0.0", cfg.bottleneck_dim * streams, 256)
    params["gate"] = jnp.asarray(0.2, dtype)
    linear("attention_head", cfg.lstm_hidden_size * 2, 1)
    params["attention_temp"] = jnp.asarray(1.0, dtype)
    linear("lin1", cfg.in_features, cfg.out_features)
    linear("lin2", cfg.lstm_hidden_size * 2, cfg.out_features)
    key, klstm = jax.random.split(key)
    params.update(
        init_lstm_params(klstm, 256, cfg.lstm_hidden_size, cfg.lstm_layers, dtype=dtype)
    )
    return params


def deltas_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: DeltasHeadConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass: (B, T, in_features) -> (logits (B, out), latent (B, 2H))."""
    B, T, _ = x.shape
    keys = jax.random.split(rng, 5) if (train and rng is not None) else [None] * 5

    cls_s, delta_s, acc_s = robust_deltas(x, cfg.ema_alpha)

    # Linear branch: mean of per-frame logits over the center window of the
    # smoothed stream (backend/classifier_head.py:119-129).
    l, r = _center_bounds(cfg.hsl, cfg.center_window_size, T)
    if l >= r:
        idx = min(max(0, T // 2), T - 1) if T > 0 else 0
        linear_logits = _linear(params, "lin1", cls_s[:, idx, :])
    else:
        linear_logits = _linear(params, "lin1", cls_s[:, l:r, :]).mean(axis=1)

    def bottleneck(name: str, ln: str, stream: jnp.ndarray, k) -> jnp.ndarray:
        h = _dropout(_gelu(_linear(params, f"{name}.0", stream)), 0.1, train, k)
        return _layer_norm(params, ln, h)

    parts = [
        bottleneck("cls_bottleneck", "cls_ln", cls_s, keys[0]),
        bottleneck("delta_bottleneck", "delta_ln", delta_s, keys[1]),
    ]
    if cfg.use_acceleration:
        parts.append(bottleneck("acc_bottleneck", "acc_ln", acc_s, keys[2]))
    x_aug = jnp.concatenate(parts, axis=-1)

    x_lstm = _dropout(_gelu(_linear(params, "lin0.0", x_aug)), cfg.dropout_p, train, keys[3])

    # Mean-center over time in fp32 (backend/classifier_head.py:166-167).
    mean32 = x_lstm.astype(jnp.float32).mean(axis=1, keepdims=True)
    x_lstm = (x_lstm - mean32).astype(x_lstm.dtype)

    lstm_out = lstm_forward(params, x_lstm, cfg.lstm_hidden_size, cfg.lstm_layers)

    L = lstm_out.shape[1]
    l, r = _center_bounds(cfg.hsl, cfg.center_window_size, L)
    if l >= r:
        idx = min(max(0, L // 2), L - 1) if L > 0 else 0
        attended = lstm_out[:, idx, :]
    else:
        center = lstm_out[:, l:r, :]
        temp = jax.nn.softplus(params["attention_temp"]) + 1e-3
        scores = _linear(params, "attention_head", center)[..., 0] / temp
        weights = jax.nn.softmax(scores, axis=1)[..., None]
        attended = (weights * center).sum(axis=1)

    lstm_logits = _linear(params, "lin2", attended)

    # final = lerp(linear, lstm, sigmoid(gate))
    gate = jax.nn.sigmoid(params["gate"])
    final_logits = linear_logits + gate * (lstm_logits - linear_logits)
    return final_logits, attended


# ---------------------------------------------------------------------------
# ClassifierLegacyLSTM (v2 compatibility)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LegacyHeadConfig:
    in_features: int = 768
    out_features: int = 2
    seq_len: int = 31
    lstm_hidden_size: int = 64  # fixed at 64 in the reference
    center_window_size: int = 5

    @property
    def hsl(self) -> int:
        return self.seq_len // 2


def legacy_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: LegacyHeadConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Legacy v2 head (backend/classifier_head.py:12-51).

    Returns (lstm_logits, linear_logits, latent); the inference-time combined
    output is ``lstm_logits + linear_logits`` (``forward_nodrop``).

    INFERENCE-ONLY compatibility surface: the v3 product trains only the
    deltas head, so train-mode BatchNorm (batch statistics + running-stat
    updates) is deliberately not implemented — accepting ``train=True``
    would silently run torch-eval BN under torch-train noise and diverge
    from the reference trainer.
    """
    if train:
        raise NotImplementedError(
            "legacy_forward is inference-only: train-mode BatchNorm is not "
            "implemented for the v2 compatibility head (train the deltas "
            "head instead)."
        )
    # BatchNorm1d over the feature dim using running stats (eval semantics).
    mean = params["batch_norm.running_mean"]
    var = params["batch_norm.running_var"]
    xn = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
    xn = xn * params["batch_norm.weight"] + params["batch_norm.bias"]

    # (The reference's train-time feature-noise regularizer,
    # classifier_head.py:36-38, is intentionally not ported — see the
    # inference-only contract above.)
    l, r = _center_bounds(cfg.hsl, cfg.center_window_size, xn.shape[1])
    linear_logits = _linear(params, "lin1", xn[:, l:r, :]).mean(axis=1)

    x_lstm = _linear(params, "lin0", xn)
    x_lstm = x_lstm - x_lstm.mean(axis=1, keepdims=True)
    lstm_out = lstm_forward(params, x_lstm, cfg.lstm_hidden_size, 1)
    latent = lstm_out[:, l:r, :].mean(axis=1)
    lstm_logits = _linear(params, "lin2", latent)
    return lstm_logits, linear_logits, latent


def legacy_forward_nodrop(params: Params, x: jnp.ndarray, cfg: LegacyHeadConfig) -> jnp.ndarray:
    lstm_logits, linear_logits, _ = legacy_forward(params, x, cfg, train=False)
    return lstm_logits + linear_logits


# ---------------------------------------------------------------------------
# Hyperparameter inference from checkpoint shapes
# ---------------------------------------------------------------------------

def infer_deltas_hparams(params: Params) -> Dict[str, int]:
    """Recover lstm_hidden_size / lstm_layers from weight shapes.

    Mirrors the robustness trick used when loading bundles whose metadata
    lacks these fields (backend/workthreads.py:416-425).
    """
    if "attention_head.weight" in params:
        hidden = int(params["attention_head.weight"].shape[1]) // 2
    else:
        hidden = int(params["lin2.weight"].shape[1]) // 2
    layer_ids = [
        int(k.split("weight_ih_l")[1].split("_")[0])
        for k in params
        if "lstm.weight_ih_l" in k
    ]
    layers = max(layer_ids) + 1 if layer_ids else 1
    return {"lstm_hidden_size": hidden or 64, "lstm_layers": layers}

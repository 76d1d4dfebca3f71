"""Multi-layer bidirectional LSTM as a JAX scan, torch-semantics-exact.

The reference head wraps ``torch.nn.LSTM`` (backend/classifier_head.py:100).
This module reproduces its numerics exactly — gate order (i, f, g, o), the
duplicated ``bias_ih``/``bias_hh`` terms, and bidirectional output concat
[forward, backward] — as a TPU-friendly program:

- the input projection ``X @ W_ih^T + b`` for all timesteps is hoisted out of
  the recurrence into one large MXU matmul per layer/direction,
- only the sequential ``h @ W_hh^T`` part runs inside ``lax.scan``.

Parameters use torch ``state_dict`` naming (``weight_ih_l{k}[_reverse]`` ...)
so reference checkpoints load without remapping.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _cell_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray):
    """Run one direction of one layer.

    x_proj: (T, B, 4H) precomputed input projections (both biases included)
    w_hh:   (4H, H) torch-layout recurrent weights
    Returns outputs (T, B, H).
    """
    hidden = w_hh.shape[1]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.T
        i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (_, _), ys = jax.lax.scan(step, (h0, c0), x_proj)
    return ys


def lstm_forward(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    hidden_size: int,
    num_layers: int = 1,
    prefix: str = "lstm.",
) -> jnp.ndarray:
    """Bidirectional multi-layer LSTM, batch_first: x (B, T, D) -> (B, T, 2H)."""
    B, T, _ = x.shape
    h = x
    for layer in range(num_layers):
        outs = []
        for direction, suffix in ((0, ""), (1, "_reverse")):
            w_ih = params[f"{prefix}weight_ih_l{layer}{suffix}"]
            w_hh = params[f"{prefix}weight_hh_l{layer}{suffix}"]
            b_ih = params[f"{prefix}bias_ih_l{layer}{suffix}"]
            b_hh = params[f"{prefix}bias_hh_l{layer}{suffix}"]
            seq = h[:, ::-1, :] if direction == 1 else h
            # One big (B*T, D) @ (D, 4H) matmul feeds the whole recurrence.
            x_proj = seq @ w_ih.T + (b_ih + b_hh)
            x_proj = jnp.transpose(x_proj, (1, 0, 2))  # (T, B, 4H)
            h0 = jnp.zeros((B, hidden_size), h.dtype)
            ys = _cell_scan(x_proj, w_hh, h0, h0)  # (T, B, H)
            ys = jnp.transpose(ys, (1, 0, 2))
            if direction == 1:
                ys = ys[:, ::-1, :]
            outs.append(ys)
        h = jnp.concatenate(outs, axis=-1)
    return h


def init_lstm_params(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int = 1,
    prefix: str = "lstm.",
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """torch-equivalent init: U(-1/sqrt(H), 1/sqrt(H)) for every tensor."""
    params: Dict[str, jnp.ndarray] = {}
    bound = 1.0 / jnp.sqrt(hidden_size)
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else 2 * hidden_size
        for suffix in ("", "_reverse"):
            for name, shape in (
                (f"weight_ih_l{layer}{suffix}", (4 * hidden_size, in_dim)),
                (f"weight_hh_l{layer}{suffix}", (4 * hidden_size, hidden_size)),
                (f"bias_ih_l{layer}{suffix}", (4 * hidden_size,)),
                (f"bias_hh_l{layer}{suffix}", (4 * hidden_size,)),
            ):
                key, sub = jax.random.split(key)
                params[prefix + name] = jax.random.uniform(
                    sub, shape, dtype, minval=-bound, maxval=bound
                )
    return params

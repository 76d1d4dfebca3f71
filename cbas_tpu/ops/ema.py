"""EMA smoothing and temporal deltas, TPU-parallel.

The reference smooths the CLS stream with a sequential per-step lerp loop
(backend/classifier_head.py:102-117). That recurrence,

    s_0 = x_0;  s_t = (1 - a) * s_{t-1} + a * x_t,

is a first-order linear scan, so instead of a length-T sequential loop we run
``jax.lax.associative_scan`` — O(log T) depth, fully vectorized on the VPU.
Computation happens in float32 and is cast back, matching the reference's
fp32-compute/cast-back behavior.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ema_smooth(x: jnp.ndarray, alpha: float, axis: int = 1) -> jnp.ndarray:
    """Exponential moving average along ``axis`` with s_0 = x_0.

    Elements are (A, b) pairs composing s' = A*s + b; the first element gets
    A=1, b=x_0 so the boundary condition holds.
    """
    x32 = x.astype(jnp.float32)
    x32 = jnp.moveaxis(x32, axis, 0)
    T = x32.shape[0]
    coeff = jnp.full((T,) + (1,) * (x32.ndim - 1), 1.0 - alpha, jnp.float32)
    coeff = coeff.at[0].set(1.0)
    b = alpha * x32
    b = b.at[0].set(x32[0])

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, smooth = jax.lax.associative_scan(combine, (coeff, b), axis=0)
    # cast back per the module contract ("computation happens in float32 and
    # is cast back"): a bf16 stream must not silently widen downstream
    return jnp.moveaxis(smooth, 0, axis).astype(x.dtype)


def robust_deltas(
    x_seq: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(smoothed, velocity, acceleration) streams for a (B, T, C) window.

    Matches ``ClassifierLSTMDeltas._calculate_robust_deltas``
    (backend/classifier_head.py:102-117): EMA smooth, left-pad 2 frames with
    reflection (replication when T < 3), then first and second differences.
    """
    B, T, C = x_seq.shape
    smooth = ema_smooth(x_seq, alpha, axis=1)  # x_seq.dtype (fp32 scan inside)

    if T >= 3:
        # reflect: [s2, s1, s0, s1, s2, ...]
        pad = smooth[:, 2:0:-1, :]
    else:
        pad = jnp.concatenate([smooth[:, :1], smooth[:, :1]], axis=1)
    padded = jnp.concatenate([pad, smooth], axis=1)  # (B, T+2, C)

    dx = padded[:, 1:] - padded[:, :-1]  # (B, T+1, C)
    ddx = dx[:, 1:] - dx[:, :-1]  # (B, T, C)

    dtype = x_seq.dtype
    return smooth.astype(dtype), dx[:, 1:].astype(dtype), ddx.astype(dtype)

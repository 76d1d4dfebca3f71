"""Frame preprocessing: raw decoded pixels -> encoder input.

The reference feeds the ViT the green channel only, scaled to [0, 1] and
replicated to 3 channels, with no ImageNet normalization or resize — videos
are pre-standardized at record/import time (reference: backend/cbas.py:431,674).

TPU-first choices:

- The host ships the green plane as uint8 (1 byte/pixel H2D instead of 12 for
  fp32 RGB); scaling happens on device where bandwidth is cheap.
- Channel replication never materializes: replicating a channel and projecting
  with a (D, 3, p, p) conv is algebraically identical to projecting the single
  plane with the channel-summed kernel, so the encoder wrapper folds the sum
  into the patch-embedding weight and the device program stays single-channel
  end to end (3x less patchify traffic).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def extract_green_plane(frames_rgb: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 RGB -> contiguous (B, H, W) uint8 green plane (host)."""
    return np.ascontiguousarray(frames_rgb[:, :, :, 1])


def normalize_plane(plane_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, H, W) -> [0, 1] floats of the compute dtype (device)."""
    return plane_u8.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)


def fold_channels_into_patch_kernel(conv_weight: np.ndarray) -> np.ndarray:
    """(D, 3, p, p) conv kernel -> (D, p*p) single-plane projection.

    Valid because the replicated channels are identical:
    sum_c w[:, c] * x == (sum_c w[:, c]) * x.
    """
    w = np.asarray(conv_weight)
    d = w.shape[0]
    return w.sum(axis=1).reshape(d, -1)


def patchify_plane(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W) -> (B, N, p*p) patch vectors, torch-conv flooring semantics."""
    B, H, W = x.shape
    hp, wp = H // patch, W // patch
    x = x[:, : hp * patch, : wp * patch]
    x = x.reshape(B, hp, patch, wp, patch)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(B, hp * wp, patch * patch)

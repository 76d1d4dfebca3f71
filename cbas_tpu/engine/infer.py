"""Halo-chunked sliding-window inference: HDF5 embeddings -> per-frame CSV.

The long-context strategy follows the reference (backend/cbas.py:458-572):
frames are processed in chunks of ~20k with ±seq_len/2 halo reads, edge frames
replicate-padded, one probability row per frame. TPU-first differences:

- Each chunk is transferred to HBM once; windows are *gathered on device*
  (stride-1 windows over consecutive frames are a static-index gather), so no
  (B, T, D) window tensor ever crosses the host-device boundary.
- The window batch program is jitted once for a fixed (window_batch, seq_len)
  and reused across chunks/files; the final partial batch re-reads overlapping
  windows at a clamped offset rather than padding, keeping shapes static.
- Probabilities (softmax / calibrated temperature) are computed on device.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Callable, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cbas_tpu.core.config import InferenceConfig
from cbas_tpu.core.hdf5_store import DATASET_NAME
from cbas_tpu.engine.classifier import ClassifierBundle
from cbas_tpu.utils.metrics import INFER_FRAMES, INFER_WINDOWS, metrics
from cbas_tpu.utils.naming import outputs_csv_for_h5


def _window_program(bundle: ClassifierBundle, window_batch: int, mesh=None):
    """Build fn(params, chunk (M, D), offset) -> probs (window_batch, C).

    ``chunk`` holds seq_len-1 halo rows beyond the targets; window i covers
    rows [offset+i, offset+i+seq_len).

    With a mesh, the window batch is split on the "data" axis: params and the
    chunk are replicated (the chunk is tens of MB; the halo overlap between
    neighboring windows makes row-sharding it pointless) and GSPMD propagates
    the batch sharding backwards from the output through the head forward.
    """
    seq_len = bundle.seq_len
    probs = bundle.probs_fn()
    idx = np.arange(window_batch)[:, None] + np.arange(seq_len)[None, :]
    idx = jnp.asarray(idx)

    def fn(params, chunk, offset):
        rows = jax.lax.dynamic_slice_in_dim(chunk, offset, window_batch + seq_len - 1)
        windows = rows[idx]  # (window_batch, seq_len, D) static gather
        return probs(params, windows.astype(jnp.float32))

    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(repl, repl, repl),
        out_shardings=NamedSharding(mesh, P("data", None)),
    )


class InferenceSession:
    """Reusable compiled inference pipeline for one model bundle.

    ``mesh``: optional multi-chip data-parallel mesh (parallel/mesh.py); the
    window batch is padded to a mesh multiple and split over the "data" axis.
    """

    def __init__(
        self,
        bundle: ClassifierBundle,
        config: Optional[InferenceConfig] = None,
        mesh=None,
    ):
        self.bundle = bundle
        self.cfg = config or InferenceConfig()
        self.mesh = mesh
        self._chunk_sharding = None
        wb = self.cfg.window_batch
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from cbas_tpu.parallel.mesh import data_axis_size, pad_to_multiple

            wb = pad_to_multiple(wb, data_axis_size(mesh))
            self._chunk_sharding = NamedSharding(mesh, P())
        self._window_batch = wb
        self._params = bundle.jax_params()
        if self._chunk_sharding is not None:
            self._params = jax.device_put(self._params, self._chunk_sharding)
        self._program = _window_program(bundle, wb, mesh)

    def _bucket_rows(self, n_targets: int) -> int:
        """Device rows for a chunk with ``n_targets`` target frames: the
        smallest doubling bucket of targets (window_batch, 2*window_batch, ...,
        chunk_frames) that fits, plus the 2*(seq_len//2) halo rows."""
        halo = 2 * (self.bundle.seq_len // 2)
        cap = max(self.cfg.chunk_frames, self._window_batch)
        bucket = self._window_batch
        while bucket < min(n_targets, cap):
            bucket = min(bucket * 2, cap)
        return bucket + halo

    def predict_frames(self, features: np.ndarray, pad_front: int, pad_back: int) -> np.ndarray:
        """Probabilities for every target frame of one halo-extended chunk.

        ``features``: (n_rows, D) embeddings covering the targets plus
        available halo; missing halo is synthesized by replicating edge rows
        ``pad_front``/``pad_back`` times (reference: backend/cbas.py:510-525).
        """
        h = self.bundle.seq_len // 2
        if pad_front:
            features = np.concatenate(
                [np.repeat(features[:1], pad_front, axis=0), features], axis=0
            )
        if pad_back:
            features = np.concatenate(
                [features, np.repeat(features[-1:], pad_back, axis=0)], axis=0
            )
        n_targets = features.shape[0] - 2 * h
        if n_targets <= 0:
            return np.zeros((0, len(self.bundle.behaviors)), np.float32)

        wb = self._window_batch
        # Pad to a geometry bucket so device bytes stay proportional to file
        # size: short segments (10-min recordings are ~6k frames vs the 20k
        # chunk) would otherwise pay a full chunk_frames-row device_put
        # (~30 MB) per file. Buckets double from window_batch up to
        # chunk_frames, so every chunk of every file hits one of O(log)
        # compiled shapes, and the common cases (full chunks, uniform segment
        # lengths) reuse their program across files.
        fixed_rows = self._bucket_rows(n_targets)
        if features.shape[0] < fixed_rows:
            features = np.concatenate(
                [features,
                 np.repeat(features[-1:], fixed_rows - features.shape[0], axis=0)],
                axis=0,
            )
        if self._chunk_sharding is not None:
            chunk_dev = jax.device_put(jnp.asarray(features), self._chunk_sharding)
        else:
            chunk_dev = jax.device_put(jnp.asarray(features))

        out = np.empty((n_targets, len(self.bundle.behaviors)), np.float32)
        t0 = time.perf_counter()
        if n_targets <= wb:
            probs = np.asarray(self._program(self._params, chunk_dev, 0))
            out[:] = probs[:n_targets]
            # count the fast path too — short segments are the common case
            # this telemetry exists to observe
            metrics.add(INFER_WINDOWS, n_targets, time.perf_counter() - t0)
            return out
        offset = 0
        while offset < n_targets:
            take = min(wb, n_targets - offset)
            # Clamp the final batch so it re-reads overlapping windows instead
            # of changing shape; keep only its trailing `take` rows.
            start = offset if take == wb else n_targets - wb
            probs = np.asarray(self._program(self._params, chunk_dev, start))
            out[offset : offset + take] = probs if take == wb else probs[-take:]
            offset += take
        metrics.add(INFER_WINDOWS, n_targets, time.perf_counter() - t0)
        return out

    def infer_h5(
        self,
        h5_path: str,
        output_csv: Optional[str] = None,
        progress_callback: Optional[Callable[[float], None]] = None,
        cancel_event=None,
    ) -> Optional[str]:
        """Run the full file and write ``*_<model>_outputs.csv``.

        ``cancel_event`` (a threading.Event) is polled per chunk: inference
        of an hour-long video spans hundreds of device calls, and shutdown
        joins workers with a bounded timeout — without a cancel hook the
        join times out and a subsequent project load races the still-running
        worker (same contract as encode_file's cancel_event). A canceled
        file writes NO csv (the CSV's existence is the done-marker).
        """
        output_csv = output_csv or outputs_csv_for_h5(h5_path, self.bundle.name)
        h = self.bundle.seq_len // 2
        chunk = self.cfg.chunk_frames

        with h5py.File(h5_path, "r") as f:
            dset = f[DATASET_NAME]
            total = dset.shape[0]
            if total == 0:
                print(f"Warning: HDF5 file {h5_path} is empty.")
                return None

            all_probs = []
            for start in range(0, total, chunk):
                if cancel_event is not None and cancel_event.is_set():
                    return None
                end = min(start + chunk, total)
                read_start = max(0, start - h)
                read_end = min(total, end + h)
                feats = dset[read_start:read_end]
                probs = self.predict_frames(
                    feats,
                    pad_front=h - (start - read_start),
                    pad_back=h - (read_end - end),
                )
                assert probs.shape[0] == end - start
                all_probs.append(probs)
                if progress_callback:
                    progress_callback(end / total * 100.0)

        probs = np.concatenate(all_probs, axis=0)
        if probs.shape[0] != total:
            print(
                f"Warning: prediction count ({probs.shape[0]}) != frame count ({total})."
            )
        metrics.add(INFER_FRAMES, total, 0.0)
        # tmp+rename: the CSV's EXISTENCE is the done-marker everywhere
        # (start_classification / scan_classify_todo skip files that have
        # one), so a crash mid-write must not leave a truncated CSV that
        # reads as "already classified" and silently time-shifts stitched
        # actograms. Same contract as the H5 writer (reference:
        # backend/cbas.py:410-442 is atomic for H5 but not for this CSV).
        # Unique staging name: two in-process writers of the same CSV (live
        # worker chaining a re-encode + a guided-labeling re-infer share no
        # claim protocol) must not publish each other's half-written tmp.
        tmp = f"{output_csv}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        try:
            pd.DataFrame(probs, columns=self.bundle.behaviors).to_csv(tmp, index=False)
            os.replace(tmp, output_csv)
        finally:
            if os.path.exists(tmp):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        return output_csv


def infer_file(
    h5_path: str,
    bundle: ClassifierBundle,
    output_csv: Optional[str] = None,
    config: Optional[InferenceConfig] = None,
    progress_callback: Optional[Callable[[float], None]] = None,
    mesh=None,
) -> Optional[str]:
    """One-shot convenience wrapper (reference API: cbas.infer_file)."""
    return InferenceSession(bundle, config, mesh=mesh).infer_h5(
        h5_path, output_csv, progress_callback
    )

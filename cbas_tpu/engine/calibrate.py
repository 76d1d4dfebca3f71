"""Temperature calibration of model confidence.

Matches the reference's procedure (backend/workthreads.py:103-137): minimize
validation NLL over a softplus-parameterized scalar temperature clamped to
(1e-3, 10]. Logits are collected once with the compiled eval program; the 1-D
optimization runs host-side (scipy), which is exact and instant at this size.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from cbas_tpu.engine.data import SequentialSampler, WindowSource
from cbas_tpu.engine.train import build_logits_program, collect_logits_source
from cbas_tpu.models.heads import DeltasHeadConfig


def _clamp_temp(t_raw: float) -> float:
    # softplus(t) + 1e-3, clamped to <= 10 (reference: workthreads.py:130,136)
    return float(min(np.logaddexp(0.0, t_raw) + 1e-3, 10.0))


def fit_temperature_from_logits(logits: np.ndarray, labels: np.ndarray) -> float:
    """Optimal clamped-softplus temperature for NLL on (logits, labels)."""
    if logits.size == 0:
        return 1.0
    logits = logits.astype(np.float64)
    labels = labels.astype(np.int64)

    def nll(t_raw: np.ndarray) -> float:
        temp = min(np.logaddexp(0.0, t_raw[0]) + 1e-3, 10.0)
        z = logits / temp
        z = z - z.max(axis=1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
        return float(-logp[np.arange(len(labels)), labels].mean())

    res = minimize(nll, x0=np.array([1.0]), method="Nelder-Mead", options={"xatol": 1e-6})
    return _clamp_temp(float(res.x[0]))


def fit_temperature(
    params: dict,
    cfg: DeltasHeadConfig,
    val_source: Optional[WindowSource],
    batch_size: int = 512,
) -> float:
    """Collect validation logits with the jitted head and fit the temperature."""
    if val_source is None or len(val_source) == 0:
        return 1.0
    logits_prog = build_logits_program(cfg)
    dev_params = {k: jnp.asarray(v) for k, v in params.items()}
    logits, labels = collect_logits_source(
        dev_params, logits_prog, val_source,
        SequentialSampler(len(val_source)), batch_size,
    )
    if logits.size == 0:
        return 1.0
    return fit_temperature_from_logits(logits, labels)

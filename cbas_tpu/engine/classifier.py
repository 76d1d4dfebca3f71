"""BehaviorClassifier: a loaded head-model bundle with jitted device programs.

Bundles are self-describing directories compatible with the reference
(backend/workthreads.py:856-887):

    model.npz          native weights (always written)
    model.pth          torch state_dict (written when torch is available, so
                       reference installs can load our models)
    config.yaml        name / behaviors / seq_len / architecture
    model_meta.json    schema, encoder id, head version, hyperparams, calibration

Loading tolerates missing metadata and infers architecture hyperparameters
from weight shapes, like the reference's legacy path
(backend/workthreads.py:401-441).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cbas_tpu.core.config import dump_yaml, load_yaml
from cbas_tpu.utils.logging import log_message
from cbas_tpu.models.heads import (
    DeltasHeadConfig,
    LegacyHeadConfig,
    deltas_forward,
    infer_deltas_hparams,
    legacy_forward_nodrop,
)

DELTAS_ARCH = "ClassifierLSTMDeltas"
LEGACY_ARCH = "ClassifierLegacyLSTM"


@dataclass
class ClassifierBundle:
    """Everything needed to run (or re-save) a trained behavior classifier."""

    name: str
    behaviors: List[str]
    seq_len: int
    params: Dict[str, np.ndarray]
    architecture: str = DELTAS_ARCH
    lstm_hidden_size: int = 64
    lstm_layers: int = 1
    use_acceleration: bool = True
    temperature: float = 1.0
    encoder_identifier: Optional[str] = None
    meta: dict = field(default_factory=dict)

    # -- persistence ---------------------------------------------------------

    def save(self, model_dir: str, extra_meta: Optional[dict] = None) -> None:
        """Write the bundle with hot-reload-safe ordering.

        A live ClassifyWorker reloads when it sees a fresh ``model.npz``, so
        metadata is written FIRST and the weights LAST (each file staged to a
        tmp name and os.replace'd, never partially visible): any reader that
        observes the new npz also observes the matching metadata. The reverse
        interleaving (old weights + new meta) is tolerated by ``load()``,
        which trusts weight shapes over metadata hyperparameters.
        """
        os.makedirs(model_dir, exist_ok=True)

        def _replace(write_fn, name: str) -> None:
            # keep the real extension on the tmp name (np.savez appends
            # ".npz" to names without it)
            stem, ext = os.path.splitext(name)
            tmp = os.path.join(model_dir, f"{stem}.tmp{ext}")
            write_fn(tmp)
            os.replace(tmp, os.path.join(model_dir, name))

        _replace(
            lambda p: dump_yaml(
                {
                    "name": self.name,
                    "behaviors": self.behaviors,
                    "seq_len": self.seq_len,
                    "architecture": self.architecture,
                },
                p,
            ),
            "config.yaml",
        )

        meta = {
            "model_bundle_schema": "1.0",
            "encoder_model_identifier": self.encoder_identifier,
            "head_architecture_version": self.architecture,
            "hyperparameters": {
                "behaviors": self.behaviors,
                "seq_len": self.seq_len,
                "use_acceleration": self.use_acceleration,
                "lstm_hidden_size": self.lstm_hidden_size,
                "lstm_layers": self.lstm_layers,
            },
            "calibration": {"temperature": float(self.temperature)},
        }
        if extra_meta:
            meta.update(extra_meta)

        def _write_meta(p: str) -> None:
            with open(p, "w", encoding="utf-8") as f:
                json.dump(meta, f, indent=4)

        _replace(_write_meta, "model_meta.json")

        try:
            from cbas_tpu.models.torch_port import save_pth

            _replace(lambda p: save_pth(self.params, p), "model.pth")
        except ImportError:
            pass

        host_params = {k: np.asarray(v) for k, v in self.params.items()}
        _replace(lambda p: np.savez(p, **host_params), "model.npz")

    @classmethod
    def load(cls, model_dir: str, expected_encoder: Optional[str] = None) -> "ClassifierBundle":
        # Empty/blank config.yaml parses to None (yaml.safe_load); normalize
        # once so the .get() fallbacks below can't AttributeError on a
        # legacy bundle whose metadata must come from shapes/meta instead.
        config = dict(load_yaml(os.path.join(model_dir, "config.yaml")) or {})

        meta_path = os.path.join(model_dir, "model_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path, "r", encoding="utf-8") as f:
                meta = json.load(f)
        else:
            # Legacy bundle: default to the v2 head (backend/workthreads.py:379-385).
            meta = {
                "head_architecture_version": LEGACY_ARCH,
                "hyperparameters": dict(config or {}),
            }

        from cbas_tpu.utils.naming import identities_equivalent

        model_encoder = meta.get("encoder_model_identifier")
        if (
            expected_encoder
            and model_encoder
            and not identities_equivalent(model_encoder, expected_encoder)
        ):
            raise ValueError(
                f"Encoder mismatch: project uses '{expected_encoder}' but model "
                f"was trained with '{model_encoder}'. Re-encode videos or switch encoders."
            )

        npz_path = os.path.join(model_dir, "model.npz")
        if os.path.exists(npz_path):
            with np.load(npz_path) as z:
                params = {k: z[k] for k in z.files}
        else:
            from cbas_tpu.models.torch_port import load_pth

            params = load_pth(os.path.join(model_dir, "model.pth"))

        hp = dict(meta.get("hyperparameters") or {})
        behaviors = list(hp.get("behaviors") or config.get("behaviors", []))
        seq_len = int(hp.get("seq_len") or config.get("seq_len", 31))
        arch = meta.get("head_architecture_version", LEGACY_ARCH)

        if arch.startswith(DELTAS_ARCH):
            # Weight shapes are ground truth for the params actually loaded:
            # when metadata disagrees (e.g. a hot reload caught save() between
            # writing weights and metadata), trusting meta crashes the LSTM
            # scan with a contraction mismatch — trust the shapes instead.
            # The disagreement can also be an ARCHITECTURE flip (a legacy
            # bundle retrained as deltas under the same name, hot-read
            # between the meta and npz replaces): the params then lack the
            # deltas keys entirely, which must surface as the same handled
            # "retry the load" error, not a bare KeyError.
            # Sentinel must be a DELTAS-ONLY key: the legacy head also has
            # lin2.weight, so that check would pass on a legacy npz and the
            # mis-inference would still crash downstream.
            if "cls_bottleneck.0.weight" not in params or "lin2.weight" not in params:
                raise ValueError(
                    f"Bundle '{os.path.basename(model_dir)}' metadata says "
                    f"'{arch}' but the weights on disk are a different "
                    "architecture — metadata and weights are out of sync "
                    "(mid-save read?). Retry the load."
                )
            inferred = infer_deltas_hparams(params)
            hidden = int(inferred["lstm_hidden_size"])
            layers = int(inferred["lstm_layers"])
            meta_hidden = hp.get("lstm_hidden_size")
            if meta_hidden and int(meta_hidden) != hidden:
                log_message(
                    f"Bundle '{os.path.basename(model_dir)}' metadata says "
                    f"lstm_hidden_size={meta_hidden} but weights are {hidden} "
                    "(stale metadata mid-save?); using weight shapes.",
                    "WARN",
                )
            use_acc = "acc_bottleneck.0.weight" in params
            arch = DELTAS_ARCH
            out_dim = int(params["lin2.weight"].shape[0])
            if behaviors and len(behaviors) != out_dim:
                raise ValueError(
                    f"Bundle '{os.path.basename(model_dir)}' lists "
                    f"{len(behaviors)} behaviors but the output layer is "
                    f"{out_dim}-wide — metadata and weights are out of sync "
                    "(mid-save read?). Retry the load."
                )
        else:
            hidden, layers, use_acc, arch = 64, 1, False, LEGACY_ARCH

        return cls(
            name=os.path.basename(model_dir),
            behaviors=behaviors,
            seq_len=seq_len,
            params=params,
            architecture=arch,
            lstm_hidden_size=hidden,
            lstm_layers=layers,
            use_acceleration=use_acc,
            temperature=float((meta.get("calibration") or {}).get("temperature", 1.0)),
            encoder_identifier=model_encoder,
            meta=meta,
        )

    # -- device programs -------------------------------------------------------

    def head_config(self):
        if self.architecture == DELTAS_ARCH:
            return DeltasHeadConfig(
                out_features=len(self.behaviors),
                seq_len=self.seq_len,
                lstm_hidden_size=self.lstm_hidden_size,
                lstm_layers=self.lstm_layers,
                use_acceleration=self.use_acceleration,
            )
        return LegacyHeadConfig(out_features=len(self.behaviors), seq_len=self.seq_len)

    def jax_params(self) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in self.params.items()}

    def logits_fn(self):
        """Pure fn(params, windows (B, T, D) f32) -> logits (B, C)."""
        cfg = self.head_config()
        if self.architecture == DELTAS_ARCH:
            return lambda p, x: deltas_forward(p, x, cfg)[0]
        return lambda p, x: legacy_forward_nodrop(p, x, cfg)

    def probs_fn(self):
        """fn(params, windows) -> calibrated softmax probabilities."""
        base = self.logits_fn()
        temp = max(1e-3, float(self.temperature))

        def fn(p, x):
            return jax.nn.softmax(base(p, x) / temp, axis=-1)

        return fn

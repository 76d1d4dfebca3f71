"""DINOv2 (with registers) and DINOv3 vision transformers in pure JAX.

Functional rebuilds of the HF reference encoders used by the pipeline
(reference: backend/cbas.py:650-677 loads ``facebook/dinov2-with-registers-base``
or DINOv3 via ``transformers.AutoModel``). Parameters are flat dicts keyed by
the HF ``state_dict`` names so pretrained checkpoints port without remapping.

TPU-first design notes:

- Patch embedding is a reshape + one large matmul (stride == kernel makes the
  conv exactly a per-patch projection), which maps straight onto the MXU
  instead of going through a convolution lowering.
- Attention softmax runs in float32 (matching HF) and the whole block stack is
  a ``lax.scan``-free static unroll — XLA fuses the elementwise chains into the
  matmuls; layer count is small and static.
- Position-embedding resampling (DINOv2) and RoPE tables (DINOv3) are
  precomputed per input geometry at wrapper level (see models/encoder.py), so
  the jitted program sees only static shapes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cbas_tpu.utils.logging import log_message

Params = Dict[str, jnp.ndarray]

# Tensor-parallel reduction axis (set by parallel/mesh.py's 2-D shard_map
# wrapper while tracing the forward). When set, _attention/_mlp psum their
# out-projection partials over this mesh axis iff their weights arrived
# sharded (detected from the weight shapes vs the config's full dims), so the
# same forward code serves single-chip, DP, and DPxTP layouts. Thread-local:
# program builds on different threads (e.g. a TP encoder and a plain one)
# must not see each other's tracing state.
import threading as _threading

_TP_STATE = _threading.local()


class tp_psum_axis:
    """Context manager enabling TP partial-sum reductions over ``axis``."""

    def __init__(self, axis: Optional[str]):
        self.axis = axis
        self._prev: Optional[str] = None

    def __enter__(self):
        self._prev = getattr(_TP_STATE, "axis", None)
        _TP_STATE.axis = self.axis
        return self

    def __exit__(self, *exc):
        _TP_STATE.axis = self._prev


def _maybe_psum(y: jnp.ndarray, is_partial: bool) -> jnp.ndarray:
    axis = getattr(_TP_STATE, "axis", None)
    if axis is not None and is_partial:
        return jax.lax.psum(y, axis)
    return y


@dataclass(frozen=True)
class ViTConfig:
    variant: str = "dinov2"  # "dinov2" (with registers) | "dinov3"
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    num_register_tokens: int = 4
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-6
    image_size: int = 224          # pretraining geometry (pos-embed grid for dinov2)
    use_swiglu_ffn: bool = False   # dinov2 giant
    use_gated_mlp: bool = False    # dinov3 large+
    rope_theta: float = 100.0      # dinov3
    # dinov3 per-projection bias flags (dinov2 uses qkv_bias for all three)
    query_bias: bool = True
    key_bias: bool = False
    value_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    # tanh-approximated GELU: ~3x cheaper on the VPU than exact erf. Off by
    # default (HF parity); the bf16 encode path enables it — the deviation
    # (~1e-3 relative) is below the fp16 embedding-store quantization.
    gelu_approximate: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_prefix_tokens(self) -> int:
        return 1 + self.num_register_tokens

    @classmethod
    def from_hf(cls, hf_config) -> "ViTConfig":
        """Build from a transformers Dinov2[WithRegisters]Config or DINOv3ViTConfig."""
        t = type(hf_config).__name__
        if "DINOv3" in t:
            return cls(
                variant="dinov3",
                hidden_size=hf_config.hidden_size,
                num_layers=hf_config.num_hidden_layers,
                num_heads=hf_config.num_attention_heads,
                patch_size=hf_config.patch_size,
                num_register_tokens=hf_config.num_register_tokens,
                intermediate_size=hf_config.intermediate_size,
                layer_norm_eps=hf_config.layer_norm_eps,
                image_size=hf_config.image_size,
                use_gated_mlp=hf_config.use_gated_mlp,
                rope_theta=hf_config.rope_theta,
                query_bias=hf_config.query_bias,
                key_bias=hf_config.key_bias,
                value_bias=hf_config.value_bias,
                proj_bias=hf_config.proj_bias,
                mlp_bias=hf_config.mlp_bias,
            )
        inter = int(hf_config.hidden_size * hf_config.mlp_ratio)
        if hf_config.use_swiglu_ffn:
            # Match HF Dinov2SwiGLUFFN: the actual hidden width is 2/3 of
            # hidden*mlp_ratio rounded up to a multiple of 8 (giant: 4096,
            # not 6144); intermediate_size here is the SwiGLU hidden width.
            inter = (int(inter * 2 / 3) + 7) // 8 * 8
        return cls(
            variant="dinov2",
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            patch_size=hf_config.patch_size,
            num_register_tokens=getattr(hf_config, "num_register_tokens", 0),
            intermediate_size=inter,
            layer_norm_eps=hf_config.layer_norm_eps,
            image_size=hf_config.image_size,
            use_swiglu_ffn=hf_config.use_swiglu_ffn,
        )


# Named presets for the model families in BASELINE.json's configs.
PRESETS: Dict[str, ViTConfig] = {
    "dinov2-with-registers-base": ViTConfig(
        variant="dinov2", hidden_size=768, num_layers=12, num_heads=12,
        patch_size=14, num_register_tokens=4, intermediate_size=3072,
        image_size=518,
    ),
    "dinov2-with-registers-small": ViTConfig(
        variant="dinov2", hidden_size=384, num_layers=12, num_heads=6,
        patch_size=14, num_register_tokens=4, intermediate_size=1536,
        image_size=518,
    ),
    "dinov3-vits16": ViTConfig(
        variant="dinov3", hidden_size=384, num_layers=12, num_heads=6,
        patch_size=16, num_register_tokens=4, intermediate_size=1536,
        layer_norm_eps=1e-5, rope_theta=100.0,
    ),
    "dinov3-vitb16": ViTConfig(
        variant="dinov3", hidden_size=768, num_layers=12, num_heads=12,
        patch_size=16, num_register_tokens=4, intermediate_size=3072,
        layer_norm_eps=1e-5, rope_theta=100.0,
    ),
    "dinov3-vitl16": ViTConfig(
        variant="dinov3", hidden_size=1024, num_layers=24, num_heads=16,
        patch_size=16, num_register_tokens=4, intermediate_size=4096,
        layer_norm_eps=1e-5, rope_theta=100.0,
    ),
}


def _config_from_local_json(identifier: str) -> Optional[ViTConfig]:
    """A local checkpoint directory with an HF-style ``config.json`` fully
    describes its own architecture (portable projects ship their encoder
    this way — see examples/demo_project)."""
    import json
    import os

    path = os.path.join(identifier, "config.json")
    if not os.path.isdir(identifier) or not os.path.exists(path):
        return None
    with open(path) as f:
        c = json.load(f)
    # HF save_pretrained serializes config.json with use_diff=True: keys whose
    # value equals the CLASS default are omitted. Absent keys must therefore
    # resolve to each family's class default, not to a shared zero —
    # Dinov2WithRegistersConfig defaults num_register_tokens=4 and a re-saved
    # checkpoint omits it; DINOv3ViTConfig defaults layer_norm_eps=1e-5.
    model_type = c.get("model_type", "")
    is_v3 = "dinov3" in model_type
    common = dict(
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        patch_size=c["patch_size"],
        num_register_tokens=c.get(
            "num_register_tokens", 4 if "register" in model_type else 0
        ),
        layer_norm_eps=c.get("layer_norm_eps", 1e-5 if is_v3 else 1e-6),
    )
    if is_v3:
        return ViTConfig(
            variant="dinov3",
            intermediate_size=c["intermediate_size"],
            rope_theta=c.get("rope_theta", 100.0),
            use_gated_mlp=c.get("use_gated_mlp", False),
            # Per-projection bias flags must survive the round trip: dropping
            # a checkpoint's key_bias silently changes its embeddings while
            # the H5 stamp still validates.
            query_bias=c.get("query_bias", True),
            key_bias=c.get("key_bias", False),
            value_bias=c.get("value_bias", True),
            proj_bias=c.get("proj_bias", True),
            mlp_bias=c.get("mlp_bias", True),
            **common,
        )
    use_swiglu = c.get("use_swiglu_ffn", False)
    inter = c.get("intermediate_size")
    if inter is None:
        inter = int(c["hidden_size"] * c.get("mlp_ratio", 4))
        if use_swiglu:
            # HF Dinov2SwiGLUFFN shrinks the hidden dim to 2/3 (8-aligned);
            # intermediate_size here means the SwiGLU hidden width (weights_in
            # is (2*I, D)), so the same adjustment must apply.
            inter = (int(inter * 2 / 3) + 7) // 8 * 8
    return ViTConfig(
        variant="dinov2",
        intermediate_size=int(inter),
        image_size=c.get("image_size", 518),
        use_swiglu_ffn=use_swiglu,
        **common,
    )


def config_for_identifier(identifier: str) -> ViTConfig:
    """Resolve a model identifier to a ViTConfig.

    Resolution order — ground truth before guesses:
    1. a local directory's own config.json;
    2. the HF cache's config for the identifier (``AutoConfig``,
       local-files-only) via :meth:`ViTConfig.from_hf` — this is what stops a
       name like "dinov3-vits16plus" (gated-MLP) from silently
       substring-matching the plain "dinov3-vits16" preset and producing
       wrong embeddings with no error;
    3. preset-name matching (longest key first), for names with no
       checkpoint on this machine (random-init smoke paths).
    """
    local = _config_from_local_json(identifier)
    if local is not None:
        return local
    try:
        import transformers

        hf = transformers.AutoConfig.from_pretrained(identifier, local_files_only=True)
        return ViTConfig.from_hf(hf)
    except Exception:
        pass  # not cached / transformers absent: fall through to presets
    name = identifier.split("/")[-1].lower()
    for key in sorted(PRESETS, key=len, reverse=True):
        if key in name:
            if key != name:
                log_message(
                    f"Encoder '{identifier}' has no local config; assuming "
                    f"the '{key}' preset architecture from its name. If the "
                    "checkpoint is a variant (plus/gated), embeddings will "
                    "be wrong — provide the checkpoint's config.json.",
                    "WARN",
                )
            return PRESETS[key]
    if "dinov3" in name:
        log_message(
            f"Unknown encoder '{identifier}': assuming dinov3-vitb16 preset.", "WARN"
        )
        return PRESETS["dinov3-vitb16"]
    log_message(
        f"Unknown encoder '{identifier}': assuming dinov2-with-registers-base.", "WARN"
    )
    return PRESETS["dinov2-with-registers-base"]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

_FUSED_ATTENTION: Optional[bool] = None  # None = auto (TPU only)


def set_fused_attention(enabled: Optional[bool]) -> None:
    """Force the Pallas fused-attention kernel on/off (None = auto)."""
    global _FUSED_ATTENTION
    _FUSED_ATTENTION = enabled


# Fused-vs-XLA attention, measured whole-program on v5e (winner's margin).
# With the head-pair packed layout + sublane-granule token padding the
# fused kernel wins at every production geometry, so the rule is simply
# "fused on TPU" (r2's crossover table is obsolete — XLA's short-N wins
# came from the kernel's 128-multiple query padding, since removed):
#   N=1205 ViT-B @480p:    fused 442.5 fps  (XLA ~388)
#   N=261  ViT-B (D=768):  fused 1733 fps   (XLA 1617)
#   N=261  ViT-L (D=1024): fused 562 fps    (XLA 534)
#   N=329  dinov2-B:       fused 1676 fps   (XLA 1624)
# Overridable via set_fused_attention / env (sweeps, regression hunts).


def use_fused_attention() -> bool:
    import os

    if _FUSED_ATTENTION is not None:
        return _FUSED_ATTENTION
    env = os.environ.get("CBAS_TPU_FUSED_ATTENTION")
    if env is not None:
        return env not in ("0", "false", "off")
    return jax.default_backend() not in ("cpu", "gpu")


def _ln(params: Params, name: str, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    import os

    x32 = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16 and not os.environ.get("CBAS_LN_TWO_PASS"):
        # Single-pass variance (E[x^2] - mean^2): XLA does not merge the
        # two-pass form's mean and var reductions, so folding both into one
        # read of the activations saves a full pass per LN — measured
        # -4.7 ms/model-batch / +6% fps at ViT-B 256x256
        # (benchmarks/attn_probes/probe25; re-confirmed r5: 3046 vs 2877
        # fps interleaved vs two-pass).
        # NUMERICS (r4 advisor concern, measured r5): the form cancels in
        # fp32 only when |row mean| >> row std. Pretrained DINOv2/v3
        # "massive activations" are SPARSE huge dims, which blow up the
        # VARIANCE — the safe direction: on rows with dims at +-1000-5000
        # amid unit noise this form matches a two-pass fp64 reference to
        # <=5e-6 (tests/test_vit_parity.py
        # test_layernorm_single_pass_outlier_parity). Degradation needs a
        # near-constant row (uniform offset with |mean|/std >~ 100:
        # 5e-3 at mu/sigma=100, diverging by 1000) — a regime transformer
        # hidden states do not occupy. A shifted one-pass form (variance
        # about x[...,:1]) fixes even that regime but costs the entire win
        # (2873 fps: the lane broadcast forces a second materialization),
        # so the fix for exotic inputs is the env gate below.
        # CBAS_LN_TWO_PASS=1 forces the exact two-pass form (A/B switch).
        mean = x32.mean(-1, keepdims=True)
        var = jnp.maximum((x32 * x32).mean(-1, keepdims=True) - mean * mean, 0.0)
    else:
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (
        y * params[f"{name}.weight"].astype(jnp.float32)
        + params[f"{name}.bias"].astype(jnp.float32)
    ).astype(x.dtype)


def _dense(params: Params, name: str, x: jnp.ndarray, bias: bool = True) -> jnp.ndarray:
    y = x @ params[f"{name}.weight"].T.astype(x.dtype)
    if bias:
        y = y + params[f"{name}.bias"].astype(x.dtype)
    return y


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, N, C*p*p) patch vectors ordered (c, dy, dx).

    Equivalent to a stride-p conv im2col; trailing rows/cols that don't fill a
    whole patch are dropped, matching torch Conv2d flooring.
    """
    B, C, H, W = x.shape
    hp, wp = H // patch, W // patch
    x = x[:, :, : hp * patch, : wp * patch]
    x = x.reshape(B, C, hp, patch, wp, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, hp, wp, C, p, p)
    return x.reshape(B, hp * wp, C * patch * patch)


def _rot_half(t: jnp.ndarray) -> jnp.ndarray:
    hd = t.shape[-1]
    return jnp.concatenate([-t[..., hd // 2 :], t[..., : hd // 2]], axis=-1)


def _full_rope_tables(
    rope: Tuple[jnp.ndarray, jnp.ndarray], n_prefix: int, n_tokens: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extend patch-only cos/sin to full token length: identity rows for the
    CLS/register prefix (and zero rows for any model-level padding), so RoPE
    becomes one elementwise expression with no scatter."""
    cos, sin = rope
    hd = cos.shape[-1]
    cos_full = jnp.concatenate(
        [jnp.ones((n_prefix, hd), cos.dtype), cos], axis=0
    )
    sin_full = jnp.concatenate(
        [jnp.zeros((n_prefix, hd), sin.dtype), sin], axis=0
    )
    extra = n_tokens - cos_full.shape[0]
    if extra > 0:
        cos_full = jnp.pad(cos_full, ((0, extra), (0, 0)))
        sin_full = jnp.pad(sin_full, ((0, extra), (0, 0)))
    return cos_full, sin_full


def _attn_param_table(cfg: ViTConfig, prefix: str):
    """(qkv names, qkv bias flags, out name, out bias) for the variant —
    the single copy both the full and the CLS-only attention paths read, so
    a variant/bias change can never desynchronize them."""
    if cfg.variant == "dinov2":
        return (
            [f"{prefix}.attention.attention.{p}" for p in ("query", "key", "value")],
            [True, True, True],
            f"{prefix}.attention.output.dense",
            True,
        )
    return (
        [f"{prefix}.attention.{p}" for p in ("q_proj", "k_proj", "v_proj")],
        [cfg.query_bias, cfg.key_bias, cfg.value_bias],
        f"{prefix}.attention.o_proj",
        cfg.proj_bias,
    )


def _attention(
    params: Params,
    prefix: str,
    x: jnp.ndarray,
    cfg: ViTConfig,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_valid: Optional[int] = None,
) -> jnp.ndarray:
    B, N, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    names, biases, out_name, out_bias = _attn_param_table(cfg, prefix)

    def proj_heads(name: str, has_bias: bool, pack: int = 1) -> jnp.ndarray:
        # Project straight into (B, H, N, d) — or, with pack=2, into the
        # head-PAIR packed (B, H/2, N, 2d) layout the Pallas kernel prefers
        # (128-wide minor dim -> full-lane HBM DMA; see
        # flash_attention._packed_attn_kernel). Either way the layout change
        # folds into the matmul output instead of a separate HBM transpose.
        # The head count is read off the weight, not the config — under
        # tensor parallelism each shard holds (H/tp)*hd output rows and
        # computes only its own heads.
        w = params[f"{name}.weight"].astype(x.dtype)
        h_local = w.shape[0] // hd
        y = jnp.einsum(
            "bnD,hdD->bhnd", x, w.reshape(h_local // pack, pack * hd, D)
        )
        if has_bias:
            y = y + params[f"{name}.bias"].astype(x.dtype).reshape(
                h_local // pack, pack * hd
            )[None, :, None, :]
        return y

    h_local = params[f"{names[0]}.weight"].shape[0] // hd
    scale = hd ** -0.5
    from cbas_tpu.ops import flash_attention as fa

    fused = use_fused_attention()
    # Head pairs share a 128-lane minor dim so kernel DMA runs full-width;
    # needs an even local head count (odd TP shards fall back to unpacked).
    packed = fused and hd == 64 and h_local % 2 == 0

    if packed and fa.use_fat_attention():
        # FLAT row-major layout (r4): plain 2-D projection matmuls feed the
        # kernel directly — (B*N, D_local) row-major IS its operand layout,
        # so XLA inserts no copies around the custom call (the packed einsum
        # layout cost one full q/k/v copy per layer, HLO-verified). Falls
        # through to the packed path when the geometry doesn't fit
        # (fused_attention_fat returns None).
        cos_full = sin_full = None
        if rope is not None:
            cos_full, sin_full = _full_rope_tables(rope, cfg.num_prefix_tokens, N)

        def proj_flat(name: str, has_bias: bool) -> jnp.ndarray:
            y = x @ params[f"{name}.weight"].T.astype(x.dtype)
            if has_bias:
                y = y + params[f"{name}.bias"].astype(x.dtype)
            return y

        q = proj_flat(names[0], biases[0])
        k = proj_flat(names[1], biases[1])
        v = proj_flat(names[2], biases[2])
        ctx = fa.fused_attention_fat(
            q, k, v, scale, n_valid=n_valid,
            rope_cos=cos_full, rope_sin=sin_full,
        )
        if ctx is not None:
            wo = params[f"{out_name}.weight"].astype(x.dtype)
            h_out = wo.shape[1] // hd
            out = ctx @ wo.T
            out = _maybe_psum(out, h_out < H)
            if out_bias:
                out = out + params[f"{out_name}.bias"].astype(x.dtype)
            return out

    if fused:
        cos_full = sin_full = None
        if rope is not None:
            cos_full, sin_full = _full_rope_tables(rope, cfg.num_prefix_tokens, N)
        # RoPE happens inside the kernel: roped q/k never round-trip to HBM.
        if packed:
            q = proj_heads(names[0], biases[0], pack=2)
            k = proj_heads(names[1], biases[1], pack=2)
            v = proj_heads(names[2], biases[2], pack=2)
            ctx = fa.fused_attention_packed(
                q, k, v, scale, n_valid=n_valid,
                rope_cos=cos_full, rope_sin=sin_full,
            )
            # (B, G, N, 2d) -> out projection consumes it pair-packed below
        else:
            q = proj_heads(names[0], biases[0])
            k = proj_heads(names[1], biases[1])
            v = proj_heads(names[2], biases[2])
            ctx = fa.fused_attention(
                q, k, v, scale, n_valid=n_valid,
                rope_cos=cos_full, rope_sin=sin_full,
            )
    else:
        q = proj_heads(names[0], biases[0])
        k = proj_heads(names[1], biases[1])
        v = proj_heads(names[2], biases[2])
        if rope is not None:
            cos, sin = _full_rope_tables(rope, cfg.num_prefix_tokens, N)
            cos = cos.astype(q.dtype)[None, None]
            sin = sin.astype(q.dtype)[None, None]
            q = q * cos + _rot_half(q) * sin
            k = k * cos + _rot_half(k) * sin
        ctx = fa.reference_attention(q, k, v, scale)

    # Fold the inverse layout change into the output projection. Under TP the
    # contraction runs over local heads only: psum the partial before the
    # (replicated) bias so it is added exactly once. The pair-packed ctx
    # contracts against the identically-regrouped weight — no un-pack
    # transpose ever materializes.
    wo = params[f"{out_name}.weight"].astype(x.dtype)
    h_out = wo.shape[1] // hd
    if packed:
        out = jnp.einsum(
            "bgnp,Dgp->bnD", ctx, wo.reshape(D, h_out // 2, 2 * hd)
        )
    else:
        out = jnp.einsum("bhnd,Dhd->bnD", ctx, wo.reshape(D, h_out, hd))
    out = _maybe_psum(out, h_out < H)
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(x.dtype)
    return out


def _attention_cls(
    params: Params,
    prefix: str,
    h: jnp.ndarray,
    cfg: ViTConfig,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Attention output for the CLS row only: q is a single query row, K/V
    span every token. Used by the final block when the caller consumes just
    the CLS embedding — the other N-1 query rows of the last layer are dead
    work (~7% of ViT-B FLOPs at 480p). Plain XLA ops: a (B, H, 1, N) score
    tensor is far too small for the Pallas kernel to matter."""
    B, N, D = h.shape
    H, hd = cfg.num_heads, cfg.head_dim
    names, biases, out_name, out_bias = _attn_param_table(cfg, prefix)

    def proj(name, has_bias, x):
        w = params[f"{name}.weight"].astype(x.dtype)
        h_local = w.shape[0] // hd
        y = jnp.einsum("bnD,hdD->bhnd", x, w.reshape(h_local, hd, D))
        if has_bias:
            y = y + params[f"{name}.bias"].astype(x.dtype).reshape(h_local, hd)[None, :, None, :]
        return y

    q = proj(names[0], biases[0], h[:, :1])  # CLS row; its RoPE is identity
    k = proj(names[1], biases[1], h)
    v = proj(names[2], biases[2], h)
    if rope is not None:
        cos, sin = _full_rope_tables(rope, cfg.num_prefix_tokens, N)
        cos = cos.astype(k.dtype)[None, None]
        sin = sin.astype(k.dtype)[None, None]
        k = k * cos + _rot_half(k) * sin

    s = jnp.einsum("bhqd,bhnd->bhqn", q, k).astype(jnp.float32) * (hd ** -0.5)
    if n_valid is not None and n_valid < N:
        col = jnp.arange(N)[None, None, None, :]
        s = jnp.where(col < n_valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqn,bhnd->bhqd", p, v)

    wo = params[f"{out_name}.weight"].astype(h.dtype)
    h_out = wo.shape[1] // hd
    out = jnp.einsum("bhqd,Dhd->bqD", ctx, wo.reshape(D, h_out, hd))
    out = _maybe_psum(out, h_out < H)
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(h.dtype)
    return out


def _block_cls(
    params: Params,
    prefix: str,
    x: jnp.ndarray,
    cfg: ViTConfig,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    n_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Final block specialized to the CLS row: attention keys/values span all
    tokens, but q/out-proj/MLP/residual run on token 0 alone. Returns
    (B, 1, D)."""
    h = _ln(params, f"{prefix}.norm1", x, cfg.layer_norm_eps)
    h = _attention_cls(params, prefix, h, cfg, rope, n_valid=n_valid)
    x0 = x[:, :1] + h * params[f"{prefix}.layer_scale1.lambda1"].astype(x.dtype)
    h = _ln(params, f"{prefix}.norm2", x0, cfg.layer_norm_eps)
    h = _mlp(params, prefix, h, cfg)
    return x0 + h * params[f"{prefix}.layer_scale2.lambda1"].astype(x.dtype)


def _dense_reduce(
    params: Params, name: str, x: jnp.ndarray, bias: bool, full_in: int
) -> jnp.ndarray:
    """Down-projection whose input dim may be TP-sharded: matmul over the
    local columns, psum the partial iff the weight is a shard of ``full_in``,
    then add the replicated bias exactly once."""
    w = params[f"{name}.weight"]
    y = x @ w.T.astype(x.dtype)
    y = _maybe_psum(y, w.shape[1] < full_in)
    if bias:
        y = y + params[f"{name}.bias"].astype(x.dtype)
    return y


def _mlp(params: Params, prefix: str, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    inter = cfg.intermediate_size
    if cfg.variant == "dinov2":
        if cfg.use_swiglu_ffn:
            # SwiGLU packs [x1; x2] along the out dim of weights_in, which an
            # out-dim shard would split incorrectly — TP rules keep these
            # replicated (parallel/tp.py), so no psum path here.
            h = _dense(params, f"{prefix}.mlp.weights_in", x)
            x1, x2 = jnp.split(h, 2, axis=-1)
            return _dense(params, f"{prefix}.mlp.weights_out", jax.nn.silu(x1) * x2)
        h = jax.nn.gelu(_dense(params, f"{prefix}.mlp.fc1", x), approximate=cfg.gelu_approximate)
        return _dense_reduce(params, f"{prefix}.mlp.fc2", h, True, inter)
    if cfg.use_gated_mlp:
        g = jax.nn.gelu(_dense(params, f"{prefix}.mlp.gate_proj", x, cfg.mlp_bias), approximate=cfg.gelu_approximate)
        u = _dense(params, f"{prefix}.mlp.up_proj", x, cfg.mlp_bias)
        return _dense_reduce(params, f"{prefix}.mlp.down_proj", g * u, cfg.mlp_bias, inter)
    h = jax.nn.gelu(_dense(params, f"{prefix}.mlp.up_proj", x, cfg.mlp_bias), approximate=cfg.gelu_approximate)
    return _dense_reduce(params, f"{prefix}.mlp.down_proj", h, cfg.mlp_bias, inter)


def _block(
    params: Params,
    prefix: str,
    x: jnp.ndarray,
    cfg: ViTConfig,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    n_valid: Optional[int] = None,
) -> jnp.ndarray:
    h = _ln(params, f"{prefix}.norm1", x, cfg.layer_norm_eps)
    h = _attention(params, prefix, h, cfg, rope, n_valid=n_valid)
    x = x + h * params[f"{prefix}.layer_scale1.lambda1"].astype(x.dtype)
    h = _ln(params, f"{prefix}.norm2", x, cfg.layer_norm_eps)
    h = _mlp(params, prefix, h, cfg)
    return x + h * params[f"{prefix}.layer_scale2.lambda1"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Position encodings
# ---------------------------------------------------------------------------

def rope_tables(cfg: ViTConfig, grid_h: int, grid_w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute DINOv3 RoPE cos/sin for a (grid_h, grid_w) patch grid.

    Matches DINOv3ViTRopePositionEmbedding: patch-center coords normalized to
    [-1, 1], angles = 2*pi*coords x inv_freq, halves tiled.
    """
    hd = cfg.head_dim
    inv_freq = 1.0 / cfg.rope_theta ** np.arange(0, 1, 4 / hd, dtype=np.float32)
    ch = (np.arange(0.5, grid_h, dtype=np.float32) / grid_h) * 2.0 - 1.0
    cw = (np.arange(0.5, grid_w, dtype=np.float32) / grid_w) * 2.0 - 1.0
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1).reshape(-1, 2)
    angles = 2.0 * math.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)
    angles = np.tile(angles, 2)
    return np.cos(angles), np.sin(angles)


def resample_pos_embed(
    pos: np.ndarray, grid_h: int, grid_w: int
) -> np.ndarray:
    """Resize DINOv2 patch position embeddings to a new grid.

    ``pos`` is the checkpoint's ``(1, 1 + S*S, D)`` table (CLS first). Uses
    torch's antialiased bicubic when available (bit-matching the HF
    ``interpolate_pos_encoding``), falling back to jax.image otherwise.
    Returns ``(1, 1 + grid_h*grid_w, D)`` float32.
    """
    pos = np.asarray(pos, np.float32)
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    s = int(round(patch_pos.shape[1] ** 0.5))
    if (s, s) == (grid_h, grid_w):
        return pos
    grid = patch_pos.reshape(1, s, s, -1)
    try:
        import torch

        t = torch.from_numpy(grid.copy()).permute(0, 3, 1, 2)
        t = torch.nn.functional.interpolate(
            t, size=(grid_h, grid_w), mode="bicubic", align_corners=False, antialias=True
        )
        out = t.permute(0, 2, 3, 1).numpy()
    except ImportError:
        out = np.asarray(
            jax.image.resize(grid, (1, grid_h, grid_w, grid.shape[-1]), "bicubic")
        )
    return np.concatenate([cls_pos, out.reshape(1, grid_h * grid_w, -1)], axis=1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _assemble_embeddings(
    params: Params,
    tokens: jnp.ndarray,
    cfg: ViTConfig,
    pos_embed: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Projected patch tokens -> full embedding sequence (CLS [+ registers]
    [+ pos-embed]), shared by the forward pass and the attention-map probe so
    the prefix-token layout lives in exactly one place."""
    B = tokens.shape[0]
    dtype = tokens.dtype
    cls_tok = jnp.broadcast_to(
        params["embeddings.cls_token"].astype(dtype), (B, 1, cfg.hidden_size)
    )
    if cfg.variant == "dinov2":
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        if pos_embed is None:
            pos_embed = params["embeddings.position_embeddings"]
        x = x + pos_embed.astype(dtype)
        if cfg.num_register_tokens:
            regs = jnp.broadcast_to(
                params["embeddings.register_tokens"].astype(dtype),
                (B, cfg.num_register_tokens, cfg.hidden_size),
            )
            x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)
        return x
    if not cfg.num_register_tokens:
        # DINOv3ViTConfig's class default is 0 registers; a register-free
        # checkpoint must not require the params key.
        return jnp.concatenate([cls_tok, tokens], axis=1)
    regs = jnp.broadcast_to(
        params["embeddings.register_tokens"].astype(dtype),
        (B, cfg.num_register_tokens, cfg.hidden_size),
    )
    return jnp.concatenate([cls_tok, regs, tokens], axis=1)


def vit_forward_from_tokens(
    params: Params,
    tokens: jnp.ndarray,
    cfg: ViTConfig,
    pos_embed: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    cls_only: bool = False,
) -> jnp.ndarray:
    """Run the transformer over already-projected patch tokens (B, N, D).

    Lets callers supply a custom patch-embedding path (e.g. the single-plane
    folded kernel in models/encoder.py) while sharing the block stack.

    ``cls_only=True`` returns just (B, 1, D) — the CLS row — and specializes
    the FINAL block to it: that block's q-projection, attention, out-proj,
    MLP, and the final LayerNorm run on one token instead of N (K/V still
    span all tokens, so the math is identical). Saves ~7% of total FLOPs at
    480p; the production encoder (models/encoder.py) consumes only the CLS
    embedding, so it always sets this.
    """
    x = _assemble_embeddings(params, tokens, cfg, pos_embed)
    if cfg.variant == "dinov2":
        layer_prefix, final_ln, block_rope = "encoder.layer", "layernorm", None
    else:
        layer_prefix, final_ln = "layer", "norm"
        if rope is None:
            raise ValueError("dinov3 requires rope tables (see rope_tables())")
        block_rope = rope

    # Model-level token padding: pad once to the SUBLANE granule (16 rows
    # bf16 / 8 fp32) so every dense matmul runs at (nearly) the exact token
    # count; padded rows are masked as attention keys and sliced away at the
    # end. The attention kernel needs no 128-multiple here — its K/V blocks
    # are Pallas edge blocks over the exact arrays with in-kernel masking,
    # so the score tile's lane padding never materializes in HBM (261 -> 272
    # instead of 384 removes ~30% of the 256x256 attention work; 1205 ->
    # 1216 instead of 1280 trims every matmul ~5% at 480p).
    n_valid = x.shape[1]
    if use_fused_attention():
        granule = 16 if x.dtype.itemsize == 2 else 8
        n_pad = -(-n_valid // granule) * granule
        if n_pad != n_valid:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n_valid), (0, 0)))

    last = cfg.num_layers - 1
    for i in range(last if cls_only else cfg.num_layers):
        x = _block(params, f"{layer_prefix}.{i}", x, cfg, block_rope, n_valid=n_valid)
    if cls_only:
        x = _block_cls(params, f"{layer_prefix}.{last}", x, cfg, block_rope, n_valid=n_valid)
        return _ln(params, final_ln, x, cfg.layer_norm_eps)

    x = _ln(params, final_ln, x, cfg.layer_norm_eps)
    return x[:, :n_valid]


def vit_forward(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: ViTConfig,
    pos_embed: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Encode images: (B, 3, H, W) -> last hidden state (B, N_tokens, D).

    ``pos_embed`` (dinov2) must already match the input grid — pass the
    checkpoint table for native geometry or :func:`resample_pos_embed` output
    otherwise. ``rope`` (dinov3) comes from :func:`rope_tables`. Token 0 is CLS.
    """
    dtype = pixel_values.dtype
    if cfg.variant == "dinov2":
        w = params["embeddings.patch_embeddings.projection.weight"]
        bias = params["embeddings.patch_embeddings.projection.bias"]
    else:
        w = params["embeddings.patch_embeddings.weight"]
        bias = params["embeddings.patch_embeddings.bias"]
    proj = w.reshape(w.shape[0], -1).astype(dtype)  # (D, C*p*p)
    tokens = patchify(pixel_values, cfg.patch_size) @ proj.T + bias.astype(dtype)

    if cfg.variant == "dinov3" and rope is None:
        grid = (
            pixel_values.shape[2] // cfg.patch_size,
            pixel_values.shape[3] // cfg.patch_size,
        )
        cos, sin = rope_tables(cfg, *grid)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
    return vit_forward_from_tokens(params, tokens, cfg, pos_embed, rope)


def cls_attention_map(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: ViTConfig,
    pos_embed: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Head-averaged last-layer attention of the CLS token over patch tokens.

    Returns (B, grid_h, grid_w) — the encoder-sanity heatmap used to compare
    backbones (the reference's compare_encoders.py:40-72 equivalent).
    """
    B, _, H, W = pixel_values.shape
    grid = (H // cfg.patch_size, W // cfg.patch_size)

    if cfg.variant == "dinov3" and rope is None:
        cos, sin = rope_tables(cfg, *grid)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

    # Run everything but the last block, then open up that block's attention.
    dtype = pixel_values.dtype
    if cfg.variant == "dinov2":
        w = params["embeddings.patch_embeddings.projection.weight"]
        bias = params["embeddings.patch_embeddings.projection.bias"]
        layer_prefix = "encoder.layer"
    else:
        w = params["embeddings.patch_embeddings.weight"]
        bias = params["embeddings.patch_embeddings.bias"]
        layer_prefix = "layer"
    proj = w.reshape(w.shape[0], -1).astype(dtype)
    tokens = patchify(pixel_values, cfg.patch_size) @ proj.T + bias.astype(dtype)

    pe = pos_embed
    if cfg.variant == "dinov2" and pe is None:
        pe = jnp.asarray(resample_pos_embed(
            np.asarray(params["embeddings.position_embeddings"], np.float32), *grid
        ))
    x = _assemble_embeddings(params, tokens, cfg, pe)

    for i in range(cfg.num_layers - 1):
        x = _block(params, f"{layer_prefix}.{i}", x, cfg, rope)

    prefix = f"{layer_prefix}.{cfg.num_layers - 1}"
    h = _ln(params, f"{prefix}.norm1", x, cfg.layer_norm_eps)
    Hh, hd = cfg.num_heads, cfg.head_dim
    N = h.shape[1]
    if cfg.variant == "dinov2":
        q = _dense(params, f"{prefix}.attention.attention.query", h)
        k = _dense(params, f"{prefix}.attention.attention.key", h)
    else:
        q = _dense(params, f"{prefix}.attention.q_proj", h, cfg.query_bias)
        k = _dense(params, f"{prefix}.attention.k_proj", h, cfg.key_bias)
    q = q.reshape(B, N, Hh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, Hh, hd).transpose(0, 2, 1, 3)
    if cfg.variant == "dinov3" and rope is not None:
        # Same identity-prefix table + rotate-half as the real forward
        # (_full_rope_tables/_rot_half) — a private copy here would let a
        # RoPE fix desynchronize this probe from the production path.
        cos, sin = _full_rope_tables(rope, cfg.num_prefix_tokens, N)
        cos = cos.astype(q.dtype)
        sin = sin.astype(q.dtype)
        q = q * cos + _rot_half(q) * sin
        k = k * cos + _rot_half(k) * sin

    scores = jnp.einsum("bhd,bhkd->bhk", q[:, :, 0, :], k) * (hd ** -0.5)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    patch_attn = weights[:, :, cfg.num_prefix_tokens :].mean(axis=1)  # head-avg
    return patch_attn.reshape(B, *grid)


def cls_embeddings(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: ViTConfig,
    pos_embed: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, D) CLS tokens (the pipeline's frame embedding)."""
    return vit_forward(params, pixel_values, cfg, pos_embed, rope)[:, 0, :]


# ---------------------------------------------------------------------------
# Initialization (for offline/self-trained encoders and tests)
# ---------------------------------------------------------------------------

def init_vit_params(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """HF-style init: trunc-normal(0.02) weights, zero biases/layerscale=1."""
    params: Params = {}
    init = jax.nn.initializers.truncated_normal(0.02)

    def dense(name: str, fan_in: int, fan_out: int, bias: bool = True) -> None:
        nonlocal key
        key, sub = jax.random.split(key)
        params[f"{name}.weight"] = init(sub, (fan_out, fan_in), dtype)
        if bias:
            params[f"{name}.bias"] = jnp.zeros((fan_out,), dtype)

    def ln(name: str) -> None:
        params[f"{name}.weight"] = jnp.ones((cfg.hidden_size,), dtype)
        params[f"{name}.bias"] = jnp.zeros((cfg.hidden_size,), dtype)

    D, p = cfg.hidden_size, cfg.patch_size
    key, k1, k2 = jax.random.split(key, 3)
    params["embeddings.cls_token"] = init(k1, (1, 1, D), dtype)
    if cfg.num_register_tokens:
        params["embeddings.register_tokens"] = jnp.zeros(
            (1, cfg.num_register_tokens, D), dtype
        )
    if cfg.variant == "dinov2":
        dense("embeddings.patch_embeddings.projection", 3 * p * p, D)
        params["embeddings.patch_embeddings.projection.weight"] = params[
            "embeddings.patch_embeddings.projection.weight"
        ].reshape(D, 3, p, p)
        n_pos = (cfg.image_size // p) ** 2 + 1
        params["embeddings.position_embeddings"] = init(k2, (1, n_pos, D), dtype)
    else:
        dense("embeddings.patch_embeddings", 3 * p * p, D)
        params["embeddings.patch_embeddings.weight"] = params[
            "embeddings.patch_embeddings.weight"
        ].reshape(D, 3, p, p)

    for i in range(cfg.num_layers):
        pref = f"encoder.layer.{i}" if cfg.variant == "dinov2" else f"layer.{i}"
        ln(f"{pref}.norm1")
        ln(f"{pref}.norm2")
        params[f"{pref}.layer_scale1.lambda1"] = jnp.ones((D,), dtype)
        params[f"{pref}.layer_scale2.lambda1"] = jnp.ones((D,), dtype)
        if cfg.variant == "dinov2":
            dense(f"{pref}.attention.attention.query", D, D)
            dense(f"{pref}.attention.attention.key", D, D)
            dense(f"{pref}.attention.attention.value", D, D)
            dense(f"{pref}.attention.output.dense", D, D)
            if cfg.use_swiglu_ffn:
                dense(f"{pref}.mlp.weights_in", D, 2 * cfg.intermediate_size)
                dense(f"{pref}.mlp.weights_out", cfg.intermediate_size, D)
            else:
                dense(f"{pref}.mlp.fc1", D, cfg.intermediate_size)
                dense(f"{pref}.mlp.fc2", cfg.intermediate_size, D)
        else:
            dense(f"{pref}.attention.q_proj", D, D, cfg.query_bias)
            dense(f"{pref}.attention.k_proj", D, D, cfg.key_bias)
            dense(f"{pref}.attention.v_proj", D, D, cfg.value_bias)
            dense(f"{pref}.attention.o_proj", D, D, cfg.proj_bias)
            if cfg.use_gated_mlp:
                dense(f"{pref}.mlp.gate_proj", D, cfg.intermediate_size, cfg.mlp_bias)
            dense(f"{pref}.mlp.up_proj", D, cfg.intermediate_size, cfg.mlp_bias)
            dense(f"{pref}.mlp.down_proj", cfg.intermediate_size, D, cfg.mlp_bias)

    ln("layernorm" if cfg.variant == "dinov2" else "norm")
    return params

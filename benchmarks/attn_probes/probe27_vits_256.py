"""Probe 27: ViT-S 256x256 campaign (r4 verdict next #2).

ViT-S is BASELINE config 1's backbone and the least-optimized geometry
(7045 fps = 46% MFU at 256x256 vs 74-80% everywhere else); it inherited
every tuning pick from the ViT-B probes. Two parts:

1. model-level interleaved A/B of the knobs the B-campaign fixed: fat-vs-
   packed-vs-XLA attention, fat group size (CBAS_ATTN_FAT_GB), batch
   (896 inherited / 1344 / 1792).
2. stage isolation (probe9/10 methodology, patch live at trace time):
   full model, minus-attention-kernel, minus-LN, minus-GELU, bare-matmul
   floor — where do the non-matmul milliseconds actually sit at d=384?

Run on the TPU host: python benchmarks/attn_probes/probe27_vits_256.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from cbas_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import cbas_tpu.models.vit as vit
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.ops import flash_attention as fa

H = W = 256
ROUNDS = 4
PRESET = "dinov3-vits16"


def build(name, batch, env=None, patch=None):
    """Build + compile a ViT-S encoder program under env/patches (patches
    must be live at trace time — jit is lazy, probe9's lesson)."""
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    undo = patch() if patch else None
    try:
        enc = FrameEncoder(
            name, cfg=vit.PRESETS[PRESET], random_init=True,
            compute_dtype=jnp.bfloat16,
        )
        prog, _ = enc._program(batch, H, W)
        planes = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (batch, H, W), np.uint8)
        )
        jax.device_get(prog(enc._device_params, planes)[0, :2])  # trace+compile NOW
        return enc, prog, planes
    finally:
        if undo:
            undo()
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def fps(enc, prog, planes, iters=8):
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = prog(enc._device_params, planes)
    jax.device_get(out[0, :2])
    return planes.shape[0] * iters / (time.perf_counter() - t0)


def patch_no_kernel():
    orig_fat, orig_packed = fa.fused_attention_fat, fa.fused_attention_packed

    def fake_fat(q, k, v, scale, **kw):
        return q + v * jnp.asarray(scale, q.dtype)

    def fake_packed(q, k, v, scale, **kw):
        return q + v * jnp.asarray(scale, q.dtype)

    fa.fused_attention_fat = fake_fat
    fa.fused_attention_packed = fake_packed

    def undo():
        fa.fused_attention_fat, fa.fused_attention_packed = orig_fat, orig_packed
    return undo


def patch_no_ln():
    orig = vit._ln

    def fake_ln(params, name, x, eps):
        return x * params[f"{name}.weight"].astype(x.dtype)

    vit._ln = fake_ln

    def undo():
        vit._ln = orig
    return undo


def patch_no_gelu():
    orig = jax.nn.gelu
    jax.nn.gelu = lambda x, approximate=True: x * 0.5

    def undo():
        jax.nn.gelu = orig
    return undo


def patch_floor():
    u1, u2, u3 = patch_no_kernel(), patch_no_ln(), patch_no_gelu()

    def undo():
        u1(); u2(); u3()
    return undo


CASES = [
    # (label, batch, env, patch)
    ("fat,b896 (prod)", 896, None, None),
    ("fat,b896,gb8", 896, {"CBAS_ATTN_FAT_GB": "8"}, None),
    ("fat,b1344", 1344, None, None),
    ("fat,b1792", 1792, None, None),
    ("packed,b896", 896, {"CBAS_ATTN_FAT": "0"}, None),
    ("xla-attn,b896", 896, {"CBAS_TPU_FUSED_ATTENTION": "0"}, None),
    ("no-kernel,b896", 896, None, patch_no_kernel),
    ("no-LN,b896", 896, None, patch_no_ln),
    ("no-GELU,b896", 896, None, patch_no_gelu),
    ("bare-matmul,b896", 896, None, patch_floor),
]

progs = {}
for label, batch, env, patch in CASES:
    progs[label] = build(label.replace(",", "_"), batch, env, patch)
    print(f"compiled: {label}")

results = {label: [] for label in progs}
for rnd in range(ROUNDS):
    line = []
    for label, (enc, prog, planes) in progs.items():
        f = fps(enc, prog, planes)
        results[label].append(f)
        line.append(f"{label}={f:.0f}")
    print(f"round {rnd}: " + "  ".join(line))

print(f"\n=== ViT-S 256x256 model fps (medians/{ROUNDS}) ===")
full = None
for label, vals in results.items():
    s = sorted(vals)
    m = s[len(s) // 2]
    if label.startswith("fat,b896 (prod)"):
        full = m
    extra = ""
    if full and label.startswith(("no-", "bare")):
        batch = progs[label][2].shape[0]
        share = (1.0 / full - 1.0 / m) * batch * 1e3 / (batch / 896)
        extra = f"  (stage share ~{(batch / full - batch / m) * 1e3:.1f} ms/batch)"
    print(f"{label:18s}: {m:7.0f} fps{extra}")

"""LayerNorm share at ViT-B 256x256 after the r4 kernel work, and variants:

  prod     - current _ln (fp32 two-pass mean/var)
  noln     - LN -> identity (timing-only, wrong math): the share
  exsq     - var = E[x^2] - mean^2 (single-pass reductions, if XLA cares)
  pallas   - a fused Pallas row-LN kernel: one bf16 read + one bf16 write
             per LN (breaks XLA fusion with neighbors — measure, not guess)

Run: python benchmarks/attn_probes/probe25_ln_256.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cbas_tpu.models import vit
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.vit import PRESETS

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
H = W = 256
N_ITERS = 3
ROUNDS = 7

enc = FrameEncoder(
    "facebook/dinov3-vitb16", cfg=PRESETS["dinov3-vitb16"],
    random_init=True, compute_dtype=jnp.bfloat16,
)
rng = np.random.default_rng(0)
plane = jax.device_put(jnp.asarray(rng.integers(0, 256, (BATCH, H, W), np.uint8)))
_orig_ln = vit._ln


def ln_exsq(params, name, x, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    ex2 = (x32 * x32).mean(-1, keepdims=True)
    var = ex2 - mean * mean
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params[f"{name}.weight"].astype(jnp.float32)
            + params[f"{name}.bias"].astype(jnp.float32)).astype(x.dtype)


def make_pallas_ln():
    def kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
        x = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
        o_ref[...] = (y * w_ref[...].astype(jnp.float32)
                      + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    def ln(params, name, x, eps):
        B, N, D = x.shape
        xf = x.reshape(B * N, D)
        rows = B * N
        br = 4352  # 16 * 272
        while rows % br:
            br //= 2
        f = pl.pallas_call(
            functools.partial(kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((rows, D), x.dtype),
            grid=(rows // br, 1),
            in_specs=[
                pl.BlockSpec((br, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), lambda i, j: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((D,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((br, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )
        return f(xf, params[f"{name}.weight"], params[f"{name}.bias"]).reshape(B, N, D)

    return ln


def build(name):
    if name == "noln":
        vit._ln = lambda params, nm, x, eps: x
    elif name == "exsq":
        vit._ln = ln_exsq
    elif name == "pallas":
        vit._ln = make_pallas_ln()
    try:
        prog = enc._build(BATCH, H, W)
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        vit._ln = _orig_ln
        enc._geometry_cache.clear()


progs = {n: build(n) for n in ("prod", "noln", "exsq", "pallas")}

a = np.asarray(jax.device_get(progs["prod"](enc._device_params, plane))).astype(np.float32)
for nm in ("exsq", "pallas"):
    b = np.asarray(jax.device_get(progs[nm](enc._device_params, plane))).astype(np.float32)
    print(f"max|diff| prod vs {nm} = {np.max(np.abs(a - b)):.3e}")


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn()
    jax.device_get(out[0, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in progs}
for rnd in range(ROUNDS):
    for name in progs:
        results[name].append(timed(lambda n=name: progs[n](enc._device_params, plane)))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.1f}" for n in results))

print(f"\n=== batch {BATCH}, {H}x{W}, medians/{ROUNDS} ===")
for name in progs:
    s = sorted(results[name])
    m = s[len(s) // 2]
    print(f"{name:7s}: {m:7.2f} ms  ({BATCH / m * 1e3:7.1f} fps)")

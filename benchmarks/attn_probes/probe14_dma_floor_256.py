"""DMA-floor sweep at the 256x256 geometry: probe13 measured the pure
q/k/v/o block DMA at 6.05 ms/layer-batch = 107 GB/s — 7x below what the
same kernel's DMA achieves at 480p (~10 MB/step there vs 2.2 MB/step
here). Sweep pairs-per-program (block height) to find where the DMA rate
recovers, then re-measure the full production kernel at the best setting.

Run: python benchmarks/attn_probes/probe14_dma_floor_256.py
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

from cbas_tpu.ops import flash_attention as fa

B, G, N, d = 384, 6, 272, 64
NV = 261
dd = 2 * d
ROUNDS = 5
N_ITERS = 5

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5

BG = B * G
total_bytes = 4 * BG * N * dd * 2  # q,k,v,o


def dma_kernel(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...] + k_ref[...] * 0 + v_ref[...] * 0


def make_dma(gp):
    specs = dict(
        grid=(BG // gp, 1),
        in_specs=[pl.BlockSpec((gp, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((gp, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = pl.pallas_call(dma_kernel, out_shape=jax.ShapeDtypeStruct((BG, N, dd), q.dtype), **specs)
    fn = jax.jit(lambda qq, kk, vv: f(qq.reshape(BG, N, dd), kk.reshape(BG, N, dd),
                                      vv.reshape(BG, N, dd)))
    jax.device_get(fn(q, k, v)[0, :2, :2])
    return lambda: fn(q, k, v)


def make_dma_flat2d():
    # the same bytes as ONE flat (BG*N, dd) array, 2D blocks of 64k rows:
    # is the 3D block structure itself the cost?
    rows = BG * N
    br = 13056  # 48 * 272 (3.3 MB/block/tensor; 52224 blew the VMEM budget)
    f = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, dd), q.dtype),
        grid=(rows // br, 1),
        in_specs=[pl.BlockSpec((br, dd), lambda b, i: (b, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((br, dd), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    fn = jax.jit(lambda qq, kk, vv: f(qq.reshape(rows, dd), kk.reshape(rows, dd),
                                      vv.reshape(rows, dd)))
    jax.device_get(fn(q, k, v)[0, :2])
    return lambda: fn(q, k, v)


progs = {}
for gp in (4, 8, 16, 32, 48, 96):
    progs[f"dma,gp{gp}"] = make_dma(gp)
progs["dma,flat2d"] = make_dma_flat2d()
progs["prod(pvt)"] = (lambda fn: (jax.device_get(fn(q, k, v)[0, 0, :2, :2]), fn)[1])(
    jax.jit(functools.partial(fa.fused_attention_packed, scale=scale, n_valid=NV,
                              rope_cos=cos, rope_sin=sin)))
calls = dict(progs)
calls["prod(pvt)"] = lambda fn=progs["prod(pvt)"]: fn(q, k, v)


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn()
    jax.device_get(out[0, 0, :2, :2] if out.ndim == 4 else out[0, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in calls}
for rnd in range(ROUNDS):
    for name, fn in calls.items():
        results[name].append(timed(fn))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.2f}" for n in results))

print(f"\n=== DMA floor sweep, {total_bytes / 1e6:.0f} MB/layer-batch, medians/{ROUNDS} ===")
for name in calls:
    s = sorted(results[name])
    m = s[len(s) // 2]
    print(f"{name:12s}: {m:6.2f} ms  ({total_bytes / 1e9 / (m / 1e3):5.0f} GB/s)")

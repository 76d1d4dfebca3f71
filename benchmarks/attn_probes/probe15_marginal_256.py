"""Marginal (dispatch-free) kernel cost at the 256x256 geometry.

probe14's DMA floor (~6 ms, ~105 GB/s at every block size) smells like
fixed per-dispatch overhead through the sandbox relay, not real DMA time.
Chain the kernel K times inside ONE jit program (data-dependent, so XLA
can't elide) and report the marginal cost (tK - t1)/(K-1):

  dma    - o = q + 0*k + 0*v passthrough
  prod   - fused_attention_packed (production path)
  xlaadd - plain XLA elementwise over the same bytes (non-Pallas baseline)

Run: python benchmarks/attn_probes/probe15_marginal_256.py
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
N_ITERS = 3
K = 5

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5
BG = B * G
total_bytes = 4 * BG * N * dd * 2


def dma_kernel(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...] + k_ref[...] * 0 + v_ref[...] * 0


gp = 8
f_dma = pl.pallas_call(
    dma_kernel,
    out_shape=jax.ShapeDtypeStruct((BG, N, dd), q.dtype),
    grid=(BG // gp, 1),
    in_specs=[pl.BlockSpec((gp, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec((gp, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
)


def chain(fn3, times):
    def run(qq, kk, vv):
        x = qq
        for _ in range(times):
            x = fn3(x, kk, vv)
        return x
    j = jax.jit(run)
    jax.device_get(j(q, k, v).ravel()[:2])
    return j


def prod3(qq, kk, vv):
    return fa.fused_attention_packed(qq, kk, vv, scale, n_valid=NV,
                                     rope_cos=cos, rope_sin=sin)


def dma3(qq, kk, vv):
    return f_dma(qq.reshape(BG, N, dd), kk.reshape(BG, N, dd),
                 vv.reshape(BG, N, dd)).reshape(B, G, N, dd)


def xlaadd3(qq, kk, vv):
    return qq + kk * jnp.asarray(1e-3, qq.dtype) + vv * jnp.asarray(1e-3, qq.dtype)


progs = {}
for name, fn3 in (("dma", dma3), ("prod", prod3), ("xlaadd", xlaadd3)):
    progs[f"{name}_x1"] = chain(fn3, 1)
    progs[f"{name}_x{K}"] = chain(fn3, K)


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn(q, k, v)
    jax.device_get(out.ravel()[:2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in progs}
for rnd in range(ROUNDS):
    for name, fn in progs.items():
        results[name].append(timed(fn))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.2f}" for n in results))


def med(name):
    s = sorted(results[name])
    return s[len(s) // 2]


print(f"\n=== marginal cost per kernel application, medians/{ROUNDS} ===")
for name in ("dma", "prod", "xlaadd"):
    t1, tk = med(f"{name}_x1"), med(f"{name}_x{K}")
    marg = (tk - t1) / (K - 1)
    bw = total_bytes / 1e9 / (marg / 1e3)
    print(f"{name:7s}: x1={t1:6.2f} ms  x{K}={tk:6.2f} ms  marginal={marg:6.2f} ms"
          f"  ({bw:5.0f} GB/s)  dispatch~={t1 - marg:5.2f} ms")

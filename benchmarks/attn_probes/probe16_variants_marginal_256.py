"""Kernel variants at 256x256 ViT-B geometry, measured by MARGINAL cost
(probe15 methodology: chain K applications in one jit; (tK-t1)/(K-1)) —
the only dispatch-free number under the relay's ~9 ms per-call overhead.

True costs so far: DMA floor 0.81 ms/layer-batch, prod kernel 3.99 ms.
Variants isolate rope / orientation / head-group / batched-dot designs.

Run: python benchmarks/attn_probes/probe16_variants_marginal_256.py
"""
import functools
import os
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
H = 2 * G
NV = 261
dd = 2 * d
ROUNDS = 5
N_ITERS = 3
K = 5

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
qu = jnp.asarray(np.asarray(q).reshape(B, G, N, 2, d).transpose(0, 1, 3, 2, 4).reshape(B * H, N, d))
ku = jnp.asarray(np.asarray(k).reshape(B, G, N, 2, d).transpose(0, 1, 3, 2, 4).reshape(B * H, N, d))
vu = jnp.asarray(np.asarray(v).reshape(B, G, N, 2, d).transpose(0, 1, 3, 2, 4).reshape(B * H, N, d))
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5
BG = B * G
_NEG_INF = -1e30


def prod_variant(pvt=None, rope=True, gh=None, bq=None):
    def fn3(qq, kk, vv):
        if gh is not None:
            os.environ["CBAS_ATTN_GH"] = str(gh)
            os.environ["CBAS_ATTN_BQ"] = str(bq)
        try:
            return fa.fused_attention_packed(
                qq, kk, vv, scale, n_valid=NV,
                rope_cos=cos if rope else None, rope_sin=sin if rope else None,
                pvt=pvt)
        finally:
            os.environ.pop("CBAS_ATTN_GH", None)
            os.environ.pop("CBAS_ATTN_BQ", None)
    return fn3


NH = 16


def full_batched_kernel(q_ref, k_ref, v_ref, o_ref):
    q3 = q_ref[...]
    k3 = k_ref[...]
    v3 = v_ref[...]
    s = jax.lax.dot_general(q3, k3, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    s = jnp.where(col < NV, s, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    v3 = jnp.where(rowv < NV, v3, jnp.zeros((), v3.dtype))
    o = jax.lax.dot_general(p.astype(v3.dtype), v3, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[...] = o.astype(o_ref.dtype)


f_batched = pl.pallas_call(
    full_batched_kernel,
    out_shape=jax.ShapeDtypeStruct((B * H, N, d), q.dtype),
    grid=(B * H // NH, 1),
    in_specs=[pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
)


def rope_xla(t):
    c = cos.astype(t.dtype)
    s_ = sin.astype(t.dtype)

    def rh(x):
        return jnp.concatenate([-x[..., d // 2:], x[..., :d // 2]], -1)

    return t * c + rh(t) * s_


def batched3(qq, kk, vv):
    qr = rope_xla(qq) * jnp.asarray(scale, qq.dtype)
    kr = rope_xla(kk)
    return f_batched(qr, kr, vv)


def batched3_norope(qq, kk, vv):
    return f_batched(qq, kk, vv)


CASES = {
    "prod(pvt)": (prod_variant(), (q, k, v)),
    "std": (prod_variant(pvt=False), (q, k, v)),
    "pvt,norope": (prod_variant(pvt=True, rope=False), (q, k, v)),
    "std,norope": (prod_variant(pvt=False, rope=False), (q, k, v)),
    "pvt,gh2": (prod_variant(pvt=True, gh=2, bq=272), (q, k, v)),
    "pvt,gh32": (prod_variant(pvt=True, gh=32, bq=272), (q, k, v)),
    "batched": (batched3, (qu, ku, vu)),
    "batched,norope": (batched3_norope, (qu, ku, vu)),
}


def chain(fn3, args, times):
    def run(qq, kk, vv):
        x = qq
        for _ in range(times):
            x = fn3(x, kk, vv)
        return x
    j = jax.jit(run)
    jax.device_get(j(*args).ravel()[:2])
    return j


progs = {}
for name, (fn3, args) in CASES.items():
    progs[name] = (chain(fn3, args, 1), chain(fn3, args, K), args)


def timed(fn, args):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn(*args)
    jax.device_get(out.ravel()[:2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: ([], []) for name in progs}
for rnd in range(ROUNDS):
    line = []
    for name, (f1, fk, args) in progs.items():
        results[name][0].append(timed(f1, args))
        results[name][1].append(timed(fk, args))
        m = (results[name][1][-1] - results[name][0][-1]) / (K - 1)
        line.append(f"{name}={m:.2f}")
    print(f"round {rnd}: " + "  ".join(line))


def med(v):
    s = sorted(v)
    return s[len(s) // 2]


print(f"\n=== marginal ms/layer-batch (DMA floor 0.81), medians/{ROUNDS} ===")
for name, (t1s, tks) in results.items():
    marg = (med(tks) - med(t1s)) / (K - 1)
    print(f"{name:16s}: {marg:6.2f} ms")

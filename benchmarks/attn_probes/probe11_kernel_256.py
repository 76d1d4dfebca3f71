"""Standalone kernel A/B at the 256x256 ViT-B geometry (B=384, G=6 pairs,
N=272, n_valid=261, d=64, RoPE on) — probe9 found the packed kernel costs
67.5 ms/model-batch (5.6 ms/layer-batch) here, ~20x its DMA+MXU floor
(~0.3 ms/layer-batch: 640 MB of q/k/v/o for 12 layers -> 53 MB/layer at
819 GB/s, attention math 87 GFLOP/layer-batch -> 0.45 ms). Sweep the
orientation, head-group and query-block knobs and strip stages to find
where the 5 ms goes.

Run: python benchmarks/attn_probes/probe11_kernel_256.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from cbas_tpu.ops import flash_attention as fa

B, G, N, d = 384, 6, 272, 64
NV = 261
dd = 2 * d
ROUNDS = 7
N_ITERS = 5

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5

import os

VARIANTS = {}


def add_cfg(name, *, pvt=None, gh=None, bq=None, rope=True):
    def f():
        if gh is not None:
            os.environ["CBAS_ATTN_GH"] = str(gh)
            os.environ["CBAS_ATTN_BQ"] = str(bq)
        try:
            fn = jax.jit(functools.partial(
                fa.fused_attention_packed, scale=scale, n_valid=NV,
                rope_cos=cos if rope else None,
                rope_sin=sin if rope else None, pvt=pvt,
            ))
            jax.device_get(fn(q, k, v)[0, 0, :2, :2])
            return fn
        finally:
            os.environ.pop("CBAS_ATTN_GH", None)
            os.environ.pop("CBAS_ATTN_BQ", None)

    VARIANTS[name] = f


add_cfg("prod(pvt,gh16)")              # auto: gh=16 -> gp=8, block_q=272
add_cfg("std,gh16", pvt=False)
add_cfg("pvt,gh4", pvt=True, gh=4, bq=272)
add_cfg("std,gh4", pvt=False, gh=4, bq=272)
add_cfg("pvt,gh2", pvt=True, gh=2, bq=272)
add_cfg("std,gh2", pvt=False, gh=2, bq=272)
add_cfg("pvt,gh32", pvt=True, gh=32, bq=272)
add_cfg("std,norope", pvt=False, rope=False)
add_cfg("pvt,norope", pvt=True, rope=False)


def xla_ref():
    # un-packed reference attention via XLA at the same math (rope applied
    # outside, which XLA fuses into the surrounding ops)
    def f(q2, k2, v2):
        qq = q2.reshape(B, G * 2, N, d)
        kk = k2.reshape(B, G * 2, N, d)
        vv = v2.reshape(B, G * 2, N, d)
        cc, ss = cos.astype(qq.dtype), sin.astype(qq.dtype)

        def rot(t):
            return jnp.concatenate([-t[..., d // 2:], t[..., :d // 2]], -1)

        qq = qq * cc + rot(qq) * ss
        kk = kk * cc + rot(kk) * ss
        s = jnp.einsum("bhqd,bhkd->bhqk", qq, kk) * scale
        mask = jnp.arange(N)[None, None, None, :] < NV
        s = jnp.where(mask, s.astype(jnp.float32), -1e30)
        w = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, vv)
        return o.reshape(B, G, N, dd)

    fn = jax.jit(f)
    jax.device_get(fn(q, k, v)[0, 0, :2, :2])
    return fn


progs = {name: f() for name, f in VARIANTS.items()}
progs["xla_ref"] = xla_ref()


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn(q, k, v)
    jax.device_get(out[0, 0, :2, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in progs}
for rnd in range(ROUNDS):
    for name, fn in progs.items():
        results[name].append(timed(fn))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.2f}" for n in results))

print(f"\n=== B={B} G={G} N={N} (nv={NV}) d={d}, ms/layer-batch, medians/{ROUNDS} ===")
for name in progs:
    s = sorted(results[name])
    print(f"{name:16s}: {s[len(s) // 2]:6.2f} ms")

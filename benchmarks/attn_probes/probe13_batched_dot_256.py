"""Floor-finding + batched-dot experiments at the 256x256 geometry.

probe12: phase-splitting and removing exp change nothing -> the cost is in
per-head small-tile mechanics. Mosaic rejects an in-kernel lane-split
reshape (8,272,128)->(16,272,64), so the batched variants take UNPACKED
(B*H, N, 64) inputs (the model can emit that layout straight from the
projection einsum) and run ONE batched dot_general over all heads of a
program:

  dma_only       - o = q passthrough on packed blocks: the DMA floor
  qk_only        - per-pair QK loop into scratch (no rope/softmax/PV)
  full_batched   - complete attention, unpacked inputs, rope HOISTED to XLA:
                   batched QK -> one softmax -> batched PV
  qk_batched     - just the batched QK into scratch (unpacked inputs)
  prod           - fused_attention_packed reference

Run: python benchmarks/attn_probes/probe13_batched_dot_256.py
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
H = 2 * G
NV = 261
dd = 2 * d
ROUNDS = 7
N_ITERS = 5
GP = 8
NH = 2 * GP

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
# unpacked views of the same data: (B, G, N, 2, d) -> (B*H, N, d)
qu = jnp.asarray(np.asarray(q).reshape(B, G, N, 2, d).transpose(0, 1, 3, 2, 4).reshape(B * H, N, d))
ku = jnp.asarray(np.asarray(k).reshape(B, G, N, 2, d).transpose(0, 1, 3, 2, 4).reshape(B * H, N, d))
vu = jnp.asarray(np.asarray(v).reshape(B, G, N, 2, d).transpose(0, 1, 3, 2, 4).reshape(B * H, N, d))
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5
_NEG_INF = -1e30

PACKED_SPECS = dict(
    grid=(B * G // GP, 1),
    in_specs=[
        pl.BlockSpec((GP, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((GP, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((GP, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((GP, N, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)
UNPACKED_SPECS = dict(
    grid=(B * H // NH, 1),
    in_specs=[
        pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)


def dma_kernel(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...] + k_ref[...] * 0 + v_ref[...] * 0


def qk_kernel(q_ref, k_ref, v_ref, o_ref, s_scr):
    def pair(g, _):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        for half in (0, 1):
            s = jax.lax.dot_general(
                q2[:, half * d:(half + 1) * d], k2[:, half * d:(half + 1) * d],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s_scr[pl.ds(2 * g + half, 1)] = s[None]
        return 0
    jax.lax.fori_loop(0, GP, pair, 0)
    o_ref[...] = q_ref[...] + s_scr[0, :1, :1].astype(q_ref.dtype) * 0


def qk_batched_kernel(q_ref, k_ref, v_ref, o_ref, s_scr):
    s = jax.lax.dot_general(q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s_scr[...] = s
    o_ref[...] = q_ref[...] + s_scr[0, :1, :1].astype(q_ref.dtype) * 0


def full_batched_kernel(q_ref, k_ref, v_ref, o_ref):
    # rope + scale already applied outside
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


def rope_xla(t):
    c = cos.astype(t.dtype)
    s_ = sin.astype(t.dtype)

    def rh(x):
        return jnp.concatenate([-x[..., d // 2:], x[..., :d // 2]], -1)

    return t * c + rh(t) * s_


def make(kernel, specs, shape, scratch_n=None):
    kw = dict(specs)
    if scratch_n:
        kw["scratch_shapes"] = [pltpu.VMEM((scratch_n, N, N), jnp.float32)]
    f = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(shape, q.dtype), **kw)
    return f


f_dma = make(dma_kernel, PACKED_SPECS, (B * G, N, dd))
f_qk = make(qk_kernel, PACKED_SPECS, (B * G, N, dd), scratch_n=NH)
f_qkb = make(qk_batched_kernel, UNPACKED_SPECS, (B * H, N, d), scratch_n=NH)
f_full = make(full_batched_kernel, UNPACKED_SPECS, (B * H, N, d))

progs = {}
progs["prod(pvt)"] = (lambda fn: (jax.device_get(fn(q, k, v)[0, 0, :2, :2]), fn)[1])(
    jax.jit(functools.partial(fa.fused_attention_packed, scale=scale, n_valid=NV,
                              rope_cos=cos, rope_sin=sin)))


def wrap_packed(f):
    def run(qq, kk, vv):
        return f(qq.reshape(B * G, N, dd), kk.reshape(B * G, N, dd), vv.reshape(B * G, N, dd))
    fn = jax.jit(run)
    jax.device_get(fn(q, k, v)[0, :2, :2])
    return lambda: fn(q, k, v)


def wrap_unpacked(f, with_rope):
    def run(qq, kk, vv):
        if with_rope:
            qq = rope_xla(qq) * jnp.asarray(scale, qq.dtype)
            kk = rope_xla(kk)
        return f(qq, kk, vv)
    fn = jax.jit(run)
    jax.device_get(fn(qu, ku, vu)[0, :2, :2])
    return lambda: fn(qu, ku, vu), fn


progs["dma_only"] = wrap_packed(f_dma)
progs["qk_only"] = wrap_packed(f_qk)
progs["qk_batched"] = wrap_unpacked(f_qkb, with_rope=False)[0]
full_call, full_fn = wrap_unpacked(f_full, with_rope=True)
progs["full_batched"] = full_call

# numeric check of full_batched vs prod (same data, different layout)
out_u = np.asarray(full_fn(qu, ku, vu))
out_u = out_u.reshape(B, G, 2, N, d).transpose(0, 1, 3, 2, 4).reshape(B, G, N, dd)
ref_out = np.asarray(jax.jit(functools.partial(
    fa.fused_attention_packed, scale=scale, n_valid=NV, rope_cos=cos, rope_sin=sin))(q, k, v))
err = float(np.max(np.abs(out_u.astype(np.float32) - ref_out.astype(np.float32))))
print(f"full_batched max|diff| vs prod = {err:.2e}  (bf16 rope outside: expect ~1e-2)")


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn()
    jax.device_get(out[0, 0, :2, :2] if out.ndim == 4 else out[0, :2, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


calls = {}
for name, fn in progs.items():
    if name == "prod(pvt)":
        calls[name] = lambda fn=fn: fn(q, k, v)
    else:
        calls[name] = fn

results = {name: [] for name in calls}
for rnd in range(ROUNDS):
    for name, fn in calls.items():
        results[name].append(timed(fn))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.2f}" for n in results))

print(f"\n=== B={B} G={G} N={N} d={d}, ms/layer-batch, medians/{ROUNDS} ===")
for name in calls:
    s = sorted(results[name])
    print(f"{name:14s}: {s[len(s) // 2]:6.2f} ms")

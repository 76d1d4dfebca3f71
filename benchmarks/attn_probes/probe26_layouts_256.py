"""Probe 26: can a head-major layout close the 256x256 kernel gap (r4
verdict next #3)?

Chained-marginal (probe15 methodology) kernel-body costs at the PRODUCTION
batch (448, vs probe16's 384), plus the unprobed variants the r4 campaign
left on the table:

- fat            : production fused_attention_fat (in-kernel pair slicing)
- batched        : (B*H, N, 64) grid-native heads, NH per block (probe16's
                   best body, 2.0 ms at B=384)
- batched_kt     : K pre-transposed to (B*H, 64, N) so scores are a clean
                   normal-orientation q @ kT matmul (no lane-contraction);
                   V stays (B*H, N, 64) (p @ v already contracts p's minor
                   with v's major)
- relayout       : a Pallas fat->batched relayout kernel (read (gb,N,128)
                   pair bands, write (2,N,64) stacked heads) — the price of
                   PRODUCING the batched layout without XLA's transpose copy
- relayout_kt    : same, but writing K as (B*H, 64, N) (in-register
                   transpose before store)

Decision rule: batched-or-kt body + relayout production must beat fat's
3.9-4.5 ms, else the fat kernel stays.

Run on the TPU host: python benchmarks/attn_probes/probe26_layouts_256.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cbas_tpu.ops import flash_attention as fa
from cbas_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

B, H, N, d = 448, 12, 272, 64
D = H * d
NV = 261
ROUNDS = 5
N_ITERS = 3
K = 5
NH = 16
_NEG_INF = -1e30
scale = d ** -0.5

rng = np.random.default_rng(0)
qf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
kf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
vf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
qu = jnp.asarray(np.asarray(qf).reshape(B, N, H, d).transpose(0, 2, 1, 3).reshape(B * H, N, d))
ku = jnp.asarray(np.asarray(kf).reshape(B, N, H, d).transpose(0, 2, 1, 3).reshape(B * H, N, d))
vu = jnp.asarray(np.asarray(vf).reshape(B, N, H, d).transpose(0, 2, 1, 3).reshape(B * H, N, d))
kt = jnp.asarray(np.asarray(ku).transpose(0, 2, 1))  # (B*H, d, N)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)


def fat3(qq, kk, vv):
    return fa.fused_attention_fat(qq, kk, vv, scale, n_valid=NV,
                                  rope_cos=cos, rope_sin=sin)


def fat3_norope(qq, kk, vv):
    return fa.fused_attention_fat(qq, kk, vv, scale, n_valid=NV)


def batched_kernel(q_ref, k_ref, v_ref, o_ref):
    q3 = q_ref[...]
    k3 = k_ref[...]
    v3 = v_ref[...]
    s = jax.lax.dot_general(q3, k3, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    s = jnp.where(col < NV, s * scale, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    v3 = jnp.where(rowv < NV, v3, jnp.zeros((), v3.dtype))
    o = jax.lax.dot_general(p.astype(v3.dtype), v3, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[...] = o.astype(o_ref.dtype)


f_batched = pl.pallas_call(
    batched_kernel,
    out_shape=jax.ShapeDtypeStruct((B * H, N, d), qf.dtype),
    grid=(B * H // NH, 1),
    in_specs=[pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
)


def batched_kt_kernel(q_ref, kt_ref, v_ref, o_ref):
    q3 = q_ref[...]
    kt3 = kt_ref[...]
    v3 = v_ref[...]
    # clean orientation: contract q minor with kT major
    s = jax.lax.dot_general(q3, kt3, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    s = jnp.where(col < NV, s * scale, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=2, keepdims=True)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    v3 = jnp.where(rowv < NV, v3, jnp.zeros((), v3.dtype))
    o = jax.lax.dot_general(p.astype(v3.dtype), v3, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / den
    o_ref[...] = o.astype(o_ref.dtype)


f_batched_kt = pl.pallas_call(
    batched_kt_kernel,
    out_shape=jax.ShapeDtypeStruct((B * H, N, d), qf.dtype),
    grid=(B * H // NH, 1),
    in_specs=[
        pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NH, d, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((NH, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
)


def batched3(qq, kk, vv):
    return f_batched(qq, kk, vv)


def batched3_kt(qq, kk, vv):
    return f_batched_kt(qq, kk, vv)


# --- relayout kernels: fat (B, N, D) -> batched (B*H, N, d) [and kT] -------
GB = 4


# NOTE: a fat -> (B*H, N, d) relayout kernel does NOT lower: a 64-lane
# sliced store becomes an unsupported Mosaic gather, and the pair-wide
# (N, 128) -> (N, 2, 64) reshape is an unsupported shape cast
# (infer-vector-layout). Only the TRANSPOSED store (relayout_kt below,
# via swapaxes) compiles — so any head-major production path must emit
# kT/vT-style (B*H, d, N) layouts, or fold the relayout into a matmul's
# output writes.


def relayout_kt_kernel(x_ref, o_ref):
    for i in range(GB):
        x = x_ref[pl.ds(i, 1)][0]
        for h in range(H):
            g, half = h // 2, h % 2
            band = x[:, g * 128:(g + 1) * 128]
            o_ref[pl.ds(i * H + h, 1)] = band[:, half * d:(half + 1) * d].swapaxes(0, 1)[None]


f_relayout_kt = pl.pallas_call(
    relayout_kt_kernel,
    out_shape=jax.ShapeDtypeStruct((B * H, d, N), qf.dtype),
    grid=(B // GB, 1),
    in_specs=[pl.BlockSpec((GB, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((GB * H, d, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
)


def relayout3_kt(qq, kk, vv):
    y = f_relayout_kt(qq)
    return qq + y[0, 0, 0].astype(qq.dtype)


# --- hybrid: q stays FAT (zero production cost), k/v pre-transposed -------
GBH = 4


def fatq_kt_kernel(q_ref, kt_ref, vt_ref, o_ref):
    for i in range(GBH):
        qi = q_ref[pl.ds(i, 1)][0]  # (N, D) fat
        for g in range(H // 2):
            q2 = qi[:, g * 128:(g + 1) * 128]
            for half in range(2):
                h = 2 * g + half
                qh = q2[:, half * d:(half + 1) * d]  # (N, 64) in-register
                kth = kt_ref[pl.ds(i * H + h, 1)][0]  # (64, N)
                vth = vt_ref[pl.ds(i * H + h, 1)][0]  # (64, N)
                s = jax.lax.dot_general(
                    qh, kth, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
                s = jnp.where(col < NV, s * scale, _NEG_INF)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                den = jnp.sum(p, axis=1, keepdims=True)
                vm = jnp.where(col < NV, vth, jnp.zeros((), vth.dtype))
                # contract p lanes with vT lanes; output (N, d) row-major
                o = jax.lax.dot_general(
                    p.astype(vm.dtype), vm, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) / den
                o_ref[pl.ds(i * H + h, 1)] = o.astype(o_ref.dtype)[None]


f_fatq_kt = pl.pallas_call(
    fatq_kt_kernel,
    out_shape=jax.ShapeDtypeStruct((B * H, N, d), qf.dtype),
    grid=(B // GBH, 1),
    in_specs=[
        pl.BlockSpec((GBH, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((GBH * H, d, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((GBH * H, d, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((GBH * H, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
)
vt = jnp.asarray(np.asarray(vu).transpose(0, 2, 1))


def fatq_kt3(qq, kk, vv):
    # chain keeps q fat; kernel output is (B*H, N, d) so feed back a scalar
    y = f_fatq_kt(qq, kk, vv)
    return qq + y[0, 0, 0].astype(qq.dtype)


CASES = {
    "fat": (fat3, (qf, kf, vf)),
    "fat,norope": (fat3_norope, (qf, kf, vf)),
    "batched": (batched3, (qu, ku, vu)),
    "batched_kt": (batched3_kt, (qu, kt, vu)),
    "fatq_kt": (fatq_kt3, (qf, kt, vt)),
    "relayout_kt(x1)": (relayout3_kt, (qf, kf, vf)),
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


print(f"\n=== marginal ms/layer-batch at B={B} (fat baseline), medians/{ROUNDS} ===")
for name, (t1s, tks) in results.items():
    marg = (med(tks) - med(t1s)) / (K - 1)
    print(f"{name:16s}: {marg:6.2f} ms")

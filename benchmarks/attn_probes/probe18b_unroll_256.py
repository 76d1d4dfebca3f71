"""FAT-LANE kernel (b: + static-unrolled pair loop variant): attention over (B, N, D=768) row-major activations.

HLO inspection showed XLA copies all three packed (B,G,N,128) projections
before every custom call (the einsum's natural layout differs from the
kernel's row-major operand requirement) — ~1.2 ms/layer of pure copy at
256x256. This kernel takes q/k/v in the SAME layout the plain 2D projection
matmuls produce — (B, N, 768) row-major, a free bitcast of (B*N, 768) — and
slices each head pair from a 128-aligned lane offset in VMEM. No copy, no
transpose, no packed einsum anywhere.

Measures (marginal, chained): fat768 std/pvt vs prod packed kernel, plus a
fat768 dma-passthrough floor.

Run: python benchmarks/attn_probes/probe18_fat768_256.py
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

B, N, D, d = 384, 272, 768, 64
G = 6          # head pairs
NV = 261
ROUNDS = 5
N_ITERS = 3
K = 5
GB = 4         # batch items per program
_NEG_INF = -1e30

rng = np.random.default_rng(0)
qf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
kf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
vf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5


def fat_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, o_ref, *, pvt: bool):
    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

    cq = cosq_ref[...] * scale
    sq = sinq_ref[...] * scale

    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    live = row < NV
    col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    live_col = col < NV

    def one_head(qh, kh, vh):
        qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
        kh = kh * cosq_ref[...].astype(kh.dtype) + rot_half(kh) * sinq_ref[...].astype(kh.dtype)
        vh = jnp.where(live, vh, jnp.zeros((), vh.dtype))
        if pvt:
            st = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            st = jnp.where(live, st, _NEG_INF)
            st = st - jnp.max(st, axis=0, keepdims=True)
            p = jnp.exp(st)
            den = jnp.sum(p, axis=0, keepdims=True)
            ot = jax.lax.dot_general(vh.swapaxes(0, 1), p.astype(vh.dtype),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) / den
            return ot.swapaxes(0, 1)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(live_col, s, _NEG_INF)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        den = jnp.sum(p, axis=1, keepdims=True)
        return jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) / den

    def item(i, _):
        def pair(g, _2):
            # 128-aligned lane slice of the pair; 64-lane halves split
            # in-register (Mosaic only proves alignment for 128 multiples)
            off = g * 128
            q2 = q_ref[pl.ds(i, 1), :, pl.ds(off, 128)][0]
            k2 = k_ref[pl.ds(i, 1), :, pl.ds(off, 128)][0]
            v2 = v_ref[pl.ds(i, 1), :, pl.ds(off, 128)][0]
            o_a = one_head(q2[:, :d], k2[:, :d], v2[:, :d])
            o_b = one_head(q2[:, d:], k2[:, d:], v2[:, d:])
            o_ref[pl.ds(i, 1), :, pl.ds(off, 128)] = jnp.concatenate(
                [o_a, o_b], axis=1).astype(o_ref.dtype)[None]
            return 0
        jax.lax.fori_loop(0, G, pair, 0)
        return 0

    jax.lax.fori_loop(0, GB, item, 0)




def fat_kernel_unroll(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, o_ref, *, pvt: bool):
    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

    cq = cosq_ref[...] * scale
    sq = sinq_ref[...] * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    live = row < NV
    col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    live_col = col < NV

    def one_head(qh, kh, vh):
        qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
        kh = kh * cosq_ref[...].astype(kh.dtype) + rot_half(kh) * sinq_ref[...].astype(kh.dtype)
        vh = jnp.where(live, vh, jnp.zeros((), vh.dtype))
        if pvt:
            st = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            st = jnp.where(live, st, _NEG_INF)
            st = st - jnp.max(st, axis=0, keepdims=True)
            p = jnp.exp(st)
            den = jnp.sum(p, axis=0, keepdims=True)
            ot = jax.lax.dot_general(vh.swapaxes(0, 1), p.astype(vh.dtype),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) / den
            return ot.swapaxes(0, 1)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(live_col, s, _NEG_INF)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        den = jnp.sum(p, axis=1, keepdims=True)
        return jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) / den

    def item(i, _):
        for g in range(G):
            off = g * 128
            q2 = q_ref[pl.ds(i, 1), :, off:off + 128][0]
            k2 = k_ref[pl.ds(i, 1), :, off:off + 128][0]
            v2 = v_ref[pl.ds(i, 1), :, off:off + 128][0]
            o_a = one_head(q2[:, :d], k2[:, :d], v2[:, :d])
            o_b = one_head(q2[:, d:], k2[:, d:], v2[:, d:])
            o_ref[pl.ds(i, 1), :, off:off + 128] = jnp.concatenate(
                [o_a, o_b], axis=1).astype(o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, GB, item, 0)

def dma_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, o_ref):
    o_ref[...] = q_ref[...] + k_ref[...] * 0 + v_ref[...] * 0


def make_fat(kernel, **kw):
    f = pl.pallas_call(
        functools.partial(kernel, **kw) if kw else kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), qf.dtype),
        grid=(B // GB, 1),
        in_specs=[
            pl.BlockSpec((GB, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    return lambda qq, kk, vv: f(qq, kk, vv, cos, sin)


fat_std = make_fat(fat_kernel, pvt=False)
fat_pvt = make_fat(fat_kernel, pvt=True)
fat_unroll = make_fat(fat_kernel_unroll, pvt=True)
fat_dma = make_fat(dma_kernel)

# packed prod reference on equivalent data
q2 = jnp.asarray(np.asarray(qf).reshape(B, N, G, 128).transpose(0, 2, 1, 3))
k2 = jnp.asarray(np.asarray(kf).reshape(B, N, G, 128).transpose(0, 2, 1, 3))
v2 = jnp.asarray(np.asarray(vf).reshape(B, N, G, 128).transpose(0, 2, 1, 3))


def prod3(qq, kk, vv):
    return fa.fused_attention_packed(qq, kk, vv, scale, n_valid=NV,
                                     rope_cos=cos, rope_sin=sin)


# numeric check fat vs prod
ref = np.asarray(jax.jit(prod3)(q2, k2, v2)).transpose(0, 2, 1, 3).reshape(B, N, D)
got = np.asarray(jax.jit(fat_std)(qf, kf, vf))
err = np.max(np.abs(ref.astype(np.float32) - got.astype(np.float32)))
print(f"fat_std max|diff| vs prod = {err:.3e}")
got = np.asarray(jax.jit(fat_pvt)(qf, kf, vf))
err = np.max(np.abs(ref.astype(np.float32) - got.astype(np.float32)))
print(f"fat_pvt max|diff| vs prod = {err:.3e}")


def chain(fn3, args, times):
    def run(qq, kk, vv):
        x = qq
        for _ in range(times):
            x = fn3(x, kk, vv)
        return x
    j = jax.jit(run)
    jax.device_get(j(*args).ravel()[:2])
    return j, args


CASES = {
    "prod(packed)": (prod3, (q2, k2, v2)),
    "fat_std": (fat_std, (qf, kf, vf)),
    "fat_pvt": (fat_pvt, (qf, kf, vf)),
    "fat_unroll": (fat_unroll, (qf, kf, vf)),
    "fat_dma": (fat_dma, (qf, kf, vf)),
}
progs = {n: (chain(f, a, 1)[0], chain(f, a, K)[0], a) for n, (f, a) in CASES.items()}


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
        line.append(f"{name}={(results[name][1][-1] - results[name][0][-1]) / (K - 1):.2f}")
    print(f"round {rnd}: " + "  ".join(line))


def med(v):
    return sorted(v)[len(v) // 2]


print(f"\n=== marginal ms/layer-batch at 256x256, medians/{ROUNDS} ===")
for name, (t1s, tks) in results.items():
    print(f"{name:14s}: {(med(tks) - med(t1s)) / (K - 1):6.2f} ms")

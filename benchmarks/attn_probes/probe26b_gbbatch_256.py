"""Probe 26b: batch the fat kernel's dots over gb items (zero layout cost).

Probe26's finding: the batched kernel's edge over fat (2.26 vs 2.97 ms at
B=448) comes from BATCHED dot_generals, not from the head-major layout —
fatq_kt (clean per-head layouts, sequential small dots) is as slow as fat,
and producing any transposed layout costs 1.28 ms/tensor, more than the
whole body win. So: restructure the fat kernel's loop from
(item, pair, head) sequential dots to per-pair dots BATCHED over the gb
items — operands are (gb, N, 64) slices of the block the kernel already
holds, no relayout anywhere.

Variants (chained-marginal, B=448):
- fat            : production baseline (~2.97)
- gbbatch        : per-pair dots batched over gb items, norope
- gbbatch,rope   : + pair-wide in-kernel rope (the production feature set)
- gb8            : gbbatch with gb=8 (more batching per dot)

Run on the TPU host: python benchmarks/attn_probes/probe26b_gbbatch_256.py
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
from cbas_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

B, H, N, d = 448, 12, 272, 64
D = H * d
G = H // 2
NV = 261
ROUNDS = 5
N_ITERS = 3
K = 5
_NEG_INF = -1e30
scale = d ** -0.5

rng = np.random.default_rng(0)
qf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
kf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
vf = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)


def fat3(qq, kk, vv):
    return fa.fused_attention_fat(qq, kk, vv, scale, n_valid=NV,
                                  rope_cos=cos, rope_sin=sin)


def gbbatch_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, o_ref, *, gb, rope):
    if rope:
        # pair-wide widened tables, same trick as production _fat_kernel
        cq2 = jnp.concatenate([cq_ref[...]] * 2, axis=1)[None]  # (1, N, 128)
        sq2 = jnp.concatenate([sq_ref[...]] * 2, axis=1)[None]

        def rot_half_packed(t):  # (gb, N, 128)
            h = d // 2
            return jnp.concatenate(
                [-t[:, :, h:d], t[:, :, :h], -t[:, :, d + h:], t[:, :, d:d + h]],
                axis=2)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    live_col = col < NV
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    live_row = rowv < NV

    def one_head(qh, kh, vh):
        # qh/kh/vh: (gb, N, 64) — ONE batched dot per op over all gb items
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = jnp.where(live_col, s * scale, _NEG_INF)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        vh = jnp.where(live_row, vh, jnp.zeros((), vh.dtype))
        return jax.lax.dot_general(p.astype(vh.dtype), vh,
                                   (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32) / den

    for g in range(G):
        off = g * 128
        q2 = q_ref[:, :, pl.ds(off, 128)]
        k2 = k_ref[:, :, pl.ds(off, 128)]
        v2 = v_ref[:, :, pl.ds(off, 128)]
        if rope:
            q2 = q2 * cq2.astype(q2.dtype) + rot_half_packed(q2) * sq2.astype(q2.dtype)
            k2 = k2 * cq2.astype(k2.dtype) + rot_half_packed(k2) * sq2.astype(k2.dtype)
        o_a = one_head(q2[:, :, :d], k2[:, :, :d], v2[:, :, :d])
        o_b = one_head(q2[:, :, d:], k2[:, :, d:], v2[:, :, d:])
        o_ref[:, :, pl.ds(off, 128)] = jnp.concatenate(
            [o_a, o_b], axis=2).astype(o_ref.dtype)


def make_gbbatch(gb, rope):
    return pl.pallas_call(
        functools.partial(gbbatch_kernel, gb=gb, rope=rope),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qf.dtype),
        grid=(B // gb, 1),
        in_specs=[
            pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )


f_gb4 = make_gbbatch(4, rope=False)
f_gb4_rope = make_gbbatch(4, rope=True)
f_gb8_rope = make_gbbatch(8, rope=True)


def gb4(qq, kk, vv):
    return f_gb4(qq, kk, vv, cos, sin)


def gb4_rope(qq, kk, vv):
    return f_gb4_rope(qq, kk, vv, cos, sin)


def gb8_rope(qq, kk, vv):
    return f_gb8_rope(qq, kk, vv, cos, sin)


CASES = {
    "fat(prod)": (fat3, (qf, kf, vf)),
    "gbbatch": (gb4, (qf, kf, vf)),
    "gbbatch,rope": (gb4_rope, (qf, kf, vf)),
    "gb8,rope": (gb8_rope, (qf, kf, vf)),
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
    print(f"compiled: {name}")


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


print(f"\n=== marginal ms/layer-batch at B={B}, medians/{ROUNDS} ===")
for name, (t1s, tks) in results.items():
    marg = (med(tks) - med(t1s)) / (K - 1)
    print(f"{name:14s}: {marg:6.2f} ms")


# parity spot-check vs the production kernel (norope, same masking)
ref = fa.fused_attention_fat(qf, kf, vf, scale, n_valid=NV)
got = f_gb4(qf, kf, vf, cos, sin)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"gbbatch vs fat parity (norope): {err:.2e}")

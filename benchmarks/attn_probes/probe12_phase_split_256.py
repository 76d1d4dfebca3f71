"""Phase-split kernel experiment at the 256x256 geometry (B=384, G=6, N=272).

probe11: the production packed kernel runs 8.8 ms/layer-batch here, ~20x its
DMA+MXU floor, invariant to gh/program count — the per-pair fori_loop body is
a short dependency chain (QK matmul -> VPU softmax -> PV matmul) on small
tiles, so neither unit pipelines. This probe restructures into three phases:

  A: all heads' QK matmuls -> fp32 scores scratch (MXU back-to-back)
  B: ONE masked softmax over the whole (2*gp, block_q, n_pad) scratch (VPU
     vectorizes over a single big tile) -> bf16 p scratch + denom
  C: all heads' PV matmuls + denom divide -> output

Variants: std and pvt orientations, plus a no-exp ablation of B to bound
the VPU share after restructuring.

Run: python benchmarks/attn_probes/probe12_phase_split_256.py
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
ROUNDS = 7
N_ITERS = 5
GP = 8          # pairs per program (16 heads)
NH = 2 * GP     # heads per program

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5
_NEG_INF = -1e30


def phase_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
                 o_ref, s_scr, p_scr, den_scr, *, pvt: bool, noexp: bool):
    n_pad = k_ref.shape[1]
    block_q = q_ref.shape[1]

    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

    cq = cosq_ref[...] * scale
    sq = sinq_ref[...] * scale
    ck = cosk_ref[...]
    sk = sink_ref[...]

    # ---- phase A: all QK matmuls into scratch ----
    def qk_pair(g, _):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        for half in (0, 1):
            qh = q2[:, half * d:(half + 1) * d]
            kh = k2[:, half * d:(half + 1) * d]
            qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
            kh = kh * ck.astype(kh.dtype) + rot_half(kh) * sk.astype(kh.dtype)
            if pvt:
                s = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            s_scr[pl.ds(2 * g + half, 1)] = s[None]
        return 0

    jax.lax.fori_loop(0, GP, qk_pair, 0)

    # ---- phase B: one softmax over the whole scratch ----
    s = s_scr[...]
    if pvt:  # (NH, n_pad, block_q): keys on sublanes (axis 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad, 1), 1)
        s = jnp.where(row < NV, s, _NEG_INF)
        red_axis = 1
    else:    # (NH, block_q, n_pad): keys on lanes (axis 2)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pad), 2)
        s = jnp.where(col < NV, s, _NEG_INF)
        red_axis = 2
    m = jnp.max(s, axis=red_axis, keepdims=True)
    if noexp:
        p = s - m
    else:
        p = jnp.exp(s - m)
    den = jnp.sum(p, axis=red_axis, keepdims=True)
    p_scr[...] = p.astype(p_scr.dtype)
    if pvt:
        den_scr[...] = den[:, 0, :]     # (NH, block_q)
    else:
        den_scr[...] = den[:, :, 0]     # (NH, block_q)

    # ---- phase C: all PV matmuls ----
    def pv_pair(g, _):
        v2 = v_ref[pl.ds(g, 1)][0]
        outs = []
        for half in (0, 1):
            vh = v2[:, half * d:(half + 1) * d]
            rowv = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
            vh = jnp.where(rowv < NV, vh, jnp.zeros((), vh.dtype))
            ph = p_scr[pl.ds(2 * g + half, 1)][0]
            dh = den_scr[pl.ds(2 * g + half, 1)][0]
            if pvt:
                ot = jax.lax.dot_general(vh.swapaxes(0, 1), ph,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                outs.append(ot / dh[None, :])
            else:
                o = jax.lax.dot_general(ph, vh, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                outs.append(o / dh[:, None])
        if pvt:
            ot = jnp.concatenate(outs, axis=0)       # (2d, block_q)
            o_ref[pl.ds(g, 1)] = ot.swapaxes(0, 1).astype(o_ref.dtype)[None]
        else:
            o_ref[pl.ds(g, 1)] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, GP, pv_pair, 0)


def make_phase(pvt, noexp=False):
    n_pad = N  # 272 is already sublane-granule aligned
    block_q = N
    grid = (B * G // GP, 1)
    sshape = (NH, n_pad, block_q) if pvt else (NH, block_q, n_pad)

    f = pl.pallas_call(
        functools.partial(phase_kernel, pvt=pvt, noexp=noexp),
        out_shape=jax.ShapeDtypeStruct((B * G, N, dd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((GP, block_q, dd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GP, n_pad, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GP, n_pad, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GP, block_q, dd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(sshape, jnp.float32),
            pltpu.VMEM(sshape, jnp.bfloat16),
            pltpu.VMEM((NH, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def run(qq, kk, vv):
        return f(qq.reshape(B * G, N, dd), kk.reshape(B * G, N, dd),
                 vv.reshape(B * G, N, dd), cos, sin, cos, sin).reshape(B, G, N, dd)

    fn = jax.jit(run)
    jax.device_get(fn(q, k, v)[0, 0, :2, :2])
    return fn


progs = {}
progs["prod(pvt)"] = (lambda: (
    lambda fn: (jax.device_get(fn(q, k, v)[0, 0, :2, :2]), fn)[1]
)(jax.jit(functools.partial(fa.fused_attention_packed, scale=scale, n_valid=NV,
                            rope_cos=cos, rope_sin=sin))))()
progs["phase,std"] = make_phase(pvt=False)
progs["phase,pvt"] = make_phase(pvt=True)
progs["phase,std,noexp"] = make_phase(pvt=False, noexp=True)

# correctness check vs prod
ref = progs["prod(pvt)"](q, k, v)
for nm in ("phase,std", "phase,pvt"):
    got = progs[nm](q, k, v)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"{nm} max|diff| vs prod = {err:.2e}")


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

print(f"\n=== B={B} G={G} N={N} d={d}, ms/layer-batch, medians/{ROUNDS} ===")
for name in progs:
    s = sorted(results[name])
    print(f"{name:18s}: {s[len(s) // 2]:6.2f} ms")

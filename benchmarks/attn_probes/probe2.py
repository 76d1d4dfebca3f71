"""Stage isolation for the packed attention kernel at the 480p production
geometry (B=320, G=6, N=1216, n_valid=1205, rope on). Variants:
  prod      — the shipped fused_attention_packed
  dma_only  — blocks in/out, no compute (true DMA floor)
  qk_only   — QK matmul + rope, write a slice of s (no softmax/PV)
  nosm      — QK + PV, softmax replaced by a cast (no max/exp/sum/mask)
  pipe      — software-pipelined pair loop (softmax of pair g-1 overlaps
              QK of pair g)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cbas_tpu.ops import flash_attention as fa

B, G, N, d = 320, 6, 1216, 64
NV = 1205
dd = 2 * d
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
scale = d ** -0.5


def timeit(f, *args, iters=8):
    out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    return (time.perf_counter() - t0) / iters


def make_variant(kernel_fn, gp, block_q, n_pad):
    grid = (B * G // gp, (N + block_q - 1) // block_q)
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((B * G, N, dd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gp, block_q, dd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, n_pad, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, n_pad, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gp, block_q, dd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


def dma_kernel(q_ref, k_ref, v_ref, cq, sq, ck, sk, o_ref, *, gp):
    o_ref[...] = q_ref[...]


def qk_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
              o_ref, *, gp):
    n_pad = k_ref.shape[1]

    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

    def one(qh, kh, cq, sq):
        qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
        kh = kh * cosk_ref[...].astype(kh.dtype) + rot_half(kh) * sink_ref[...].astype(kh.dtype)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s

    def pair(g, _):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        cq = cosq_ref[...] * scale
        sq = sinq_ref[...] * scale
        s_a = one(q2[:, :d], k2[:, :d], cq, sq)
        s_b = one(q2[:, d:], k2[:, d:], cq, sq)
        o_ref[pl.ds(g, 1)] = jnp.concatenate(
            [s_a[:, :d], s_b[:, :d]], axis=1).astype(o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, gp, pair, 0)


def nosm_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
                o_ref, *, gp):
    n_pad = k_ref.shape[1]

    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

    def one(qh, kh, vh, cq, sq):
        qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
        kh = kh * cosk_ref[...].astype(kh.dtype) + rot_half(kh) * sink_ref[...].astype(kh.dtype)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = s.astype(vh.dtype)  # softmax elided
        return jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def pair(g, _):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        v2 = v_ref[pl.ds(g, 1)][0]
        cq = cosq_ref[...] * scale
        sq = sinq_ref[...] * scale
        o_a = one(q2[:, :d], k2[:, :d], v2[:, :d], cq, sq)
        o_b = one(q2[:, d:], k2[:, d:], v2[:, d:], cq, sq)
        o_ref[pl.ds(g, 1)] = jnp.concatenate([o_a, o_b], axis=1).astype(
            o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, gp, pair, 0)


def pipe_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
                o_ref, *, gp, n_valid):
    """Software pipeline: iteration g computes QK for pair g (MXU) and
    finishes softmax+PV for pair g-1 (VPU+MXU) — independent streams the
    scheduler can overlap."""
    n_pad = k_ref.shape[1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        key_live = col < n_valid
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        v_live = row < n_valid
    else:
        key_live = v_live = None

    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

    def qk(g):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        cq = cosq_ref[...] * scale
        sq = sinq_ref[...] * scale

        def one(qh, kh):
            qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
            kh = kh * cosk_ref[...].astype(kh.dtype) + rot_half(kh) * sink_ref[...].astype(kh.dtype)
            return jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        return one(q2[:, :d], k2[:, :d]), one(q2[:, d:], k2[:, d:])

    def finish(g, s_a, s_b):
        v2 = v_ref[pl.ds(g, 1)][0]

        def one(s, vh):
            if v_live is not None:
                vh = jnp.where(v_live, vh, jnp.zeros((), vh.dtype))
            sm = s if key_live is None else jnp.where(key_live, s, -1e30)
            st = sm - jnp.max(sm, axis=1, keepdims=True)
            p = jnp.exp(st)
            denom = jnp.sum(p, axis=1, keepdims=True)
            return jax.lax.dot_general(p.astype(vh.dtype), vh,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32) / denom

        o_a = one(s_a, v2[:, :d])
        o_b = one(s_b, v2[:, d:])
        o_ref[pl.ds(g, 1)] = jnp.concatenate([o_a, o_b], axis=1).astype(
            o_ref.dtype)[None]

    s_a0, s_b0 = qk(0)

    def body(g, carry):
        s_a, s_b = carry
        nxt = qk(g + 1)          # MXU for pair g+1
        finish(g, s_a, s_b)      # VPU+MXU for pair g
        return nxt

    s_a, s_b = jax.lax.fori_loop(0, gp - 1, body, (s_a0, s_b0))
    finish(gp - 1, s_a, s_b)


prod = jax.jit(lambda q, k, v: fa.fused_attention_packed(
    q, k, v, scale, n_valid=NV, rope_cos=cos, rope_sin=sin))
t = timeit(prod, q, k, v)
print(f"prod      : {t*1e3:6.1f} ms/layer-batch")

gp, block_q, n_pad = 8, N, N
variants = {
    "dma_only": functools.partial(dma_kernel, gp=gp),
    "qk_only ": functools.partial(qk_kernel, gp=gp),
    "nosm    ": functools.partial(nosm_kernel, gp=gp),
    "pipe    ": functools.partial(pipe_kernel, gp=gp, n_valid=NV),
}
for name, kern in variants.items():
    try:
        f = jax.jit(make_variant(kern, gp, block_q, n_pad))
        t = timeit(f, q.reshape(B * G, N, dd), k.reshape(B * G, N, dd),
                   v.reshape(B * G, N, dd),
                   cos, sin, cos, sin)
        print(f"{name}  : {t*1e3:6.1f} ms/layer-batch")
    except Exception as e:
        print(f"{name}  : FAILED {type(e).__name__}: {str(e)[:200]}")

# correctness of pipe vs prod
f = jax.jit(make_variant(functools.partial(pipe_kernel, gp=gp, n_valid=NV),
                         gp, block_q, n_pad))
got = f(q.reshape(B * G, N, dd), k.reshape(B * G, N, dd),
        v.reshape(B * G, N, dd), cos, sin, cos, sin)
want = prod(q, k, v).reshape(B * G, N, dd)
err = jnp.max(jnp.abs(got[:, :NV].astype(jnp.float32) -
                      want[:, :NV].astype(jnp.float32)))
print(f"pipe max abs err vs prod: {float(err):.2e}")

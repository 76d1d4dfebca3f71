"""Lean interleaved A/B: prod fused_attention_packed vs transposed-PV, 480p geometry."""
import functools, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
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

def pvt_kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
               o_ref, *, gp, n_valid):
    n_pad = k_ref.shape[1]
    if n_valid < n_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        key_live = row < n_valid
    else:
        key_live = None
    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)
    def one(qh, kh, vh, cq, sq):
        qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
        kh = kh * cosk_ref[...].astype(kh.dtype) + rot_half(kh) * sink_ref[...].astype(kh.dtype)
        st = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if key_live is not None:
            st = jnp.where(key_live, st, -1e30)
            vh = jnp.where(key_live, vh, jnp.zeros((), vh.dtype))
        st = st - jnp.max(st, axis=0, keepdims=True)
        p = jnp.exp(st)
        denom = jnp.sum(p, axis=0, keepdims=True)
        ot = jax.lax.dot_general(vh.swapaxes(0, 1), p.astype(vh.dtype),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / denom
        return ot
    def pair(g, _):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        v2 = v_ref[pl.ds(g, 1)][0]
        cq = cosq_ref[...] * scale
        sq = sinq_ref[...] * scale
        ot_a = one(q2[:, :d], k2[:, :d], v2[:, :d], cq, sq)
        ot_b = one(q2[:, d:], k2[:, d:], v2[:, d:], cq, sq)
        ot = jnp.concatenate([ot_a, ot_b], axis=0)
        o_ref[pl.ds(g, 1)] = ot.swapaxes(0, 1).astype(o_ref.dtype)[None]
        return 0
    jax.lax.fori_loop(0, gp, pair, 0)

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

prod = jax.jit(lambda q, k, v: fa.fused_attention_packed(
    q, k, v, scale, n_valid=NV, rope_cos=cos, rope_sin=sin))
fB = jax.jit(make_variant(functools.partial(pvt_kernel, gp=8, n_valid=NV), 8, N, N))
argsB = (q.reshape(B*G, N, dd), k.reshape(B*G, N, dd), v.reshape(B*G, N, dd),
         cos, sin, cos, sin)

def t_once(f, args, iters=6):
    out = f(*args); jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    return (time.perf_counter() - t0) / iters

# correctness first
want = prod(q, k, v).reshape(B*G, N, dd)
got = fB(*argsB)
err = float(jnp.max(jnp.abs(got[:, :NV].astype(jnp.float32) - want[:, :NV].astype(jnp.float32))))
print("max abs err:", err, flush=True)

ratios, a_ts, b_ts = [], [], []
for r in range(10):
    ta = t_once(prod, (q, k, v))
    tb = t_once(fB, argsB)
    a_ts.append(ta*1e3); b_ts.append(tb*1e3); ratios.append(tb/ta)
    print(f"round {r}: prod {ta*1e3:5.1f} ms  pvT {tb*1e3:5.1f} ms  ratio {tb/ta:.3f}", flush=True)
ratios.sort(); a_ts.sort(); b_ts.sort()
print("median ratio pvT/prod:", round(ratios[len(ratios)//2], 3),
      " median ms:", round(a_ts[len(a_ts)//2],1), "vs", round(b_ts[len(b_ts)//2],1))

"""Model-level A/B: fat-unroll attention (probe20 winner, 2112 fps) vs
BATCHED-DOT attention — unpacked (B,H,N,64) projections (XLA pays whatever
transpose it pays) feeding a kernel that runs ONE batched dot_general over
all NH heads per program, rope applied in-kernel on the 3D block.
probe16 measured this kernel body at 2.0 ms/layer norope (the best seen);
the open question is the model-side transpose tax.

Run: python benchmarks/attn_probes/probe21_batched_model_256.py [batch]
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

from cbas_tpu.models import vit
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.vit import PRESETS

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
H = W = 256
N_ITERS = 3
ROUNDS = 7
_NEG_INF = -1e30

enc = FrameEncoder(
    "facebook/dinov3-vitb16", cfg=PRESETS["dinov3-vitb16"],
    random_init=True, compute_dtype=jnp.bfloat16,
)
rng = np.random.default_rng(0)
plane = jax.device_put(jnp.asarray(rng.integers(0, 256, (BATCH, H, W), np.uint8)))
_orig_attention = vit._attention


def make_batched_kernel(BH, N, d, n_valid, nh):
    def kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref):
        # blocks: q/k/v/o (nh, N, d); rope tables (N, d), q-side pre-scaled
        q3 = q_ref[...]
        k3 = k_ref[...]
        v3 = v_ref[...]
        c = cos_ref[...]
        s_ = sin_ref[...]

        def rot_half(t):
            return jnp.concatenate([-t[..., d // 2:], t[..., :d // 2]], axis=-1)

        # in-kernel rope, vectorized across all nh heads (broadcast tables);
        # q tables pre-scaled by softmax scale, k tables by sqrt(d) to undo
        q3 = q3 * c[None].astype(q3.dtype) + rot_half(q3) * s_[None].astype(q3.dtype)
        ck = (c * jnp.asarray(d ** 0.5, c.dtype))[None]
        sk = (s_ * jnp.asarray(d ** 0.5, s_.dtype))[None]
        k3 = k3 * ck.astype(k3.dtype) + rot_half(k3) * sk.astype(k3.dtype)

        s = jax.lax.dot_general(q3, k3, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
        s = jnp.where(col < n_valid, s, _NEG_INF)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=2, keepdims=True)
        rowv = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
        v3 = jnp.where(rowv < n_valid, v3, jnp.zeros((), v3.dtype))
        o = jax.lax.dot_general(p.astype(v3.dtype), v3, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / den
        o_ref[...] = o.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, N, d), jnp.bfloat16),
        grid=(BH // nh, 1),
        in_specs=[
            pl.BlockSpec((nh, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nh, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )


def batched_attention(params, prefix, x, cfg, rope=None, n_valid=None):
    B, N, D = x.shape
    Hh, hd = cfg.num_heads, cfg.head_dim
    names, biases, out_name, out_bias = vit._attn_param_table(cfg, prefix)

    def proj_heads(name, has_bias):
        w = params[f"{name}.weight"].astype(x.dtype)
        y = jnp.einsum("bnD,hdD->bhnd", x, w.reshape(Hh, hd, D))
        if has_bias:
            y = y + params[f"{name}.bias"].astype(x.dtype).reshape(Hh, hd)[None, :, None, :]
        return y.reshape(B * Hh, N, hd)

    q = proj_heads(names[0], biases[0])
    k = proj_heads(names[1], biases[1])
    v = proj_heads(names[2], biases[2])

    cos_full, sin_full = vit._full_rope_tables(rope, cfg.num_prefix_tokens, N)
    scale = hd ** -0.5
    kern = make_batched_kernel(B * Hh, N, hd, n_valid if n_valid else N, 16)
    ctx = kern(q, k, v, jnp.asarray(cos_full * scale, jnp.float32),
               jnp.asarray(sin_full * scale, jnp.float32))

    wo = params[f"{out_name}.weight"].astype(x.dtype)
    out = jnp.einsum("bhnd,Dhd->bnD", ctx.reshape(B, Hh, N, hd), wo.reshape(D, Hh, hd))
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(x.dtype)
    return out


# fat-unroll attention (probe20's winner, with static unroll)
def make_fat_kernel(B, N, D, d, n_valid, gb):
    G = D // 128

    def kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, o_ref):
        def rot_half(t):
            return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

        cq = cosq_ref[...]
        sq = sinq_ref[...]
        sqd = jnp.asarray(d ** 0.5, jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        live = row < n_valid

        def one_head(qh, kh, vh):
            qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
            kh = kh * (cq * sqd).astype(kh.dtype) + rot_half(kh) * (sq * sqd).astype(kh.dtype)
            vh = jnp.where(live, vh, jnp.zeros((), vh.dtype))
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

        jax.lax.fori_loop(0, gb, item, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
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


def fat_attention(params, prefix, x, cfg, rope=None, n_valid=None):
    B, N, D = x.shape
    hd = cfg.head_dim
    names, biases, out_name, out_bias = vit._attn_param_table(cfg, prefix)
    xf = x.reshape(B * N, D)

    def proj(name, has_bias):
        y = xf @ params[f"{name}.weight"].T.astype(x.dtype)
        if has_bias:
            y = y + params[f"{name}.bias"].astype(x.dtype)
        return y.reshape(B, N, D)

    q = proj(names[0], biases[0])
    k = proj(names[1], biases[1])
    v = proj(names[2], biases[2])
    cos_full, sin_full = vit._full_rope_tables(rope, cfg.num_prefix_tokens, N)
    scale = hd ** -0.5
    kern = make_fat_kernel(B, N, D, hd, n_valid if n_valid else N, 4)
    ctx = kern(q, k, v, jnp.asarray(cos_full * scale, jnp.float32),
               jnp.asarray(sin_full * scale, jnp.float32))
    out = ctx.reshape(B * N, D) @ params[f"{out_name}.weight"].T.astype(x.dtype)
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(x.dtype)
    return out.reshape(B, N, D)


def build(fn):
    if fn is not None:
        vit._attention = fn
    try:
        prog = enc._build(BATCH, H, W)
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        vit._attention = _orig_attention


progs = {
    "prod": build(None),
    "fat": build(fat_attention),
    "batched": build(batched_attention),
}

a = np.asarray(jax.device_get(progs["prod"](enc._device_params, plane))).astype(np.float32)
for nm in ("fat", "batched"):
    b = np.asarray(jax.device_get(progs[nm](enc._device_params, plane))).astype(np.float32)
    print(f"max|diff| prod vs {nm} = {np.max(np.abs(a - b)):.3e}")


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn()
    jax.device_get(out[0, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in progs}
for rnd in range(ROUNDS):
    for name in progs:
        results[name].append(timed(lambda n=name: progs[n](enc._device_params, plane)))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.1f}" for n in results))

print(f"\n=== batch {BATCH}, {H}x{W}, medians/{ROUNDS} ===")
for name in progs:
    s = sorted(results[name])
    m = s[len(s) // 2]
    print(f"{name:8s}: {m:7.2f} ms  ({BATCH / m * 1e3:7.1f} fps)")

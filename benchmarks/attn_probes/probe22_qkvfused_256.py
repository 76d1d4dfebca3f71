"""QKV-single-matmul + fat kernel, and batch sweep, at 256x256.

probe21: fat (3 flat projections -> (B,N,768) -> static-unrolled pair kernel
-> flat out-proj) = 2242 fps vs prod 2061. Here the three projections merge
into ONE (B*N,768)@(768,2304) matmul; the kernel reads q/k/v from lane
offsets g*128 / 768+g*128 / 1536+g*128 of a single (gb,N,2304) block —
x is read once instead of three times per layer.

Run: python benchmarks/attn_probes/probe22_qkvfused_256.py
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

H = W = 256
N_ITERS = 3
ROUNDS = 7
_NEG_INF = -1e30

enc = FrameEncoder(
    "facebook/dinov3-vitb16", cfg=PRESETS["dinov3-vitb16"],
    random_init=True, compute_dtype=jnp.bfloat16,
)
rng = np.random.default_rng(0)
_orig_attention = vit._attention


def make_qkv_kernel(B, N, D, d, n_valid, gb):
    G = D // 128

    def kernel(qkv_ref, cosq_ref, sinq_ref, o_ref):
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
                q2 = qkv_ref[pl.ds(i, 1), :, g * 128:g * 128 + 128][0]
                k2 = qkv_ref[pl.ds(i, 1), :, D + g * 128:D + g * 128 + 128][0]
                v2 = qkv_ref[pl.ds(i, 1), :, 2 * D + g * 128:2 * D + g * 128 + 128][0]
                o_a = one_head(q2[:, :d], k2[:, :d], v2[:, :d])
                o_b = one_head(q2[:, d:], k2[:, d:], v2[:, d:])
                o_ref[pl.ds(i, 1), :, g * 128:g * 128 + 128] = jnp.concatenate(
                    [o_a, o_b], axis=1).astype(o_ref.dtype)[None]
            return 0

        jax.lax.fori_loop(0, gb, item, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        grid=(B // gb, 1),
        in_specs=[
            pl.BlockSpec((gb, N, 3 * D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )


def qkv_attention(params, prefix, x, cfg, rope=None, n_valid=None):
    B, N, D = x.shape
    hd = cfg.head_dim
    names, biases, out_name, out_bias = vit._attn_param_table(cfg, prefix)
    xf = x.reshape(B * N, D)

    wq = params[f"{names[0]}.weight"].astype(x.dtype)
    wk = params[f"{names[1]}.weight"].astype(x.dtype)
    wv = params[f"{names[2]}.weight"].astype(x.dtype)
    wqkv = jnp.concatenate([wq, wk, wv], axis=0)        # (3D, D)
    bias_parts = []
    for name, has in zip(names, biases):
        bias_parts.append(params[f"{name}.bias"].astype(x.dtype) if has
                          else jnp.zeros((D,), x.dtype))
    bqkv = jnp.concatenate(bias_parts, axis=0)

    qkv = (xf @ wqkv.T + bqkv).reshape(B, N, 3 * D)

    cos_full, sin_full = vit._full_rope_tables(rope, cfg.num_prefix_tokens, N)
    scale = hd ** -0.5
    kern = make_qkv_kernel(B, N, D, hd, n_valid if n_valid else N, 4)
    ctx = kern(qkv, jnp.asarray(cos_full * scale, jnp.float32),
               jnp.asarray(sin_full * scale, jnp.float32))
    out = ctx.reshape(B * N, D) @ params[f"{out_name}.weight"].T.astype(x.dtype)
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(x.dtype)
    return out.reshape(B, N, D)


def build(fn, batch):
    plane = jax.device_put(jnp.asarray(rng.integers(0, 256, (batch, H, W), np.uint8)))
    if fn is not None:
        vit._attention = fn
    try:
        prog = enc._build(batch, H, W)
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog, plane
    finally:
        vit._attention = _orig_attention
        enc._geometry_cache.clear()


progs = {
    "prod,384": build(None, 384),
    "qkv,384": build(qkv_attention, 384),
    "qkv,512": build(qkv_attention, 512),
    "qkv,768": build(qkv_attention, 768),
}

a = np.asarray(jax.device_get(progs["prod,384"][0](enc._device_params, progs["prod,384"][1]))).astype(np.float32)
b = np.asarray(jax.device_get(progs["qkv,384"][0](enc._device_params, progs["qkv,384"][1]))).astype(np.float32)
print(f"max|diff| prod vs qkv = {np.max(np.abs(a - b)):.3e}")


def timed(prog, plane):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = prog(enc._device_params, plane)
    jax.device_get(out[0, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in progs}
for rnd in range(ROUNDS):
    for name, (prog, plane) in progs.items():
        results[name].append(timed(prog, plane))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.1f}" for n in results))

print(f"\n=== {H}x{W}, medians/{ROUNDS} ===")
for name, (prog, plane) in progs.items():
    s = sorted(results[name])
    m = s[len(s) // 2]
    batch = plane.shape[0]
    print(f"{name:10s}: {m:7.2f} ms  ({batch / m * 1e3:7.1f} fps)")

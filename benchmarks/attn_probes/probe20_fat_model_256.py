"""Model-level A/B: production packed-einsum attention vs FAT-LANE attention
(plain flat projections -> (B,N,768) row-major -> probe18 kernel with
in-kernel pair slicing -> flat out-projection). The fat kernel body costs
~0.6 ms/layer more (probe18/19) but eliminates XLA's 3 pre-call copies and
the packed einsum layouts entirely. Whole-model interleaved medians decide.

Run: python benchmarks/attn_probes/probe20_fat_model_256.py [batch]
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


def make_fat_kernel(B, N, D, d, n_valid, gb, pvt):
    G = D // 128

    def kernel(q_ref, k_ref, v_ref, cosq_ref, sinq_ref, o_ref):
        def rot_half(t):
            return jnp.concatenate([-t[:, d // 2:], t[:, : d // 2]], axis=1)

        cq = cosq_ref[...]
        sq = sinq_ref[...]
        row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        live = row < n_valid
        col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        live_col = col < n_valid

        def one_head(qh, kh, vh):
            qh = qh * cq.astype(qh.dtype) + rot_half(qh) * sq.astype(qh.dtype)
            kh = kh * cosq_ref[...].astype(kh.dtype) * (d ** 0.5) + rot_half(kh) * (
                sinq_ref[...].astype(kh.dtype) * (d ** 0.5))
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
    # fold softmax scale into the q-side tables (kernel multiplies k tables
    # by sqrt(d) to undo — net: q scaled by 1/sqrt(d), k unscaled)
    kern = make_fat_kernel(B, N, D, hd, n_valid if n_valid else N, 4, True)
    ctx = kern(q, k, v, jnp.asarray(cos_full * scale, jnp.float32),
               jnp.asarray(sin_full * scale, jnp.float32))

    out = ctx.reshape(B * N, D) @ params[f"{out_name}.weight"].T.astype(x.dtype)
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(x.dtype)
    return out.reshape(B, N, D)


def build(name):
    if name == "fat":
        vit._attention = fat_attention
    try:
        prog = enc._build(BATCH, H, W)
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        vit._attention = _orig_attention


progs = {"prod": build("prod"), "fat": build("fat")}

a = np.asarray(jax.device_get(progs["prod"](enc._device_params, plane))).astype(np.float32)
b = np.asarray(jax.device_get(progs["fat"](enc._device_params, plane))).astype(np.float32)
print(f"max|diff| prod vs fat = {np.max(np.abs(a - b)):.3e} (rel {np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-9):.2e})")


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
    print(f"{name:6s}: {m:7.2f} ms  ({BATCH / m * 1e3:7.1f} fps)")

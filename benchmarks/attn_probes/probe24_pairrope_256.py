"""Pair-wide rope in the fat kernel: apply rope ONCE per 128-lane pair
(tiled tables + packed rotate-half) instead of twice per 64-lane half —
halves the count of small rope ops. Model-level A/B at ViT-B 256x256.

Run: python benchmarks/attn_probes/probe24_pairrope_256.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.vit import PRESETS
from cbas_tpu.ops import flash_attention as fa

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
_orig_kernel = fa._fat_kernel


def _fat_kernel_pairrope(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    *, scale, n_valid, gb, n_pairs, use_rope, pvt, unroll,
):
    n_pad = q_ref.shape[1]
    d = 64

    if use_rope:
        cq2 = jnp.concatenate([cosq_ref[...] * scale] * 2, axis=1)
        sq2 = jnp.concatenate([sinq_ref[...] * scale] * 2, axis=1)
        ck2 = jnp.concatenate([cosk_ref[...]] * 2, axis=1)
        sk2 = jnp.concatenate([sink_ref[...]] * 2, axis=1)

    def rot_half_packed(t):
        h = d // 2
        return jnp.concatenate(
            [-t[:, h:d], t[:, :h], -t[:, d + h:], t[:, d:d + h]], axis=1)

    if n_valid < n_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        live = row < n_valid
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        live_col = col < n_valid
    else:
        live = live_col = None

    def one_head(qh, kh, vh):
        if live is not None:
            vh = jnp.where(live, vh, jnp.zeros((), vh.dtype))
        if pvt:
            st = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if live is not None:
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
        if live_col is not None:
            s = jnp.where(live_col, s, _NEG_INF)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        den = jnp.sum(p, axis=1, keepdims=True)
        return jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) / den

    def pair_body(i, g):
        off = g * 128
        q2 = q_ref[pl.ds(i, 1), :, pl.ds(off, 128)][0]
        k2 = k_ref[pl.ds(i, 1), :, pl.ds(off, 128)][0]
        v2 = v_ref[pl.ds(i, 1), :, pl.ds(off, 128)][0]
        if use_rope:
            q2 = q2 * cq2.astype(q2.dtype) + rot_half_packed(q2) * sq2.astype(q2.dtype)
            k2 = k2 * ck2.astype(k2.dtype) + rot_half_packed(k2) * sk2.astype(k2.dtype)
        else:
            q2 = q2 * jnp.asarray(scale, q2.dtype)
        o_a = one_head(q2[:, :d], k2[:, :d], v2[:, :d])
        o_b = one_head(q2[:, d:], k2[:, d:], v2[:, d:])
        o_ref[pl.ds(i, 1), :, pl.ds(off, 128)] = jnp.concatenate(
            [o_a, o_b], axis=1).astype(o_ref.dtype)[None]

    def item(i, _):
        if unroll:
            for g in range(n_pairs):
                pair_body(i, g)
        else:
            def pair(g, _2):
                pair_body(i, g)
                return 0
            jax.lax.fori_loop(0, n_pairs, pair, 0)
        return 0

    jax.lax.fori_loop(0, gb, item, 0)


def build(variant):
    if variant == "pairrope":
        fa._fat_kernel = _fat_kernel_pairrope
    try:
        prog = enc._build(BATCH, H, W)
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        fa._fat_kernel = _orig_kernel
        enc._geometry_cache.clear()


progs = {"prod(fat)": build("prod"), "pairrope": build("pairrope")}
a = np.asarray(jax.device_get(progs["prod(fat)"](enc._device_params, plane))).astype(np.float32)
b = np.asarray(jax.device_get(progs["pairrope"](enc._device_params, plane))).astype(np.float32)
print(f"max|diff| = {np.max(np.abs(a - b)):.3e}")


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
    print(f"{name:10s}: {m:7.2f} ms  ({BATCH / m * 1e3:7.1f} fps)")

"""Model-level A/B at 256x256: production _attention (in-kernel rope, pvt)
vs PRE-ROPED variant — rope+scale applied in XLA on the packed (B,G,N,128)
projections (a lane permute that fuses into the einsum epilogue), kernel
runs rope-free in the std orientation (probe16: std,norope marginal 2.33 ms
vs prod 3.64). Whole-model interleaved medians.

Run: python benchmarks/attn_probes/probe17_prerope_model_256.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from cbas_tpu.models import vit
from cbas_tpu.models.encoder import FrameEncoder
from cbas_tpu.models.vit import PRESETS
from cbas_tpu.ops import flash_attention as fa

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
H = W = 256
N_ITERS = 3
ROUNDS = 7

enc = FrameEncoder(
    "facebook/dinov3-vitb16", cfg=PRESETS["dinov3-vitb16"],
    random_init=True, compute_dtype=jnp.bfloat16,
)
rng = np.random.default_rng(0)
plane = jax.device_put(jnp.asarray(rng.integers(0, 256, (BATCH, H, W), np.uint8)))

_orig_attention = vit._attention


def prerope_attention(params, prefix, x, cfg, rope=None, n_valid=None):
    """_attention with rope applied in XLA on the packed layout."""
    B, N, D = x.shape
    Hh, hd = cfg.num_heads, cfg.head_dim
    names, biases, out_name, out_bias = vit._attn_param_table(cfg, prefix)

    def proj_heads(name, has_bias, pack=2):
        w = params[f"{name}.weight"].astype(x.dtype)
        h_local = w.shape[0] // hd
        y = jnp.einsum("bnD,hdD->bhnd", x, w.reshape(h_local // pack, pack * hd, D))
        if has_bias:
            y = y + params[f"{name}.bias"].astype(x.dtype).reshape(
                h_local // pack, pack * hd)[None, :, None, :]
        return y

    scale = hd ** -0.5
    q = proj_heads(names[0], biases[0])
    k = proj_heads(names[1], biases[1])
    v = proj_heads(names[2], biases[2])

    cos_full, sin_full = vit._full_rope_tables(rope, cfg.num_prefix_tokens, N)
    c2 = jnp.concatenate([cos_full, cos_full], axis=1).astype(x.dtype)[None, None]
    s2 = jnp.concatenate([sin_full, sin_full], axis=1).astype(x.dtype)[None, None]
    h2 = hd // 2

    def rot_half_packed(t):
        return jnp.concatenate(
            [-t[..., h2:hd], t[..., :h2], -t[..., hd + h2:], t[..., hd:hd + h2]],
            axis=-1,
        )

    q = (q * c2 + rot_half_packed(q) * s2) * jnp.asarray(scale, x.dtype)
    k = k * c2 + rot_half_packed(k) * s2

    ctx = fa.fused_attention_packed(q, k, v, 1.0, n_valid=n_valid, pvt=False)

    wo = params[f"{out_name}.weight"].astype(x.dtype)
    h_out = wo.shape[1] // hd
    out = jnp.einsum("bgnp,Dgp->bnD", ctx, wo.reshape(D, h_out // 2, 2 * hd))
    if out_bias:
        out = out + params[f"{out_name}.bias"].astype(x.dtype)
    return out


def build(name):
    if name == "prerope":
        vit._attention = prerope_attention
    try:
        prog = enc._build(BATCH, H, W)
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        vit._attention = _orig_attention


progs = {"prod": build("prod"), "prerope": build("prerope")}

# numeric check (identical math to fp-roundoff: rope in bf16 outside vs
# fp32-tables in-kernel -> expect ~1e-2 on random-init activations)
a = np.asarray(jax.device_get(progs["prod"](enc._device_params, plane))).astype(np.float32)
b = np.asarray(jax.device_get(progs["prerope"](enc._device_params, plane))).astype(np.float32)
print(f"max|diff| prod vs prerope = {np.max(np.abs(a - b)):.3e}  "
      f"(rel {np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-9):.2e})")


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

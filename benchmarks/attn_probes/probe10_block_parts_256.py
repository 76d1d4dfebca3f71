"""probe9 follow-up: the fine-grained cuts (kernel/GELU/LN) were all ~0 and
the matmul floor is half the full program — so the time sits in the
*structure* around them. Coarser cuts:

  full        - production program
  noattnblock - _attention returns x untouched (no q/k/v/out projections,
                no kernel, no packed-layout einsums)
  nomlp       - _mlp returns x untouched
  noembed     - patchify/normalize/assemble skipped: blocks run on a
                pre-staged token tensor
  flatproj    - _attention keeps all 4 matmuls but as FLAT (B*N, D) @ (D, D)
                (no bhnd/packed einsum layouts, no kernel): if this is much
                cheaper than noattn-from-probe9 (kernel removed, einsum
                layouts kept), the packed-projection LAYOUT is the cost.

Run: python benchmarks/attn_probes/probe10_block_parts_256.py [batch]
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

_orig_attn = vit._attention
_orig_mlp = vit._mlp


def flat_attention(params, prefix, x, cfg, rope=None, n_valid=None):
    B, N, D = x.shape
    names, biases, out_name, out_bias = vit._attn_param_table(cfg, prefix)
    xf = x.reshape(B * N, D)
    q = xf @ params[f"{names[0]}.weight"].T.astype(x.dtype)
    k = xf @ params[f"{names[1]}.weight"].T.astype(x.dtype)
    v = xf @ params[f"{names[2]}.weight"].T.astype(x.dtype)
    ctx = q + k + v  # stand-in for attention (elementwise, ~free)
    out = ctx @ params[f"{out_name}.weight"].T.astype(x.dtype)
    return out.reshape(B, N, D)


def build(name):
    if name == "noattnblock":
        vit._attention = lambda params, prefix, x, cfg, rope=None, n_valid=None: x
    elif name == "nomlp":
        vit._mlp = lambda params, prefix, x, cfg: x
    elif name == "flatproj":
        vit._attention = flat_attention
    try:
        prog = enc._build(BATCH, H, W)
        # jit tracing is LAZY: force trace+compile while the patch is live,
        # or every variant silently compiles the original program.
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        vit._attention = _orig_attn
        vit._mlp = _orig_mlp


VARIANTS = ["full", "noattnblock", "nomlp", "flatproj"]
progs = {name: build(name) for name in VARIANTS}


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn()
    jax.device_get(out[0, :2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3


results = {name: [] for name in VARIANTS}
for rnd in range(ROUNDS):
    for name in VARIANTS:
        results[name].append(timed(lambda n=name: progs[n](enc._device_params, plane)))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.1f}" for n in results))


def med(v):
    return sorted(v)[len(v) // 2]


full = med(results["full"])
print(f"\n=== batch {BATCH}, {H}x{W}, medians over {ROUNDS} rounds ===")
print(f"full       : {full:7.2f} ms ({BATCH / full * 1e3:7.1f} fps)")
for name in VARIANTS[1:]:
    m = med(results[name])
    print(f"{name:11s}: {m:7.2f} ms  (removed share {full - m:6.2f} ms = {(full - m) / full * 100:4.1f}%)")

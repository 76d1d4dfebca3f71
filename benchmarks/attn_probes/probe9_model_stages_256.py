"""Whole-MODEL stage isolation at the production-default 256x256 geometry.

r3 left the 256x256 row at ~51% MFU (2141 fps ViT-B) with the probe
attention spent only on the 480p kernel. This probe attributes the
non-matmul time of the full encode program at N=261->272 (ViT-B, batch 384)
by re-jitting the production program with one stage at a time neutralized:

  full     - the production program (FrameEncoder._build)
  noattn   - fused_attention_packed/fused_attention return q (projections
             and out-proj kept): isolates the Pallas kernel's share
  nogelu   - jax.nn.gelu -> identity: the MLP activation VPU share
  noln     - _ln -> identity: the 2N+1 fp32 LayerNorm passes
  noscale  - layer_scale multiplies folded out (elementwise share)
  ideal    - the bare matmul chain at the same shapes (per-layer: q/k/v/out
             projections + MLP up/down as flat (B*N, .) matmuls), the
             MXU-only floor the 93%-MFU 480p result implies

Interleaved rounds (each variant timed once per round, medians reported):
single-run A/Bs cannot resolve <10% deltas under the relay's drift
(docs/TPU.md measurement lesson).

Run: python benchmarks/attn_probes/probe9_model_stages_256.py [batch]
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
plane = jax.device_put(
    jnp.asarray(rng.integers(0, 256, (BATCH, H, W), np.uint8))
)

_orig_packed = fa.fused_attention_packed
_orig_plain = fa.fused_attention
_orig_gelu = jax.nn.gelu
_orig_ln = vit._ln


def build(name):
    """Fresh jit of the production program with one stage neutralized."""
    if name == "noattn":
        fa.fused_attention_packed = lambda q, k, v, *a, **kw: q
        fa.fused_attention = lambda q, k, v, *a, **kw: q
    elif name == "nogelu":
        jax.nn.gelu = lambda x, approximate=True: x
    elif name == "noln":
        vit._ln = lambda params, nm, x, eps: x
    try:
        prog = enc._build(BATCH, H, W)
        # jit tracing is LAZY: force trace+compile while the patch is live,
        # or every variant silently compiles the original program.
        jax.device_get(prog(enc._device_params, plane)[0, :2])
        return prog
    finally:
        fa.fused_attention_packed = _orig_packed
        fa.fused_attention = _orig_plain
        jax.nn.gelu = _orig_gelu
        vit._ln = _orig_ln


def build_ideal():
    """The bare matmul chain: per layer 4 DxD projections + 2 MLP matmuls
    over the flat (B*N_pad, D) activations, 12 layers. No LN/attention/
    transposes — the MXU-only floor."""
    cfg = enc.cfg
    D, inter = cfg.hidden_size, cfg.intermediate_size
    n_pad = 272
    r = np.random.default_rng(1)
    ws = {
        "qkv": jnp.asarray(r.standard_normal((3 * D, D)) * 0.02, jnp.bfloat16),
        "out": jnp.asarray(r.standard_normal((D, D)) * 0.02, jnp.bfloat16),
        "up": jnp.asarray(r.standard_normal((inter, D)) * 0.02, jnp.bfloat16),
        "down": jnp.asarray(r.standard_normal((D, inter)) * 0.02, jnp.bfloat16),
    }

    def f(ws, x):
        for _ in range(12):
            h = x @ ws["qkv"].T
            x = x + h[:, :D] @ ws["out"].T
            x = x + (x @ ws["up"].T) @ ws["down"].T
        return x

    jf = jax.jit(f)
    x0 = jnp.asarray(r.standard_normal((BATCH * n_pad, D)) * 0.1, jnp.bfloat16)
    return jf, ws, x0


VARIANTS = ["full", "noattn", "nogelu", "noln"]
progs = {}
for name in VARIANTS:
    progs[name] = build(name)
ideal_f, ideal_w, ideal_x = build_ideal()

# warm the ideal program's compile (variants were compiled inside build())
jax.device_get(ideal_f(ideal_w, ideal_x)[0, :2])


def timed(fn):
    t0 = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = fn()
    jax.device_get(out[0, :2] if out.ndim > 1 else out[:2])
    return (time.perf_counter() - t0) / N_ITERS * 1e3  # ms/batch


results = {name: [] for name in VARIANTS + ["ideal"]}
for rnd in range(ROUNDS):
    for name in VARIANTS:
        results[name].append(timed(lambda n=name: progs[n](enc._device_params, plane)))
    results["ideal"].append(timed(lambda: ideal_f(ideal_w, ideal_x)))
    print(f"round {rnd}: " + "  ".join(f"{n}={results[n][-1]:.1f}" for n in results))


def med(v):
    s = sorted(v)
    return s[len(s) // 2]


full = med(results["full"])
print(f"\n=== batch {BATCH}, {H}x{W}, medians over {ROUNDS} rounds ===")
print(f"full   : {full:7.2f} ms  ({BATCH / full * 1e3:7.1f} fps)")
for name in VARIANTS[1:]:
    m = med(results[name])
    print(f"{name:7s}: {m:7.2f} ms  (stage share {full - m:6.2f} ms = {(full - m) / full * 100:4.1f}%)")
im = med(results["ideal"])
print(f"ideal  : {im:7.2f} ms  (matmul floor; unattributed residual "
      f"{full - im - sum(full - med(results[n]) for n in VARIANTS[1:]):6.2f} ms)")

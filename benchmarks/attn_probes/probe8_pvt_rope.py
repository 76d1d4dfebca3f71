"""Is RoPE the pvt discriminator? A/B at (N=336 rope) and (N=272 no-rope)."""
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from cbas_tpu.ops import flash_attention as fa

def t_once(f, args, iters=16):
    out = f(*args); jax.device_get(out.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(out.ravel()[:2])
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
for name, (B, G, N, NV, rope) in [
    ("n336+rope", (480, 6, 336, 329, True)),
    ("n272-norope", (384, 6, 272, 261, False)),
    ("n1216-norope", (320, 6, 1216, 1205, False)),
]:
    d, dd = 64, 128
    q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
    kw = {}
    if rope:
        kw["rope_cos"] = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        kw["rope_sin"] = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    fs = jax.jit(lambda q, k, v, NV=NV, kw=kw: fa.fused_attention_packed(q, k, v, 64**-0.5, n_valid=NV, pvt=False, **kw))
    fp = jax.jit(lambda q, k, v, NV=NV, kw=kw: fa.fused_attention_packed(q, k, v, 64**-0.5, n_valid=NV, pvt=True, **kw))
    ratios = []
    for r in range(7):
        ts = t_once(fs, (q, k, v)); tp = t_once(fp, (q, k, v))
        ratios.append(tp/ts)
    ratios.sort()
    print(f"{name}: median ratio {ratios[3]:.3f} ({[f'{x:.3f}' for x in ratios]})", flush=True)

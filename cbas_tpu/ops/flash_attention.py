"""Fused multi-head attention Pallas kernel for the ViT encoder.

The XLA-default attention materializes the (B, H, N, N) score tensor in HBM —
at 480p (N=1205, fp32 softmax) that is gigabytes of traffic per batch and the
dominant cost of the encode path. For ViT-scale sequences (N <= ~4k) the whole
K/V block of one (batch, head) fits comfortably in VMEM, so this kernel
computes each query tile's full score row on-chip:

    HBM reads:  Q, K, V once      HBM writes: O once
    VMEM:       one (block_q, N_pad) fp32 score tile + K/V

Exact (not online) softmax in fp32 — numerics match the unfused reference to
float32 roundoff, which keeps the HF-parity guarantees of models/vit.py.
Forward-only: the encoder is frozen in this pipeline (reference:
backend/cbas.py:669-670), so no custom VJP is needed; the jnp path remains
available for any differentiable use.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
_NEG_INF = -1e30


def _attn_kernel(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    *, scale: float, n_valid: int, gh: int, use_rope: bool,
):
    # q/o: (gh, block_q, d), k/v: (gh, n_pad, d) — gh heads per program.
    # Matmuls stay in the input dtype (bf16 on TPU -> full-rate MXU) with fp32
    # accumulation; softmax statistics are fp32, matching the unfused path.
    n_pad = k_ref.shape[1]
    d = q_ref.shape[-1]

    if n_valid < n_pad:
        # Padded-key mask. K/V arrive as Pallas edge blocks (the caller never
        # materializes a 128-multiple pad in HBM), so lanes >= n_valid hold
        # arbitrary bits — mask with a select (NaN-proof), not an additive
        # bias (NaN + -inf = NaN would poison the row's softmax).
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        key_live = col < n_valid
        # v's edge rows must be zeroed as well: the masked columns of p are
        # exactly 0, but 0 * NaN = NaN in the PV contraction.
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        v_live = row < n_valid
    else:
        key_live = v_live = None

    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2 :], t[:, : d // 2]], axis=1)

    def head(g, _):
        # fori_loop (not unrolled) so the fp32 score buffer is allocated once
        # and reused across heads instead of gh times on the VMEM stack.
        q = q_ref[pl.ds(g, 1)][0]
        k = k_ref[pl.ds(g, 1)][0]
        v = v_ref[pl.ds(g, 1)][0]
        if v_live is not None:
            v = jnp.where(v_live, v, jnp.zeros((), v.dtype))
        if use_rope:
            # RoPE applied on-chip: the roped q/k never round-trip to HBM.
            # The softmax scale folds into the (block_q, d) q tile here —
            # scaling the (block_q, n_pad) score tile instead costs n_pad/d
            # times more VPU work, and the N^2-tile VPU passes are the
            # kernel's real ceiling at d=64 (scores MXU runs half-depth).
            q = q * (cosq_ref[...] * scale).astype(q.dtype) + rot_half(q) * (
                sinq_ref[...] * scale
            ).astype(q.dtype)
            k = k * cosk_ref[...].astype(k.dtype) + rot_half(k) * sink_ref[...].astype(k.dtype)
        else:
            q = q * jnp.asarray(scale, q.dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, n_pad) fp32, scale pre-folded into q

        s_masked = s if key_live is None else jnp.where(key_live, s, _NEG_INF)
        s_stable = s_masked - jnp.max(s_masked, axis=1, keepdims=True)
        p = jnp.exp(s_stable)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[pl.ds(g, 1)] = o.astype(o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, gh, head, 0)


def _packed_attn_kernel(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    *, scale: float, n_valid: int, gp: int, use_rope: bool, pvt: bool,
):
    """Head-PAIR packed attention: q/o are (gp, block_q, 2d), k/v are
    (gp, n_pad, 2d) with two heads side by side on the minor dim.

    Why: with d=64 the minor dimension fills only half of the 128-lane tile,
    so every HBM<->VMEM DMA moves 2x the bytes (lane-padded tiles) — measured
    as the kernel floor at 480p (DMA ~39 ms of a ~53 ms kernel). Packing two
    heads into one 128-wide block restores full-lane DMA; the attention math
    still runs per head on 64-lane slices (exact, parity-tested). Measured
    whole-kernel at ViT-B 480p batch 320: 49.2 ms unpacked -> 36.4 ms packed
    -> 20.4 ms packed + tight-q + edge-block K/V (the DMA floor).

    ``pvt`` computes scores TRANSPOSED: s_t = k @ q^T (keys on sublanes,
    queries on lanes), softmax over the sublane axis, then out^T = v^T @ p_t.
    The PV contraction depth becomes n_keys (full MXU depth, vs d=64 = half)
    and its output is (d, block_q) = full-lane width (vs 64-wide). Measured
    at ViT-B 480p (n=1216): 23.4 -> 21.4 ms whole-kernel (median of 10
    interleaved A/B rounds, ratio 0.912) — the PV matmul was the last
    half-rate MXU pass. The extra v^T / out^T relayouts are VMEM-local and
    amortize over the n_pad-deep contraction; measured wins at every
    production and small-N geometry (see _use_pvt for the table).
    """
    n_pad = k_ref.shape[1]
    d = q_ref.shape[-1] // 2

    if n_valid < n_pad:
        # K/V arrive as Pallas edge blocks (rows >= the array's true length
        # are never materialized in HBM), so masked lanes hold arbitrary
        # bits: select (NaN-proof), not an additive bias, and zero v's edge
        # rows (0 * NaN = NaN would poison the PV contraction otherwise).
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        key_live = col < n_valid
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        v_live = row < n_valid
    else:
        key_live = v_live = None

    def rot_half(t):
        return jnp.concatenate([-t[:, d // 2 :], t[:, : d // 2]], axis=1)

    def rope_qk(q, k, cq, sq):
        if use_rope:
            # scale pre-folded into the q-side tables by the caller loop
            q = q * cq.astype(q.dtype) + rot_half(q) * sq.astype(q.dtype)
            k = k * cosk_ref[...].astype(k.dtype) + rot_half(k) * sink_ref[...].astype(k.dtype)
        else:
            q = q * jnp.asarray(scale, q.dtype)
        return q, k

    def one_head(q, k, v, cq, sq):
        q, k = rope_qk(q, k, cq, sq)
        if v_live is not None:
            v = jnp.where(v_live, v, jnp.zeros((), v.dtype))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_masked = s if key_live is None else jnp.where(key_live, s, _NEG_INF)
        s_stable = s_masked - jnp.max(s_masked, axis=1, keepdims=True)
        p = jnp.exp(s_stable)
        denom = jnp.sum(p, axis=1, keepdims=True)
        return jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom

    def one_head_pvt(q, k, v, cq, sq):
        # Same math, transposed orientation: keys become the sublane axis of
        # the score tile, so the key mask is a row select here (v_live).
        q, k = rope_qk(q, k, cq, sq)
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (n_pad, block_q) fp32
        if v_live is not None:
            st = jnp.where(v_live, st, _NEG_INF)
            v = jnp.where(v_live, v, jnp.zeros((), v.dtype))
        st = st - jnp.max(st, axis=0, keepdims=True)
        p = jnp.exp(st)
        denom = jnp.sum(p, axis=0, keepdims=True)
        # out^T = v^T @ p: n_pad-deep contraction, (d, block_q) output
        return jax.lax.dot_general(
            v.swapaxes(0, 1), p.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom

    def pair(g, _):
        q2 = q_ref[pl.ds(g, 1)][0]
        k2 = k_ref[pl.ds(g, 1)][0]
        v2 = v_ref[pl.ds(g, 1)][0]
        if use_rope:
            cq = cosq_ref[...] * scale
            sq = sinq_ref[...] * scale
        else:
            cq = sq = None
        if pvt:
            ot_a = one_head_pvt(q2[:, :d], k2[:, :d], v2[:, :d], cq, sq)
            ot_b = one_head_pvt(q2[:, d:], k2[:, d:], v2[:, d:], cq, sq)
            ot = jnp.concatenate([ot_a, ot_b], axis=0)  # (2d, block_q)
            o_ref[pl.ds(g, 1)] = ot.swapaxes(0, 1).astype(o_ref.dtype)[None]
        else:
            o_a = one_head(q2[:, :d], k2[:, :d], v2[:, :d], cq, sq)
            o_b = one_head(q2[:, d:], k2[:, d:], v2[:, d:], cq, sq)
            o_ref[pl.ds(g, 1)] = jnp.concatenate([o_a, o_b], axis=1).astype(
                o_ref.dtype
            )[None]
        return 0

    jax.lax.fori_loop(0, gp, pair, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tight_query_block(n: int, block_q: int, itemsize: int):
    """(block_q, q_pad) with the query padding tightened to the sublane tile.

    Only the lane (minor) dimension needs 128 alignment; queries are a
    sublane dimension, whose granule is 8 rows of 4 bytes (16 for bf16). So
    a single-block kernel can pad N=261 -> 272 instead of 384 — at the
    production 256x256 geometry that removes 30% wasted score rows and flips
    the fused-vs-XLA contest (9.6 ms vs 11.8 ms); at 480p (1205 -> 1216 vs
    1280) it saves another ~3%.
    """
    granule = 16 if itemsize == 2 else 8  # (8, 128) fp32 / (16, 128) bf16 tiles
    if block_q >= n:
        q_pad = _round_up(n, granule)
        return q_pad, q_pad
    return block_q, _round_up(n, block_q)


# VMEM budget for picking tile sizes, accounting for Pallas's double
# buffering of every in/out block plus the fp32 score tile (+bf16 p copy).
# Mosaic's default scoped-VMEM limit rejects estimates ≳13 MB, so the
# pallas_call below raises vmem_limit_bytes to _vmem_limit() and the picker
# budgets against that. Sized per device generation: v4+ chips have 128 MiB
# VMEM per core (48 MB budget leaves ~2x headroom over the estimate for
# Mosaic's own scratch); v2/v3 have only ~16 MiB, where the v4 tiles would
# fail to compile instead of falling back — clamp the budget there.
_VMEM_CAPS: Optional[tuple] = None


def _vmem_caps() -> tuple:
    """(budget_bytes, limit_bytes) for the attached device generation."""
    global _VMEM_CAPS
    if _VMEM_CAPS is None:
        budget, limit = 48 * 1024 * 1024, 100 * 1024 * 1024
        try:
            kind = jax.devices()[0].device_kind.lower()
            if "v2" in kind or "v3" in kind:
                budget, limit = 6 * 1024 * 1024, 14 * 1024 * 1024
        except Exception:
            pass
        env = os.environ.get("CBAS_ATTN_VMEM_BUDGET")
        if env:
            budget = int(env)
        _VMEM_CAPS = (budget, max(limit, budget))
    return _VMEM_CAPS


def _vmem_estimate(gh: int, block_q: int, n_pad: int, d: int, itemsize: int) -> int:
    qo = 2 * 2 * gh * block_q * d * itemsize       # q + o, double buffered
    kv = 2 * 2 * gh * n_pad * d * itemsize         # k + v, double buffered
    scores = block_q * n_pad * (4 + itemsize)      # fp32 s + low-precision p
    return qo + kv + scores


def _key_pad(n: int, itemsize: int) -> int:
    """Key/value row count the kernel runs at.

    Pallas only requires the SUBLANE (row) dim of a K/V block to divide by 8
    (or equal the array dim), so when the caller's token count is already
    sublane-granule aligned — models/vit.py pads tokens to the granule once
    after embedding — the K/V blocks can be array-exact: no Pallas edge
    blocks, no dead score columns beyond the model pad. Full-model ViT-B
    measurement (bench_device_program): +2% at 256x256 (score width 272 vs
    384 removes 29% of QK/softmax columns), neutral at 480p (1216 vs 1280 is
    only 5% of columns and the schedule was already edge-block-exact there).
    """
    if os.environ.get("CBAS_ATTN_EDGE"):  # measurement override: old rounding
        return _round_up(n, 128)
    granule = 16 if itemsize == 2 else 8
    if n % granule == 0:
        return n
    return _round_up(n, 128)


def _choose_tiles(bh: int, n_pad: int, d: int, itemsize: int):
    """(heads_per_program, block_q) maximizing per-program work under VMEM.

    ViT attention tiles are small, so per-program launch overhead dominates
    unless several heads run per program. block_q is drawn from divisors of
    n_pad (no query padding waste).
    """
    # Largest query block first: K/V are loaded once per program, so fewer
    # query blocks per (batch, head-group) means less HBM K/V traffic.
    # Measured on ViT-B @ 480p (n_pad 1280): block_q=1280 runs ~2% faster
    # than 640 regardless of the head-group size, and the full-block layouts
    # are the ones far from Mosaic's scoped-VMEM compile limits.
    env_gh, env_bq = os.environ.get("CBAS_ATTN_GH"), os.environ.get("CBAS_ATTN_BQ")
    if env_gh and env_bq:  # measurement override (bench experiments)
        gh, bq = int(env_gh), int(env_bq)
        # A non-dividing override would floor-truncate the grid and silently
        # leave trailing head groups unwritten (garbage output rows).
        if bh % gh or n_pad % bq:
            raise ValueError(
                f"CBAS_ATTN_GH/BQ override ({gh},{bq}) must divide "
                f"batch*heads={bh} and padded tokens={n_pad}"
            )
        return (gh, bq)
    budget = _vmem_caps()[0]
    granule = 16 if itemsize == 2 else 8
    block_qs = [n_pad] + [b for b in range(128, n_pad, 128) if n_pad % b == 0]
    # exact (non-128-multiple) n_pad: offer granule-aligned halvings too, so
    # VMEM-tight configs can still tile the query dim
    half = n_pad // 2
    while half >= 128:
        if n_pad % half == 0 and half % granule == 0:
            block_qs.append(half)
        half //= 2
    for block_q in sorted(set(block_qs), reverse=True):
        for gh in (16, 12, 8, 6, 4, 3, 2, 1):
            if bh % gh:
                continue
            if _vmem_estimate(gh, block_q, n_pad, d, itemsize) > budget:
                continue
            return (gh, block_q)
    return (1, min(128, n_pad))


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 0,
    interpret: bool = False,
    n_valid: Optional[int] = None,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over (B, H, N, d) tensors; returns (B, H, N, d) in q's dtype.

    ``n_valid`` masks trailing key rows when the caller pre-padded the token
    dimension (model-level padding). ``rope_cos``/``rope_sin`` are full-length
    (N, d) tables (identity rows for prefix tokens) applied to q and k inside
    the kernel — the roped tensors never materialize in HBM.

    No tensor is ever padded in HBM: the kernel's K/V (and any trailing
    query) blocks are Pallas edge blocks over the exact-size arrays, and the
    kernel masks the dead lanes (key select + v-row zeroing). Several heads
    run per program (ViT attention tiles are small, so per-program launch
    overhead dominates otherwise). d should be a multiple of 8 (ViT head
    dims are 64/128).
    """
    B, H, N, d = q.shape
    if jax.default_backend() == "cpu" or os.environ.get("CBAS_PALLAS_INTERPRET"):
        # Mosaic kernels only compile for TPU. The env override covers mixed
        # environments where the default backend is TPU but the program is
        # being lowered for CPU devices (e.g. the virtual-mesh dry run).
        interpret = True
    if n_valid is None:
        n_valid = N
    n_pad = _key_pad(N, q.dtype.itemsize)
    gh, auto_block_q = _choose_tiles(B * H, n_pad, d, q.dtype.itemsize)
    block_q = min(block_q or auto_block_q, n_pad)
    block_q, q_pad = _tight_query_block(N, block_q, q.dtype.itemsize)

    qf = q.reshape(B * H, N, d)
    kf = k.reshape(B * H, N, d)
    vf = v.reshape(B * H, N, d)

    use_rope = rope_cos is not None
    if use_rope:
        def pad_rows(t, target):
            return t if t.shape[0] == target else jnp.pad(
                t, ((0, target - t.shape[0]), (0, 0))
            )

        cos_q = pad_rows(rope_cos.astype(jnp.float32), q_pad)
        sin_q = pad_rows(rope_sin.astype(jnp.float32), q_pad)
        cos_k = pad_rows(rope_cos.astype(jnp.float32), n_pad)
        sin_k = pad_rows(rope_sin.astype(jnp.float32), n_pad)
    else:
        cos_q = jnp.ones((q_pad, d), jnp.float32)
        sin_q = jnp.zeros((q_pad, d), jnp.float32)
        cos_k = jnp.ones((n_pad, d), jnp.float32)
        sin_k = jnp.zeros((n_pad, d), jnp.float32)

    grid = (B * H // gh, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, n_valid=n_valid, gh=gh, use_rope=use_rope
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, N, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gh, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gh, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * q_pad * n_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=B * H * q_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_caps()[1]),
        interpret=interpret,
    )(qf, kf, vf, cos_q, sin_q, cos_k, sin_k)

    return out.reshape(B, H, N, d)


def _use_pvt(use_rope: bool, n_pad: int, n_pairs: int = 6) -> bool:
    """Whether the transposed-PV orientation wins at this geometry.

    Measured on TPU v5e, ViT-B-shaped whole-kernel medians (interleaved A/B,
    pvt/standard time ratio). WITH RoPE (the dinov3 families) pvt wins at
    every token count: N=80 -> 0.949, N=128 -> 0.923, N=208 -> 0.890,
    N=272 (256x256 production) -> 0.855, N=336 -> 0.784, N=1216 (480p
    production) -> 0.912. WITHOUT RoPE (dinov2: learned pos-embeds) the
    short-N kernels are VPU-bound — rope's per-pair VPU work is what hides
    pvt's extra relayouts and sublane reduces — so pvt only wins once the
    MXU passes are deep enough to dominate: N=272 -> 1.034, N=336 -> 1.089
    (the dinov2-base 256x256 geometry, where pvt cost -1.8% whole-model),
    N=1216 -> 0.876.

    r5 ViT-S finding (probe27 campaign): at 3 head pairs (d_model 384) and
    short N the ratio flips EVEN WITH rope — whole-model 8448 vs 8142 fps
    at 256x256 batch 1600 with the standard orientation (pvt's per-head
    relayout overhead amortizes over fewer MXU passes); at N=1216 pvt
    still wins (1426 vs 1383), and ViT-B/L short-N stay neutral-to-pvt
    (3010/3014, 917/910).

    Rule: with rope, pvt unless (n_pairs <= 3 and n_pad < 512); without,
    n_pad >= 512. ``CBAS_ATTN_PVT`` (0/1) forces either orientation for
    measurement.
    """
    env = os.environ.get("CBAS_ATTN_PVT")
    if env is not None:
        # same falsy spellings as CBAS_TPU_FUSED_ATTENTION (models/vit.py)
        return env.lower() not in ("", "0", "false", "no", "off")
    if use_rope:
        return not (n_pairs <= 3 and n_pad < 512)
    return n_pad >= 512


def fused_attention_packed(
    q2: jnp.ndarray,
    k2: jnp.ndarray,
    v2: jnp.ndarray,
    scale: float,
    block_q: int = 0,
    interpret: bool = False,
    n_valid: Optional[int] = None,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    pvt: Optional[bool] = None,
) -> jnp.ndarray:
    """Attention over head-PAIR packed (B, G, N, 2d) tensors (G = H/2, two
    heads side by side on the minor dim); returns the same packed layout.

    This is the production layout for d=64 backbones: the 128-wide minor dim
    keeps HBM DMA at full lane width (the plain (B, H, N, 64) layout's tiles
    are half lane-padding, which was the measured kernel floor at 480p —
    -26% whole-kernel vs :func:`fused_attention` at ViT-B 480p). The caller
    projects straight into this layout (a free reshape of the QKV weights),
    so no transpose materializes. ``rope_cos``/``rope_sin`` stay (N, d) —
    both packed heads share the per-token tables.
    """
    B, G, N, dd = q2.shape
    if jax.default_backend() == "cpu" or os.environ.get("CBAS_PALLAS_INTERPRET"):
        interpret = True
    if n_valid is None:
        n_valid = N
    n_pad = _key_pad(N, q2.dtype.itemsize)
    # same VMEM geometry as the unpacked kernel at equal head count: gh heads
    # of width d == gp pairs of width 2d
    gh, auto_block_q = _choose_tiles(B * G * 2, n_pad, dd // 2, q2.dtype.itemsize)
    gp = max(1, gh // 2)
    while (B * G) % gp:
        gp -= 1
    block_q = min(block_q or auto_block_q, n_pad)
    block_q, q_pad = _tight_query_block(N, block_q, q2.dtype.itemsize)

    # No HBM pads: K/V (and any trailing query) blocks are Pallas edge
    # blocks over the exact-size arrays; the kernel masks the dead lanes.
    qf = q2.reshape(B * G, N, dd)
    kf = k2.reshape(B * G, N, dd)
    vf = v2.reshape(B * G, N, dd)

    d = dd // 2
    use_rope = rope_cos is not None
    if use_rope:
        def pad_rows(t, target):
            return t if t.shape[0] == target else jnp.pad(
                t, ((0, target - t.shape[0]), (0, 0))
            )

        cos_q = pad_rows(rope_cos.astype(jnp.float32), q_pad)
        sin_q = pad_rows(rope_sin.astype(jnp.float32), q_pad)
        cos_k = pad_rows(rope_cos.astype(jnp.float32), n_pad)
        sin_k = pad_rows(rope_sin.astype(jnp.float32), n_pad)
    else:
        cos_q = jnp.ones((q_pad, d), jnp.float32)
        sin_q = jnp.zeros((q_pad, d), jnp.float32)
        cos_k = jnp.ones((n_pad, d), jnp.float32)
        sin_k = jnp.zeros((n_pad, d), jnp.float32)

    if pvt is None:
        pvt = _use_pvt(use_rope, n_pad, G)
    grid = (B * G // gp, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _packed_attn_kernel, scale=scale, n_valid=n_valid, gp=gp,
            use_rope=use_rope, pvt=pvt,
        ),
        out_shape=jax.ShapeDtypeStruct((B * G, N, dd), q2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gp, block_q, dd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, n_pad, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, n_pad, dd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gp, block_q, dd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * G * 2 * q_pad * n_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=B * G * 2 * q_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_caps()[1]),
        interpret=interpret,
    )(qf, kf, vf, cos_q, sin_q, cos_k, sin_k)

    return out.reshape(B, G, N, dd)


def _fat_kernel(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    *, scale: float, n_valid: int, gb: int, n_pairs: int, use_rope: bool,
    pvt: bool, unroll: bool,
):
    """Attention over row-major (gb, N, D) blocks — D = heads*64 with each
    head PAIR a 128-aligned lane band. See :func:`fused_attention_fat`."""
    n_pad = q_ref.shape[1]
    d = 64

    if use_rope:
        # PAIR-WIDE rope: tables tiled to the 128-lane pair width and the
        # rotate-half expressed as one 4-slice lane permute, so rope runs
        # once per pair on full-width tiles instead of twice on 64-lane
        # halves. Bit-exact vs the per-half form; whole-model -8% at ViT-B
        # 256x256 (benchmarks/attn_probes/probe24). Scale folds into the
        # q-side tables.
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
            # Static unroll lets Mosaic emit static tile loads and stream the
            # per-pair matmuls back to back: -11% whole-kernel at N=272 vs
            # fori. Only chosen when the stacked score buffers fit VMEM.
            for g in range(n_pairs):
                pair_body(i, g)
        else:
            def pair(g, _2):
                pair_body(i, g)
                return 0
            jax.lax.fori_loop(0, n_pairs, pair, 0)
        return 0

    jax.lax.fori_loop(0, gb, item, 0)


def fused_attention_fat(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    n_valid: Optional[int] = None,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    pvt: Optional[bool] = None,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Attention over FLAT row-major (B, N, D) tensors, D = num_heads * 64.

    This is the production layout for d=64 backbones since r4: the plain 2-D
    projection matmul's output (B*N, D) row-major IS the kernel's operand
    layout (a free bitcast), so XLA inserts **no copies** around the custom
    call — the packed (B, G, N, 128) einsum layout measurably cost one full
    copy of q, k AND v per layer (HLO-verified, ~1.2 ms/layer at ViT-B
    256x256). Each head pair occupies a 128-aligned lane band, sliced
    in-kernel (Mosaic requires 128-multiple lane offsets; the 64-lane halves
    split in-register exactly like the packed kernel). Whole-model: 2061 ->
    2242 fps at ViT-B 256x256 batch 384, 498 -> 508 fps at 480p batch 320,
    153 -> 155 fps ViT-L 480p (benchmarks/attn_probes/probe18-23).

    Returns None when this kernel cannot serve the geometry (head_dim != 64,
    odd pair count, or VMEM would overflow) — callers fall back to
    :func:`fused_attention_packed`.
    """
    B, N, D = q.shape
    if D % 128 != 0:
        return None
    if jax.default_backend() == "cpu" or os.environ.get("CBAS_PALLAS_INTERPRET"):
        interpret = True
    if n_valid is None:
        n_valid = N
    itemsize = q.dtype.itemsize
    n_pairs = D // 128
    use_rope = rope_cos is not None
    if pvt is None:
        pvt = _use_pvt(use_rope, N, n_pairs)

    budget, limit = _vmem_caps()
    # block VMEM: 4 tensors (q/k/v/o) double-buffered
    per_item = 4 * 2 * N * D * itemsize
    # static unroll keeps n_pairs score buffers live; only when they fit
    unroll = n_pairs * N * N * 4 <= 4 * 1024 * 1024
    # Scratch that the block-spec accounting above does NOT see (r4 advisor):
    # the fp32 score + probability buffers ((N, N) each, live concurrently
    # within one_head; the pair's two heads run sequentially so they share,
    # but the static unroll keeps each pair's buffers live) and the four
    # widened (N, 128) fp32 rope tables. Omitting them let unusual
    # geometries pass this check and then fail Mosaic VMEM allocation at
    # outer-jit compile time — an exception, not the documented
    # None-fallback contract.
    scratch = (n_pairs if unroll else 1) * 2 * N * N * 4
    scratch += 4 * N * 128 * 4
    gb = 1
    # gb caps at 4: larger groups never measured faster (gb=6 at B=384 and
    # gb=4 at B=384 both read 2.76k fps ViT-B 256x256 — the batch dimension
    # itself, not gb, drives the 320/448-vs-384 differences) and smaller
    # blocks leave more VMEM headroom. CBAS_ATTN_FAT_GB overrides for
    # measurement.
    env_gb = os.environ.get("CBAS_ATTN_FAT_GB")
    if env_gb:
        gb = int(env_gb)
        if B % gb or gb * per_item + scratch > budget:
            raise ValueError(f"CBAS_ATTN_FAT_GB={gb} invalid for B={B}, N={N}")
    else:
        for cand in (4, 3, 2):
            if B % cand == 0 and cand * per_item + scratch <= budget // 2:
                gb = cand
                break
    if per_item + scratch > budget:
        return None  # geometry too large for full-N blocks; packed path tiles

    d = 64
    if use_rope:
        cos_q = rope_cos.astype(jnp.float32)
        sin_q = rope_sin.astype(jnp.float32)
    else:
        cos_q = jnp.ones((N, d), jnp.float32)
        sin_q = jnp.zeros((N, d), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _fat_kernel, scale=scale, n_valid=n_valid, gb=gb, n_pairs=n_pairs,
            use_rope=use_rope, pvt=pvt, unroll=unroll,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B // gb, 1),
        in_specs=[
            pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * (D // 64) * N * N * 64,
            bytes_accessed=4 * B * N * D * itemsize,
            transcendentals=B * (D // 64) * N * N,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(q, k, v, cos_q, sin_q, cos_q, sin_q)
    return out


def use_fat_attention() -> bool:
    """Whether the flat-layout kernel is enabled (default yes; env A/B)."""
    env = os.environ.get("CBAS_ATTN_FAT")
    if env is not None:
        return env.lower() not in ("", "0", "false", "no", "off")
    return True


def reference_attention(q, k, v, scale):
    """The unfused jnp path (fp32 softmax), for fallback and parity tests."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)



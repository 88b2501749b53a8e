"""Pallas TPU flash attention WITH attention-probability dropout (fwd + bwd).

The reference trains with torch F.scaled_dot_product_attention(dropout_p=0.1)
(src/model/layers/attn.py:122-126). The XLA online-softmax recurrence
(ops/attention.py flash_attention_xla) is the only dropout-capable path we had
on TPU, and it materializes every [S, chunk] logits block in HBM — measured
~0.6s forward (and ~3x that through the remat backward) for the 10-layer
16K-token processor of the 500K-node recipe, ~40x off compute bound. This
kernel keeps the logits tiles in VMEM, draws the dropout mask from the TPU
core's own PRNG (zero HBM mask traffic), and the custom backward regenerates
the *identical* mask by reseeding with the same (seed, head, q-block,
kv-block) counters.

Math, with P = softmax(scale * Q K^T) and M = keep/(1-r):
    O_i     = sum_j P_ij M_ij V_j
    delta_i = dO_i . O_i            (= sum_k P_ik M_ik dO_i.V_k)
    dS_ij   = P_ij (M_ij (dO_i . V_j) - delta_i)
    dQ = scale dS K     dK = scale dS^T Q     dV = (P M)^T dO
so the dropout backward needs exactly the same residuals (out, lse) as
standard flash attention — only the in-kernel mask regeneration differs.

The softmax denominator uses pre-dropout probabilities (torch semantics:
dropout is applied to the normalized attention weights).

Testing: pltpu.prng_seed has no CPU/interpret lowering, so the kernels also
accept a precomputed uint32 bits tensor ('bits' variant) which interpret-mode
tests drive against a dense oracle sharing the same mask; the RNG variant is
validated on the real chip by bench.py's regression checks (determinism,
rate, vjp dot-test).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bits_to_keep(bits, rate: float):
    # keep iff bits >= floor(rate * 2^32); matches ops/attention._fast_keep_mask.
    # rate >= 1.0 would otherwise keep with prob 1/2^32 (bits == max), so it
    # short-circuits to an all-drop mask (ADVICE r3).
    if rate >= 1.0:
        return jnp.zeros(bits.shape, dtype=jnp.bool_)
    thresh = np.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    return bits >= thresh


def _bits16_to_keep(bits16, rate: float):
    # 16-bit variant: keep iff bits >= floor(rate * (2^16-1)). Quantizes the
    # keep probability to 1/65536 (drop prob error < 1.6e-5 at rate 0.1).
    # rate >= 1.0 short-circuits to all-drop (the threshold rule alone would
    # keep with prob 1/65536 — 65536x likelier than the 32-bit quirk).
    if rate >= 1.0:
        return jnp.zeros(bits16.shape, dtype=jnp.bool_)
    thresh = np.uint16(min(max(rate, 0.0), 1.0) * 65535.0)
    # compare in i32: real Mosaic rejects cmpi on packed i16 vectors
    # ("Target does not support this comparison", vector<8x128x2xi16>) —
    # the u16->i32 widen (extui) is supported and the compare is exact
    return bits16.astype(jnp.int32) >= jnp.int32(thresh)


def _draw_keep(pltpu, rate: float, block_q: int, block_k: int, prng16: bool):
    """Draw a [block_q, block_k] keep-mask from the in-core PRNG.

    prng16 halves the PRNG word generation: draw [block_q//2, block_k] uint32
    and bitcast to [block_q, block_k] uint16 (Mosaic bitcast between bitwidths
    scales the second-minor dim), then threshold in 16 bits. The attention
    kernels are VPU-bound on [bq, bk] elementwise work (CLAUDE.md round-3
    profile) and the PRNG draw is the widest single [bq, bk] term, so this is
    the main dropout-overhead lever. NOTE: the 16- and 32-bit masks are
    DIFFERENT streams; fwd/bwd consistency holds because both read the same
    static flag (custom_vjp static arg)."""
    if prng16:
        raw = pltpu.prng_random_bits((block_q // 2, block_k))
        bits16 = pltpu.bitcast(raw, jnp.uint16)
        return _bits16_to_keep(bits16, rate)
    bits = pltpu.bitcast(pltpu.prng_random_bits((block_q, block_k)), jnp.uint32)
    return _bits_to_keep(bits, rate)


def _kv_col_mask(ik, block_k, seq_k):
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    return col < seq_k


def _seed_block(pltpu, seed_ref, bh, iq, ik, n_q, n_k):
    """Seed the in-core PRNG for one (batch*head, q-block, kv-block) cell.

    libtpu caps prng_seed at 2 words, so the block counter is mixed into the
    key words here: an odd multiplier is a bijection mod 2^32, so distinct
    blocks always get distinct first words. Forward and both backward kernels
    call this with the same coordinates -> identical mask."""
    ctr = (bh * n_q + iq) * n_k + ik
    h = ctr * jnp.int32(-1640531527)  # 0x9E3779B9, odd => bijective
    pltpu.prng_seed(seed_ref[0] ^ h, seed_ref[1] + ctr)


def _make_fwd_kernel(scale, rate, block_q, block_k, n_q, n_k, seq_k, use_rng, kv_tail,
                     prng16=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, *refs):
        if use_rng:
            q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
            bits_ref = None
        else:
            bits_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
        bh = pl.program_id(0)
        iq = pl.program_id(1)
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # q arrives PRESCALED by `scale` (folded in by the impl wrappers):
        # multiplying [S, D] once outside the kernel removes a full [bq, bk]
        # VPU multiply per tile from this kernel and both backward kernels
        # (the attention kernels are VPU-bound on [bq, bk] elementwise ops
        # at D=32 — see CLAUDE.md round-3 backward breakdown)
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if kv_tail:
            s = jnp.where(_kv_col_mask(ik, block_k, seq_k), s, -jnp.inf)
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        if kv_tail:
            p = jnp.where(_kv_col_mask(ik, block_k, seq_k), p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * alpha + p.sum(axis=1, keepdims=True)
        if rate > 0.0:
            if use_rng:
                _seed_block(pltpu, seed_ref, bh, iq, ik, n_q, n_k)
                keep = _draw_keep(pltpu, rate, block_q, block_k, prng16)
            else:
                keep = _bits_to_keep(bits_ref[0, 0, 0], rate)
            pd = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        else:
            pd = p
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ik == n_k - 1)
        def _finish():
            l = jnp.maximum(l_scr[...], 1e-30)
            o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
            lse = m_scr[...] + jnp.log(l)  # [bq, 1]
            lse_ref[...] = lse.reshape(1, block_q, 1)

    return kernel


def _make_bwd_dq_kernel(scale, rate, block_q, block_k, n_q, n_k, seq_k, use_rng, kv_tail,
                        prng16=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, *refs):
        if use_rng:
            q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dq_ref, dq_scr = refs
            bits_ref = None
        else:
            bits_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dq_ref, dq_scr = refs
        bh = pl.program_id(0)
        iq = pl.program_id(1)
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _init():
            dq_scr[...] = jnp.zeros_like(dq_scr)

        # q is prescaled by `scale` (see _make_fwd_kernel); s needs no
        # per-element multiply. dq = scale * (ds @ k) still needs the factor
        # (it is d/dq of the UNSCALED q), applied on the cheap [bq, D] block.
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = dl_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        if kv_tail:
            p = jnp.where(_kv_col_mask(ik, block_k, seq_k), p, 0.0)
        dpv = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            if use_rng:
                _seed_block(pltpu, seed_ref, bh, iq, ik, n_q, n_k)
                keep = _draw_keep(pltpu, rate, block_q, block_k, prng16)
            else:
                keep = _bits_to_keep(bits_ref[0, 0, 0], rate)
            dpv = jnp.where(keep, dpv * (1.0 / (1.0 - rate)), 0.0)
        ds = p * (dpv - delta)
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        @pl.when(ik == n_k - 1)
        def _finish():
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    return kernel


def _make_bwd_dkv_kernel(scale, rate, block_q, block_k, n_q, n_k, seq_k, use_rng, kv_tail,
                         prng16=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, *refs):
        if use_rng:
            q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dk_ref, dv_ref, dk_scr, dv_scr = refs
            bits_ref = None
        else:
            (bits_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
             dk_ref, dv_ref, dk_scr, dv_scr) = refs
        bh = pl.program_id(0)
        ik = pl.program_id(1)  # kv block is the OUTER loop here
        iq = pl.program_id(2)

        @pl.when(iq == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = dl_ref[0]
        # q prescaled by `scale`: s needs no [bq, bk] multiply, and
        # dk = scale * (ds^T @ q) picks the factor up from q itself.
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        if kv_tail:
            p = jnp.where(_kv_col_mask(ik, block_k, seq_k), p, 0.0)
        dpv = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            if use_rng:
                # same (seed, bh, iq, ik) counters as the forward -> same mask
                _seed_block(pltpu, seed_ref, bh, iq, ik, n_q, n_k)
                keep = _draw_keep(pltpu, rate, block_q, block_k, prng16)
            else:
                keep = _bits_to_keep(bits_ref[0, 0, 0], rate)
            # one select, two multiplies (vs two of each): the selected
            # multiplier km is shared by pm and dpv
            km = jnp.where(keep, 1.0 / (1.0 - rate), 0.0)
            pm = p * km
            dpv = dpv * km
        else:
            pm = p
        dv_scr[...] += jax.lax.dot_general(
            pm.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dpv - delta)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(iq == n_q - 1)
        def _finish():
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

    return kernel


def _make_bwd_fused_kernel(scale, rate, block_q, block_k, n_q, n_k, seq_k, use_rng, kv_tail,
                           prng16=False):
    """Single-pass backward: dk/dv accumulate in VMEM scratch (kv-block outer
    loop), and the ENTIRE per-head dq lives in a [Sq, D] f32 VMEM scratch
    (dynamic-slice accumulation, written back once per head). The two-kernel
    backward computes s, p and dO.V^T twice per (q,kv) tile; at D=32 those
    [bq, bk] VPU ops (exp, selects) dominate over the MXU work, so fusing
    nearly halves the backward. Caller guards Sq*D*4 against VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, *refs):
        if use_rng:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
             dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr) = refs
            bits_ref = None
        else:
            (bits_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
             dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr) = refs
        bh = pl.program_id(0)
        ik = pl.program_id(1)  # kv block OUTER
        iq = pl.program_id(2)

        @pl.when(jnp.logical_and(ik == 0, iq == 0))
        def _init_dq():
            dq_scr[...] = jnp.zeros_like(dq_scr)

        @pl.when(iq == 0)
        def _init_dkv():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = dl_ref[0]
        # q prescaled by `scale` (folded in by _flash_bwd_impl): no [bq, bk]
        # multiply for s, and dk = ds^T @ q_scaled already carries the factor
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        if kv_tail:
            p = jnp.where(_kv_col_mask(ik, block_k, seq_k), p, 0.0)
        dpv = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            if use_rng:
                # same (seed, bh, iq, ik) counters as the forward -> same mask
                _seed_block(pltpu, seed_ref, bh, iq, ik, n_q, n_k)
                keep = _draw_keep(pltpu, rate, block_q, block_k, prng16)
            else:
                keep = _bits_to_keep(bits_ref[0, 0, 0], rate)
            # one select, two multiplies (vs two of each): the selected
            # multiplier km is shared by pm and dpv
            km = jnp.where(keep, 1.0 / (1.0 - rate), 0.0)
            pm = p * km
            dpv = dpv * km
        else:
            pm = p
        ds = p * (dpv - delta)
        row = pl.ds(iq * block_q, block_q)
        dq_scr[row, :] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv_scr[...] += jax.lax.dot_general(
            pm.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(iq == n_q - 1)
        def _finish_dkv():
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

        @pl.when(jnp.logical_and(ik == n_k - 1, iq == n_q - 1))
        def _finish_dq():
            dq_ref[0] = dq_scr[...]

    return kernel


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_fwd_impl(q, k, v, seed, bits, rate, block_q, block_k, interpret, prng16=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    Skv = k.shape[2]
    BH = B * H
    use_rng = bits is None
    scale = 1.0 / (D ** 0.5)
    # fold the softmax scale into q ONCE on [S, D] (f32 multiply, cast back):
    # the kernels then skip a full [bq, bk] VPU multiply per tile in the
    # forward AND both backward passes (they are VPU-bound at D=32)
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = _pad_to(qs.reshape(BH, S, D), block_q, 1)
    kp = _pad_to(k.reshape(BH, Skv, D), block_k, 1)
    vp = _pad_to(v.reshape(BH, Skv, D), block_k, 1)
    Sq, Sk = qp.shape[1], kp.shape[1]
    n_q, n_k = Sq // block_q, Sk // block_k
    kv_tail = Sk != Skv

    kern = _make_fwd_kernel(scale, rate, block_q, block_k, n_q, n_k, Skv, use_rng, kv_tail,
                            prng16)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [seed]
    if not use_rng:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, block_q, block_k), lambda bh, iq, ik: (bh, iq, ik, 0, 0))
        )
        inputs.append(bits)
    in_specs += [
        pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, D), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    inputs += [qp, kp, vp]
    out, lse = pl.pallas_call(
        kern,
        grid=(BH, n_q, n_k),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return out[:, :S].reshape(B, H, S, D), lse[:, :S, 0].reshape(B, H, S)


def _flash_bwd_impl(q, k, v, seed, bits, out, lse, do, rate, block_q, block_k, interpret,
                    prng16=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    Skv = k.shape[2]
    BH = B * H
    use_rng = bits is None
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [B,H,S]

    scale = 1.0 / (D ** 0.5)
    # same scale-folding as the forward: the bwd kernels recompute
    # s = q_scaled @ k^T with no per-element multiply, and dk inherits the
    # factor from q_scaled (dq applies it explicitly on [bq, D])
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = _pad_to(qs.reshape(BH, S, D), block_q, 1)
    dop = _pad_to(do.reshape(BH, S, D), block_q, 1)
    # padded q rows: lse=+big makes p = exp(s - big) = 0 -> no contribution
    lsep = _pad_to(lse.reshape(BH, S), block_q, 1)
    if lsep.shape[1] != S:
        rowpad = jnp.arange(lsep.shape[1]) >= S
        lsep = jnp.where(rowpad[None, :], 1e30, lsep)
    dlp = _pad_to(delta.reshape(BH, S), block_q, 1)
    lsep = lsep[..., None]
    dlp = dlp[..., None]
    kp = _pad_to(k.reshape(BH, Skv, D), block_k, 1)
    vp = _pad_to(v.reshape(BH, Skv, D), block_k, 1)
    Sq, Sk = qp.shape[1], kp.shape[1]
    n_q, n_k = Sq // block_q, Sk // block_k
    kv_tail = Sk != Skv

    def specs(extra):
        base = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if not use_rng:
            base.append(
                pl.BlockSpec((1, 1, 1, block_q, block_k), extra)
            )
        return base

    bits_idx = lambda bh, iq, ik: (bh, iq, ik, 0, 0)
    bits_idx_kv = lambda bh, ik, iq: (bh, iq, ik, 0, 0)  # same (iq, ik) cell

    # fused single-pass backward: the whole per-head dq must fit VMEM
    if Sq * D * 4 <= 4 * 1024 * 1024 and os.environ.get("GAOT_ATTN_BWD_FUSED", "1") == "1":
        fused_kern = _make_bwd_fused_kernel(
            scale, rate, block_q, block_k, n_q, n_k, Skv, use_rng, kv_tail, prng16
        )
        fused_inputs = [seed] + ([] if use_rng else [bits]) + [
            qp, kp, vp, dop, lsep, dlp,
        ]
        dq, dk, dv = pl.pallas_call(
            fused_kern,
            grid=(BH, n_k, n_q),
            in_specs=specs(bits_idx_kv) + [
                pl.BlockSpec((1, block_q, D), lambda bh, ik, iq: (bh, iq, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
                pl.BlockSpec((1, block_q, D), lambda bh, ik, iq: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bh, ik, iq: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bh, ik, iq: (bh, iq, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, Sq, D), lambda bh, ik, iq: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BH, Sq, D), jnp.float32),
                jax.ShapeDtypeStruct((BH, Sk, D), k.dtype),
                jax.ShapeDtypeStruct((BH, Sk, D), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((Sq, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
            # the [Sq, D] dq scratch + the [bq, bk] tile temporaries exceed
            # the 16MB default scoped-vmem soft limit; v5e has 128MB physical
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*fused_inputs)
        return (
            dq[:, :S].reshape(B, H, S, D).astype(q.dtype),
            dk[:, :Skv].reshape(B, H, Skv, D),
            dv[:, :Skv].reshape(B, H, Skv, D),
        )

    dq_kern = _make_bwd_dq_kernel(scale, rate, block_q, block_k, n_q, n_k, Skv, use_rng,
                                  kv_tail, prng16)
    dq_inputs = [seed] + ([] if use_rng else [bits]) + [qp, kp, vp, dop, lsep, dlp]
    dq = pl.pallas_call(
        dq_kern,
        grid=(BH, n_q, n_k),
        in_specs=specs(bits_idx) + [
            pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(*dq_inputs)

    dkv_kern = _make_bwd_dkv_kernel(scale, rate, block_q, block_k, n_q, n_k, Skv, use_rng,
                                    kv_tail, prng16)
    dkv_inputs = [seed] + ([] if use_rng else [bits]) + [qp, kp, vp, dop, lsep, dlp]
    dk, dv = pl.pallas_call(
        dkv_kern,
        grid=(BH, n_k, n_q),
        in_specs=specs(bits_idx_kv) + [
            pl.BlockSpec((1, block_q, D), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
            pl.BlockSpec((1, block_q, D), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, ik, iq: (bh, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, ik, iq: (bh, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Sk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=interpret,
    )(*dkv_inputs)

    return (
        dq[:, :S].reshape(B, H, S, D),
        dk[:, :Skv].reshape(B, H, Skv, D),
        dv[:, :Skv].reshape(B, H, Skv, D),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_dropout(q, k, v, seed, bits, rate, block_q, block_k, interpret, prng16):
    out, _ = _flash_fwd_impl(q, k, v, seed, bits, rate, block_q, block_k, interpret, prng16)
    return out


def _flash_dropout_fwd(q, k, v, seed, bits, rate, block_q, block_k, interpret, prng16):
    out, lse = _flash_fwd_impl(q, k, v, seed, bits, rate, block_q, block_k, interpret, prng16)
    return out, (q, k, v, seed, bits, out, lse)


def _flash_dropout_bwd(rate, block_q, block_k, interpret, prng16, res, do):
    q, k, v, seed, bits, out, lse = res
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, seed, bits, out, lse, do, rate, block_q, block_k, interpret, prng16
    )
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    dbits = None if bits is None else np.zeros(bits.shape, dtype=jax.dtypes.float0)
    return (dq, dk, dv, dseed, dbits)


_flash_dropout.defvjp(_flash_dropout_fwd, _flash_dropout_bwd)


def flash_attention_dropout(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    *,
    dropout_bits: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    prng16: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention with probability dropout. q,k,v: [B, H, S, D].

    rng: a JAX PRNG key; its raw words seed the in-core TPU PRNG (the mask is
    a counter-based function of (key, head, q-block, kv-block) — deterministic
    across forward and backward, a different high-quality stream than
    threefry). dropout_bits: precomputed uint32 [B*H, nq, nk, bq, bk] mask
    bits instead of the in-core PRNG — used by interpret-mode tests (the TPU
    PRNG has no CPU lowering); also bit-compatible with the RNG path's
    keep rule (bits >= rate * 2^32-1).

    Block sizes (v5e, B1 H8 S16K D32, x10 layers): fwd+bwd (512,1024) 415ms /
    (512,512) 463ms / (1024,1024) OOMs VMEM in bwd; fwd-only (1024,1024)
    110ms. NOTE the dropout mask is a function of the block geometry — fwd
    and bwd always share it (same custom_vjp static args), but a rate>0 result
    is only reproducible under the same (block_q, block_k)."""
    if dropout_rate > 0.0 and rng is None and dropout_bits is None:
        raise ValueError("dropout needs an rng key or explicit bits")
    if prng16 is None:
        # 16-bit PRNG draws halve the in-core RNG generation per tile (the
        # widest [bq, bk] VPU term of the dropout path). DEFAULT ON (round-4
        # on-chip evidence: 26.2 ms of the 47.6 ms dropout overhead per
        # 10-layer fwd+bwd, tools/microbench_attn.py; determinism + keep rate
        # + fwd/bwd mask consistency verified by bench's v-linear dot-test).
        # DIFFERENT mask stream than 32-bit draws — statistically identical
        # (keep-prob quantization shift < 1.6e-5 at rate 0.1); interpret/bits
        # paths keep the 32-bit stream. GAOT_ATTN_PRNG16=0 reverts.
        prng16 = (os.environ.get("GAOT_ATTN_PRNG16", "1") == "1"
                  and not interpret and block_q % 16 == 0)
    prng16 = bool(prng16) and dropout_bits is None
    if prng16 and block_q % 16:
        # halving rows must leave the [bq/2, bk] int32 draw sublane-aligned
        # ((8, 128) f32/int32 tiling): block_q % 16 == 0 keeps bq/2 % 8 == 0.
        # Mosaic may reject or silently pad a sub-tile draw on real hardware
        # and the RNG path has no interpret lowering to catch it off-chip.
        raise ValueError("prng16 needs block_q % 16 == 0 (halved draw must stay "
                         "(8,128)-sublane aligned)")
    if rng is not None:
        seed = jax.random.key_data(rng).astype(jnp.int32).reshape(-1)[:2]
    else:
        seed = jnp.zeros((2,), jnp.int32)
    return _flash_dropout(
        q, k, v, seed, dropout_bits, dropout_rate, block_q, block_k, interpret, prng16
    )


def export_dropout_bits(
    rng: jax.Array,
    batch_heads: int,
    n_q: int,
    n_k: int,
    block_q: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Materialize the exact uint32 bits the RNG variant draws per block.

    NOTE: the dropout mask is a function of block geometry — block_q/block_k
    here MUST match the flash_attention_dropout call being replayed (defaults
    are aligned with its 512/1024 defaults for that reason).

    Debug/validation utility: feeding the result into the `dropout_bits`
    variant must reproduce the RNG variant bit-for-bit (asserted by bench.py's
    regression checks on the real chip). TPU-only (in-core PRNG)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed = jax.random.key_data(rng).astype(jnp.int32).reshape(-1)[:2]

    def kernel(seed_ref, out_ref):
        bh = pl.program_id(0)
        iq = pl.program_id(1)
        ik = pl.program_id(2)
        _seed_block(pltpu, seed_ref, bh, iq, ik, n_q, n_k)
        bits = pltpu.bitcast(pltpu.prng_random_bits((block_q, block_k)), jnp.uint32)
        out_ref[...] = bits.reshape(1, 1, 1, block_q, block_k)

    return pl.pallas_call(
        kernel,
        grid=(batch_heads, n_q, n_k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, block_q, block_k), lambda bh, iq, ik: (bh, iq, ik, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch_heads, n_q, n_k, block_q, block_k), jnp.uint32
        ),
    )(seed)

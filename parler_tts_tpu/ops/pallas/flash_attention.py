"""Pallas flash attention (forward + backward) for the training path.

The reference offloads long-sequence training attention to the external
`flash_attn` CUDA wheels (reference modeling_parler_tts.py:600-814, the
`_flash_attention_forward` branch). The in-repo JAX fallback here is
`ops/chunked_attention.py` (online-softmax scan + `jax.checkpoint`); this
module is the TPU-kernel version of the same contract: O(T * block) memory,
numerically equal to dense masked attention, differentiable.

Design (standard two-pass flash attention, written for this framework's
(B, T, H, Dh) layout and key-validity + causal masking):

  forward — grid (B, H, nq, nk), k-blocks innermost (sequential on TPU):
    online-softmax accumulators (m, l, acc) live in VMEM scratch across the
    k iterations; the output block and the logsumexp row are written once at
    the last k block. Scores/probabilities never touch HBM.
  backward — recompute p = exp(s - lse) per block pair (no O(T^2) residuals):
    * dq kernel: grid (B, H, nq, nk), accumulates ds @ k into VMEM scratch;
    * dkv kernel: grid (B, H, nk, nq), accumulates p^T @ do and ds^T @ q.
    D = rowsum(do * o) is recomputed per block from the o residual (a tiny
    VPU reduce) rather than materialized in HBM. lse follows the in-tree
    convention of 128-lane replication (Mosaic minor-dim tile rule; same
    layout as jax.experimental.pallas.ops.tpu.flash_attention's l/m refs).

GQA is handled by expanding kv heads to the query-head count outside the
kernel and group-summing dk/dv in the VJP (the decoder's training shapes are
MHA; the expansion is a no-op there).

Matmuls accumulate in fp32 (`preferred_element_type`); probabilities are
cast to the input dtype for the p @ v / p^T @ do MXU ops, matching the
precision contract of the fused XLA/chunked paths (bf16 inputs -> bf16
operands, fp32 accumulation).

Like the rest of `ops/pallas`, falls back to the Pallas interpreter off-TPU
so the CPU test suite exercises the real kernel logic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _block_mask(qi, ki, valid_k, *, block_q, block_k, q_offset, causal):
    """(block_q, block_k) validity: key-validity row x causal triangle."""
    ok = jnp.broadcast_to(valid_k[None, :], (block_q, block_k))
    if causal:
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + q_offset + qi * block_q
        )
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            + ki * block_k
        )
        ok = ok & (col <= row)
    return ok


def _fwd_kernel(
    q_ref, k_ref, v_ref, mask_ref,            # inputs
    o_ref, lse_ref,                           # outputs
    m_scr, l_scr, acc_scr,                    # VMEM scratch
    *, block_q, block_k, q_offset, causal,
):
    qi, ki = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # causal: skip key blocks strictly above the diagonal band of this q block
    first_dead_k = (q_offset + (qi + 1) * block_q + block_k - 1) // block_k

    @pl.when(jnp.logical_not(causal) | (ki < first_dead_k))
    def _compute():
        q = q_ref[0, 0]                                     # (bq, dh)
        k = k_ref[0, 0]                                     # (bk, dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (bq, bk)
        ok = _block_mask(
            qi, ki, mask_ref[0, 0] > 0, block_q=block_q, block_k=block_k,
            q_offset=q_offset, causal=causal,
        )
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_scr[...]                                 # (bq, 128)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1)[:, None])
        p = jnp.where(ok, jnp.exp(s - m_new[:, :1]), 0.0)   # (bq, bk) f32
        alpha = jnp.exp(m_prev - m_new)                     # (bq, 128)
        l_scr[...] = l_scr[...] * alpha + p.sum(axis=1)[:, None]
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (bq, dh)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
        m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = jnp.maximum(l_scr[...], 1e-30)                  # (bq, 128)
        o_ref[0, 0] = (acc_scr[...] / l[:, :1]).astype(o_ref.dtype)
        # lse replicated across the 128-lane minor dim (Mosaic tile rule)
        lse_ref[0, 0] = m_scr[...] + jnp.log(l)


def _recompute_p(q_ref, k_ref, mask_ref, lse_ref, qi, ki, *,
                 block_q, block_k, q_offset, causal):
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ok = _block_mask(
        qi, ki, mask_ref[0, 0] > 0, block_q=block_q, block_k=block_k,
        q_offset=q_offset, causal=causal,
    )
    # fully-masked (padded) q rows have lse = log(1e-30) + NEG_INF; the
    # `where` keeps their p at exactly 0 regardless of the exp argument
    lse = lse_ref[0, 0][:, :1]                              # (bq, 1) of (bq, 128)
    return jnp.where(ok, jnp.exp(s - lse), 0.0), ok


def _rowsum_do_o(do_ref, o_ref):
    """D = rowsum(do * o) — (bq, 1) fp32, recomputed per block pair."""
    return jnp.sum(
        do_ref[0, 0].astype(jnp.float32) * o_ref[0, 0].astype(jnp.float32),
        axis=-1,
    )[:, None]


def _dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, do_ref, o_ref,
    dq_ref,
    dq_scr,
    *, block_q, block_k, q_offset, causal,
):
    qi, ki = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    first_dead_k = (q_offset + (qi + 1) * block_q + block_k - 1) // block_k

    @pl.when(jnp.logical_not(causal) | (ki < first_dead_k))
    def _compute():
        p, _ = _recompute_p(
            q_ref, k_ref, mask_ref, lse_ref, qi, ki, block_q=block_q,
            block_k=block_k, q_offset=q_offset, causal=causal,
        )
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (bq, bk)
        ds = p * (dp - _rowsum_do_o(do_ref, o_ref))         # (bq, bk) f32
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, do_ref, o_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, block_q, block_k, q_offset, causal,
):
    ki, qi = pl.program_id(2), pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    # causal: q blocks entirely above this k block's diagonal contribute 0
    first_live_q = (ki * block_k - q_offset) // block_q

    @pl.when(jnp.logical_not(causal) | (qi >= first_live_q))
    def _compute():
        p, _ = _recompute_p(
            q_ref, k_ref, mask_ref, lse_ref, qi, ki, block_q=block_q,
            block_k=block_k, q_offset=q_offset, causal=causal,
        )
        do = do_ref[0, 0]
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (bk, dh)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - _rowsum_do_o(do_ref, o_ref))
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _qspec(block_q, dh):
    return pl.BlockSpec((1, 1, block_q, dh), lambda b, h, qi, ki: (b, h, qi, 0))


def _kspec(block_k, dh):
    return pl.BlockSpec((1, 1, block_k, dh), lambda b, h, qi, ki: (b, h, ki, 0))


def _mspec(block_k):
    # mask is carried as (B, 1, Tk): the (1, block_k) trailing block dims
    # satisfy Mosaic's tile rule (second-minor equals the array dim)
    return pl.BlockSpec((1, 1, block_k), lambda b, h, qi, ki: (b, 0, ki))


def _lspec(block_q):
    # per-row scalars (lse, D) are carried as (B, H, Tq, 128): replicated
    # across the 128-lane minor dim (Mosaic tile rule, in-tree convention)
    return pl.BlockSpec((1, 1, block_q, 128), lambda b, h, qi, ki: (b, h, qi, 0))


def _fwd_call(q, k, v, mask, *, block_q, block_k, q_offset, causal, interpret):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    nq, nk = tq // block_q, tk // block_k
    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, block_k=block_k,
        q_offset=q_offset, causal=causal,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=[
            _qspec(block_q, dh), _kspec(block_k, dh), _kspec(block_k, dh),
            _mspec(block_k),
        ],
        out_specs=[_qspec(block_q, dh), _lspec(block_q)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tq, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, tq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask)


def _bwd_call(q, k, v, mask, lse, o, do, *,
              block_q, block_k, q_offset, causal, interpret):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    nq, nk = tq // block_q, tk // block_k

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, block_q=block_q, block_k=block_k,
            q_offset=q_offset, causal=causal,
        ),
        grid=(b, h, nq, nk),
        in_specs=[
            _qspec(block_q, dh), _kspec(block_k, dh), _kspec(block_k, dh),
            _mspec(block_k), _lspec(block_q), _qspec(block_q, dh),
            _qspec(block_q, dh),
        ],
        out_specs=[_qspec(block_q, dh)],
        out_shape=[jax.ShapeDtypeStruct((b, h, tq, dh), q.dtype)],
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask, lse, do, o)[0]

    # dkv grid swaps the inner axes: k blocks parallel, q blocks sequential
    def _qspec_t(bq, d):
        return pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ki, qi: (b_, h_, qi, 0))

    def _kspec_t(bk, d):
        return pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0))

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, block_q=block_q, block_k=block_k,
            q_offset=q_offset, causal=causal,
        ),
        grid=(b, h, nk, nq),
        in_specs=[
            _qspec_t(block_q, dh), _kspec_t(block_k, dh), _kspec_t(block_k, dh),
            pl.BlockSpec((1, 1, block_k), lambda b_, h_, ki, qi: (b_, 0, ki)),
            pl.BlockSpec(
                (1, 1, block_q, 128), lambda b_, h_, ki, qi: (b_, h_, qi, 0)
            ),
            _qspec_t(block_q, dh),
            _qspec_t(block_q, dh),
        ],
        out_specs=[_kspec_t(block_k, dh), _kspec_t(block_k, dh)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, tk, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask, lse, do, o)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, mask, block_q, block_k, q_offset, causal, interpret):
    out, _ = _fwd_call(
        q, k, v, mask, block_q=block_q, block_k=block_k,
        q_offset=q_offset, causal=causal, interpret=interpret,
    )
    return out


def _flash_fwd(q, k, v, mask, block_q, block_k, q_offset, causal, interpret):
    out, lse = _fwd_call(
        q, k, v, mask, block_q=block_q, block_k=block_k,
        q_offset=q_offset, causal=causal, interpret=interpret,
    )
    return out, (q, k, v, mask, lse, out)


def _flash_bwd(block_q, block_k, q_offset, causal, interpret, res, do):
    q, k, v, mask, lse, out = res
    dq, dk, dv = _bwd_call(
        q, k, v, mask, lse, out, do, block_q=block_q, block_k=block_k,
        q_offset=q_offset, causal=causal, interpret=interpret,
    )
    return dq, dk, dv, jnp.zeros_like(mask)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,                      # (B, Tq, H, Dh) — pre-scaled
    k: jnp.ndarray,                      # (B, Tk, H_kv, Dh)
    v: jnp.ndarray,                      # (B, Tk, H_kv, Dh)
    mask: Optional[jnp.ndarray] = None,  # (B, Tk) key validity
    causal: bool = True,
    q_offset: int = 0,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for `ops.chunked_attention.chunked_attention` (same contract:
    numerically equal to dense masked attention, (B, Tq, H, Dh) out)."""
    b, tq0, h, dh = q.shape
    tk0 = k.shape[1]
    h_kv = k.shape[2]
    g = h // h_kv
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # shrink blocks for small inputs while keeping TPU tile alignment
    # (scores are (block_q, block_k) f32: sublane x8, lane x128)
    block_q = min(block_q, -(-tq0 // 8) * 8)
    block_k = min(block_k, -(-tk0 // 128) * 128)
    pad_q = (-tq0) % block_q
    pad_k = (-tk0) % block_k
    if mask is None:
        mask = jnp.ones((b, tk0), bool)
    maskf = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad_k)))[:, None]

    # (B, T, H, Dh) -> (B, H, T, Dh)
    qt = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    # GQA: expand kv heads to H OUTSIDE the custom_vjp — the repeat's own VJP
    # group-sums dk/dv back to the H_kv heads
    if g > 1:
        kt = jnp.repeat(kt, g, axis=1)
        vt = jnp.repeat(vt, g, axis=1)
    out = _flash(qt, kt, vt, maskf, block_q, block_k, q_offset, causal, interpret)
    return out.transpose(0, 2, 1, 3)[:, :tq0]

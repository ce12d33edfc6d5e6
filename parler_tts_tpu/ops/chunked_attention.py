"""Memory-efficient chunked attention (Rabe–Staats online softmax) for the
long-sequence training path.

The reference trains at up to 2580 codec frames; materializing (B, H, T, T)
score/prob tensors (and keeping them for backward) is the GPU flash-attention
problem the reference solves with external `flash_attn` CUDA wheels
(modeling_parler_tts.py:600-814). Here: block the query axis, scan the key axis
with online-softmax accumulators, and `jax.checkpoint` the key-scan so the
backward rematerializes blocks instead of storing probabilities — peak memory
O(T * chunk) instead of O(T^2), fully differentiable, pure JAX (XLA fuses the
per-block einsums onto the MXU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def _pad_to(x: jnp.ndarray, axis: int, multiple: int):
    t = x.shape[axis]
    pad = (-t) % multiple
    if pad == 0:
        return x, t
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), t


def chunked_attention(
    q: jnp.ndarray,                      # (B, Tq, H, Dh) — pre-scaled
    k: jnp.ndarray,                      # (B, Tk, H_kv, Dh)
    v: jnp.ndarray,                      # (B, Tk, H_kv, Dh)
    mask: Optional[jnp.ndarray] = None,  # (B, Tk) key validity
    causal: bool = True,
    q_offset: int = 0,                   # absolute position of q[0] vs k[0]
    chunk_q: int = 512,
    chunk_k: int = 512,
) -> jnp.ndarray:
    """Returns (B, Tq, H, Dh); numerically equal to dense masked attention."""
    b, tq0, h, dh = q.shape
    h_kv = k.shape[2]
    g = h // h_kv

    q, tq0 = _pad_to(q, 1, chunk_q)
    k, tk0 = _pad_to(k, 1, chunk_k)
    v, _ = _pad_to(v, 1, chunk_k)
    tq, tk = q.shape[1], k.shape[1]
    if mask is None:
        mask = jnp.ones((b, tk0), bool)
    mask = jnp.pad(mask.astype(bool), ((0, 0), (0, tk - tk0)))

    nq, nk = tq // chunk_q, tk // chunk_k
    qc = q.reshape(b, nq, chunk_q, h_kv, g, dh)
    kc = k.reshape(b, nk, chunk_k, h_kv, dh)
    vc = v.reshape(b, nk, chunk_k, h_kv, dh)
    maskc = mask.reshape(b, nk, chunk_k)

    q_pos_base = jnp.arange(chunk_q) + q_offset
    k_pos_base = jnp.arange(chunk_k)

    def q_block(qi, q_blk):
        """One query chunk against all key chunks (scanned, checkpointed)."""

        @functools.partial(jax.checkpoint, prevent_cse=False)
        def kv_step(carry, inputs):
            m_prev, l_prev, acc = carry
            ki, k_blk, v_blk, mask_blk = inputs
            s = jnp.einsum(
                "bqkgd,bskd->bkgqs", q_blk, k_blk,
                preferred_element_type=jnp.float32,
            )  # (B, H_kv, G, Cq, Ck)
            ok = mask_blk[:, None, None, None, :]
            if causal:
                qp = (q_pos_base + qi * chunk_q)[:, None]
                kp = k_pos_base[None, :] + ki * chunk_k
                ok = ok & (kp <= qp)[None, None, None]
            s = jnp.where(ok, s, NEG_INF)

            m_blk = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m_prev, m_blk)
            p = jnp.exp(s - m_new[..., None])
            p = jnp.where(ok, p, 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + p.sum(axis=-1)
            pv = jnp.einsum(
                "bkgqs,bskd->bqkgd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * alpha.transpose(0, 3, 1, 2)[..., None] + pv
            return (m_new, l_new, acc_new), None

        init = (
            jnp.full((b, h_kv, g, chunk_q), NEG_INF, jnp.float32),
            jnp.zeros((b, h_kv, g, chunk_q), jnp.float32),
            jnp.zeros((b, chunk_q, h_kv, g, dh), jnp.float32),
        )
        xs = (jnp.arange(nk), kc.swapaxes(0, 1), vc.swapaxes(0, 1), maskc.swapaxes(0, 1))
        (m, l, acc), _ = jax.lax.scan(kv_step, init, xs)
        denom = jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2)[..., None]
        return acc / denom  # (B, Cq, H_kv, G, Dh)

    outs = []
    for qi in range(nq):
        outs.append(q_block(qi, qc[:, qi].astype(jnp.float32)))
    out = jnp.concatenate(outs, axis=1).reshape(b, tq, h, dh)
    return out[:, :tq0].astype(q.dtype)

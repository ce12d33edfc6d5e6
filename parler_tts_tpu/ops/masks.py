"""Attention-bias construction for self/cross attention under static shapes.

The reference builds 4-D additive causal masks per attention implementation
(`/root/reference/parler_tts/modeling_parler_tts.py:1657-1736`). Here masks are
always additive fp32 biases with a single static KV length, which is what the
TPU decode loop wants: query positions are absolute indices into a preallocated
cache, so the same function serves prefill (T > 1) and decode (T == 1).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

# Half of fp32 min, NOT finfo.min: the bias is ADDED to attention scores, and
# finfo.min + (any negative score) overflows to -inf. A row that is entirely
# masked (e.g. the all-pad query rows of a left-padded prompt) would then be
# all -inf, and max-subtracting softmax turns it into NaN — which pad-slot K/V
# writes propagate into *valid* positions on the next layer. With half-range,
# fully-masked rows stay finite (softmax degrades to uniform over masked keys,
# harmless: those rows are dropped by the loss / never sampled).
NEG_INF = jnp.finfo(jnp.float32).min / 2


def causal_self_attention_bias(
    q_positions: jnp.ndarray,
    kv_valid: jnp.ndarray,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Additive bias for self-attention over a static KV cache.

    Args:
      q_positions: (B, T) absolute position of each query in the cache.
      kv_valid: (B, S) bool — cache slots that hold real (non-padding) tokens.
        Slots not yet written are excluded by causality (their index exceeds
        every query position), so no separate "written" mask is needed.
      sliding_window: when set, each query additionally attends only to the
        last `sliding_window` positions (the reference's SlidingWindowCache
        option, modeling:3269-3270 + config.sliding_window — there the window
        bounds the cache allocation; under a preallocated static cache the
        same semantics are a window on the attention bias).

    Returns: (B, 1, T, S) fp32 bias (0 = attend, NEG_INF = masked).
    """
    s = kv_valid.shape[-1]
    kv_pos = jnp.arange(s)[None, None, :]                 # (1, 1, S)
    causal = kv_pos <= q_positions[:, :, None]            # (B, T, S)
    ok = causal & kv_valid[:, None, :]
    if sliding_window is not None:
        ok = ok & (kv_pos > q_positions[:, :, None] - sliding_window)
    return jnp.where(ok, 0.0, NEG_INF)[:, None, :, :].astype(jnp.float32)


def padding_cross_attention_bias(encoder_mask: Optional[jnp.ndarray], t: int) -> Optional[jnp.ndarray]:
    """Additive bias for cross-attention from a (B, S_enc) 0/1 padding mask.

    Returns (B, 1, T, S_enc) or None when no mask is given.
    """
    if encoder_mask is None:
        return None
    bias = jnp.where(encoder_mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
    return jnp.broadcast_to(
        bias[:, None, None, :], (bias.shape[0], 1, t, bias.shape[-1])
    )


def dense_self_attention_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Training-path bias: full-sequence causal + padding in one shot.

    attention_mask: (B, T) 0/1 over the decoder sequence (prompt prefix included).
    Returns (B, 1, T, T).
    """
    b, t = attention_mask.shape
    positions = jnp.arange(t)
    causal = positions[None, :, None] >= positions[None, None, :]   # (1, T, T)
    ok = causal & attention_mask.astype(bool)[:, None, :]
    return jnp.where(ok, 0.0, NEG_INF)[:, None, :, :].astype(jnp.float32)

"""Positional embeddings: sinusoidal table + rotary (RoPE), as pure jnp functions.

Formula parity with the reference:
  - sinusoidal: tensor2tensor layout `[cos | sin]` concatenated on the feature
    axis (`/root/reference/parler_tts/modeling_parler_tts.py:345-360`);
  - rotary: llama-style duplicated-frequency layout with fp32-forced cos/sin
    (`modeling_parler_tts.py:373-436`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoidal_table(num_positions: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Precompute the (num_positions, dim) sinusoidal table.

    Matches MusicGen/ParlerTTS: emb[p, :half] = cos(p * w), emb[p, half:] = sin(p * w)
    with w_i = exp(-i * ln(10000) / (half - 1)).
    """
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(np.log(10000.0) / (half - 1)))
    ang = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    return jnp.asarray(table, dtype=dtype)


def sinusoidal_embed(table: jnp.ndarray, position_ids: jnp.ndarray) -> jnp.ndarray:
    """Lookup positions in the precomputed table. position_ids: (..., T) -> (..., T, D)."""
    return jnp.take(table, position_ids, axis=0)


def rope_cos_sin(
    position_ids: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
):
    """cos/sin for rotary embeddings.

    position_ids: (B, T) -> cos, sin each (B, T, head_dim), computed in fp32 and
    cast to `dtype` (the reference forces fp32 for precision, modeling:393-406).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # (Dh/2,)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, T, Dh)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: (B, T, H, Dh); cos/sin: (B, T, Dh) — broadcast over the head axis.
    """
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return x * cos + rotate_half(x) * sin

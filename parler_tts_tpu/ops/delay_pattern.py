"""Delay-pattern codebook scheduling as pure, vectorized jnp functions.

The MusicGen-style trick that lets K parallel codebooks be decoded with one
autoregressive step each: codebook k is offset by k steps, BOS fills the
lower-triangular head and PAD the upper-triangular tail.

Semantics match the reference (`/root/reference/parler_tts/modeling_parler_tts.py:205-276`)
but are fully vectorized (no per-codebook Python loops) and shape-static so they
trace cleanly under `jax.jit`. Arrays use the (batch, codebook, time) layout
rather than the reference's flattened (batch*codebook, time); `flatten_codebooks`
/ `unflatten_codebooks` bridge the two.
"""

from __future__ import annotations

import jax.numpy as jnp


def unflatten_codebooks(ids: jnp.ndarray, num_codebooks: int) -> jnp.ndarray:
    """(B*K, T) -> (B, K, T)."""
    return ids.reshape(-1, num_codebooks, ids.shape[-1])


def flatten_codebooks(ids: jnp.ndarray) -> jnp.ndarray:
    """(B, K, T) -> (B*K, T)."""
    return ids.reshape(-1, ids.shape[-1])


def build_delay_pattern_mask(
    input_ids: jnp.ndarray,
    bos_token_id: int,
    pad_token_id: int,
    max_length: int,
):
    """Build the delayed pattern mask.

    Args:
      input_ids: (B, K, S) int array of decoder-prompt ids (usually S == 1, all BOS).
      bos_token_id / pad_token_id: special ids.
      max_length: full target length L.

    Returns:
      (first_start_ids, pattern) where
        first_start_ids: (B, K, S') the truncated ids ready for prefill
          (S' = min(S, L - K + 1), static), and
        pattern: (B, K, L) with BOS in the lower triangle (col <= k), PAD in the
          upper triangle (col >= L - K + 1 + k), the shifted input ids where they
          land, and -1 elsewhere (positions the model must predict).
    """
    b, num_codebooks, seq_len = input_ids.shape
    k = num_codebooks

    if max_length < 2 * k - 1:
        # Too short to delay — reference returns inputs as-is with an all -1 mask
        # (modeling_parler_tts.py:245-247).
        pattern = jnp.full((b, k, max_length), -1, dtype=input_ids.dtype)
        return input_ids, pattern

    cols = jnp.arange(max_length)[None, :]          # (1, L)
    rows = jnp.arange(k)[:, None]                   # (K, 1)

    # shifted[b, k, c] = input_ids[b, k, c - k] when 0 <= c - k < S else -1
    src = cols - rows                                # (K, L)
    in_range = (src >= 0) & (src < seq_len)
    gathered = jnp.take_along_axis(
        input_ids, jnp.clip(src, 0, seq_len - 1)[None].repeat(b, axis=0), axis=-1
    )
    shifted = jnp.where(in_range[None], gathered, -1)

    bos_region = cols <= rows                        # lower triangle incl. diagonal
    pad_region = cols >= (max_length - k + 1 + rows)  # upper triangle

    pattern = jnp.where(bos_region[None], bos_token_id, shifted)
    pattern = jnp.where(pad_region[None], pad_token_id, pattern)

    # First position to generate is the first -1 in codebook 0, which for a fully
    # specified prompt is simply min(S, L - K + 1) — static under jit.
    first_start = min(seq_len, max_length - k + 1)
    return pattern[..., :first_start], pattern


def apply_delay_pattern_mask(input_ids: jnp.ndarray, pattern: jnp.ndarray) -> jnp.ndarray:
    """Override ids with the pattern wherever the pattern is not -1.

    input_ids: (B, K, T); pattern: (B, K, L) with L >= T.
    (reference `modeling_parler_tts.py:205-211`)
    """
    t = input_ids.shape[-1]
    p = pattern[..., :t]
    return jnp.where(p == -1, input_ids, p)


def undelay_pattern(delayed_ids: jnp.ndarray, num_codebooks: int) -> jnp.ndarray:
    """Strip the delay: codes[b, k, t] = delayed[b, k, t + k + 1].

    Inverse of the pattern construction — selects exactly the non-BOS, non-PAD
    region of each codebook row, matching the reference's boolean-mask reshape
    (`modeling_parler_tts.py:3590-3597`). Output shape (B, K, L - K).
    """
    b, k, length = delayed_ids.shape
    out_t = length - num_codebooks
    t_idx = jnp.arange(out_t)[None, :]                  # (1, T)
    k_idx = jnp.arange(num_codebooks)[:, None]          # (K, 1)
    gather = (t_idx + k_idx + 1)[None].repeat(b, axis=0)  # (B, K, T)
    return jnp.take_along_axis(delayed_ids, gather, axis=-1)


def valid_frame_lengths(codes: jnp.ndarray, codebook_size: int) -> jnp.ndarray:
    """Per-sample count of leading frames where every codebook id is a real code
    (< codebook_size). Frames at/after the first special token (eos/pad/bos) are
    invalid (reference's sequential-decode masking, `modeling_parler_tts.py:3630-3637`).

    codes: (B, K, T) -> lengths: (B,) int32
    """
    frame_ok = jnp.all(codes < codebook_size, axis=1)        # (B, T)
    leading_ok = jnp.cumprod(frame_ok.astype(jnp.int32), axis=-1)
    return leading_ok.sum(axis=-1).astype(jnp.int32)

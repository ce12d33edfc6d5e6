"""Per-codebook masked cross-entropy, matching the reference loss exactly.

Reference (`/root/reference/parler_tts/modeling_parler_tts.py:1928-1957`):
  - labels equal to BOS are masked out;
  - positions whose *input* token is EOS are dropped (so only the first EOS per
    codebook contributes);
  - per-codebook CE is averaged (or codebook_weights-weighted);
  - `loss_reduction="sum"` is used in training with a globally gathered token
    count for grad-accumulation-correct normalization
    (`training/run_parler_tts_training.py:916-918,1034-1036`) — here that is the
    (`sum_loss`, `num_items`) pair, with `num_items` psum-able across a mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def per_codebook_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    codebook_weights: Optional[Tuple[float, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked per-codebook CE.

    Args:
      logits: (B, K, T, V) float — predictions for label positions.
      labels: (B, T, K) int — target codec tokens (-100 = ignore).
      decoder_input_ids: (B, K, T) int — the (shifted) inputs that produced the
        logits; positions where the input is EOS are masked (drops repeats past
        the first EOS, reference modeling:1938).

    Returns:
      (weighted_sum_loss, num_items, per_codebook_mean, per_codebook_count)
        weighted_sum_loss: scalar, sum over valid tokens of weighted CE
        num_items: scalar int, count of valid (unweighted) label tokens
        per_codebook_mean: (K,) mean CE per codebook (for logging)
        per_codebook_count: (K,) valid token count per codebook
    """
    b, k, t, v = logits.shape
    labels_kt = jnp.swapaxes(labels, 1, 2)  # (B, K, T)

    ignore = (labels_kt == -100) | (labels_kt == bos_token_id)
    mask = (decoder_input_ids != eos_token_id) & ~ignore  # (B, K, T)

    safe_labels = jnp.clip(labels_kt, 0, v - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_nll = jnp.where(mask, token_nll, 0.0)  # (B, K, T)

    per_cb_sum = token_nll.sum(axis=(0, 2))                       # (K,)
    per_cb_count = mask.sum(axis=(0, 2)).astype(jnp.float32)      # (K,)
    per_cb_mean = per_cb_sum / jnp.maximum(per_cb_count, 1.0)

    if codebook_weights is not None:
        w = jnp.asarray(codebook_weights, dtype=jnp.float32)
        weighted_sum = (per_cb_sum * w).sum() / w.sum() * k
    else:
        weighted_sum = per_cb_sum.sum()

    num_items = per_cb_count.sum()
    return weighted_sum, num_items, per_cb_mean, per_cb_count


def chunked_per_codebook_cross_entropy(
    hidden: jnp.ndarray,
    lm_heads: jnp.ndarray,
    labels: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    codebook_weights: Optional[Tuple[float, ...]] = None,
    chunk_size: int = 256,
    head_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`per_codebook_cross_entropy` fused with the LM heads, chunked over T.

    The unchunked path materializes (B, K, T, V) logits plus an fp32
    log-softmax of the same shape — at the 30 s recipe scale that tensor
    (and its backward) is what OOMs a 16 GB chip (measured: B=4/T=2580
    misses fit by 214 MB at the loss log_softmax). Here the head matmul +
    log-softmax + gather run per T-chunk under `jax.checkpoint` inside
    `lax.map`, so peak memory is one (B, K, chunk, V) block and the backward
    recomputes it chunk-by-chunk. Same contract/returns as
    `per_codebook_cross_entropy`; `hidden` is (B, T, D) pre-head states and
    `lm_heads` the (K, D, V) stacked heads (cast to `head_dtype` to match
    `ParlerForCausalLM.logits`, models/decoder.py:575-580).
    """
    b, t, d = hidden.shape
    k, _, v = lm_heads.shape
    labels_kt = jnp.swapaxes(labels, 1, 2)  # (B, K, T)
    ignore = (labels_kt == -100) | (labels_kt == bos_token_id)
    mask = (decoder_input_ids != eos_token_id) & ~ignore
    safe_labels = jnp.clip(labels_kt, 0, v - 1)

    heads = lm_heads.astype(head_dtype) if head_dtype is not None else lm_heads
    n_pad = (-t) % chunk_size
    n_chunks = (t + n_pad) // chunk_size
    hidden_c = jnp.pad(hidden, ((0, 0), (0, n_pad), (0, 0))).reshape(
        b, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)   # (nc, B, Tc, D)
    mask_c = jnp.pad(mask, ((0, 0), (0, 0), (0, n_pad))).reshape(
        b, k, n_chunks, chunk_size).transpose(2, 0, 1, 3)   # (nc, B, K, Tc)
    labels_c = jnp.pad(safe_labels, ((0, 0), (0, 0), (0, n_pad))).reshape(
        b, k, n_chunks, chunk_size).transpose(2, 0, 1, 3)

    @jax.checkpoint
    def chunk_sums(h, lbl, m):
        logits = jnp.einsum(
            "btd,kdv->bktv", h, heads, preferred_element_type=jnp.float32
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
        nll = jnp.where(m, nll, 0.0)
        return nll.sum(axis=(0, 2)), m.sum(axis=(0, 2)).astype(jnp.float32)

    sums, counts = jax.lax.map(
        lambda args: chunk_sums(*args), (hidden_c, labels_c, mask_c)
    )  # (nc, K) each
    per_cb_sum = sums.sum(axis=0)
    per_cb_count = counts.sum(axis=0)
    per_cb_mean = per_cb_sum / jnp.maximum(per_cb_count, 1.0)

    if codebook_weights is not None:
        w = jnp.asarray(codebook_weights, dtype=jnp.float32)
        weighted_sum = (per_cb_sum * w).sum() / w.sum() * k
    else:
        weighted_sum = per_cb_sum.sum()

    num_items = per_cb_count.sum()
    return weighted_sum, num_items, per_cb_mean, per_cb_count


def mean_loss_reference_style(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    codebook_weights: Optional[Tuple[float, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`loss_reduction="mean"` parity: average the per-codebook mean CEs
    (weighted by codebook_weights when provided), reference modeling:1941-1957.
    """
    _, _, per_cb_mean, _ = per_codebook_cross_entropy(
        logits,
        labels,
        decoder_input_ids,
        bos_token_id=bos_token_id,
        eos_token_id=eos_token_id,
        codebook_weights=None,
    )
    if codebook_weights is not None:
        w = jnp.asarray(codebook_weights, dtype=jnp.float32)
        loss = (per_cb_mean * w).sum() / w.sum()
    else:
        loss = per_cb_mean.mean()
    return loss, per_cb_mean


def shift_tokens_right(
    labels: jnp.ndarray, pad_token_id: int, decoder_start_token_id: int
) -> jnp.ndarray:
    """(B, T, K) labels -> (B, K, T) decoder input ids, shifted right along T
    with the start token first and -100s replaced by pad
    (reference `modeling_parler_tts.py:308-324,2820-2823`).
    """
    shifted = jnp.roll(labels, 1, axis=1)
    shifted = shifted.at[:, 0, :].set(decoder_start_token_id)
    shifted = jnp.where(shifted == -100, pad_token_id, shifted)
    return jnp.swapaxes(shifted, 1, 2)

"""Sampling and logits-constraint ops for the delayed-codebook decode loop.

Everything here is a pure function over (B, K, V) logits so the whole decode
step — constraints included — stays inside one jitted/scanned program with no
host sync. The stateful reference logits processor
(`/root/reference/parler_tts/logits_processors.py:6-53`) becomes explicit carried
state: `first_unfinished` (B,) and `eos_seen` (B, K).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


class EosState(NamedTuple):
    """Carried EOS-ordering state for the delay-pattern constraint."""

    eos_seen: jnp.ndarray          # (B, K) bool — codebook k has emitted EOS
    first_unfinished: jnp.ndarray  # (B,) int32 — lowest codebook index not yet finished


def init_eos_state(batch_size: int, num_codebooks: int) -> EosState:
    return EosState(
        eos_seen=jnp.zeros((batch_size, num_codebooks), dtype=bool),
        first_unfinished=jnp.zeros((batch_size,), dtype=jnp.int32),
    )


def advance_eos_state(state: EosState, num_codebooks: int) -> EosState:
    """Advance `first_unfinished` by one if its codebook has seen EOS.

    Mirrors the per-step update in the reference processor (logits_processors.py:48),
    which advances at most one codebook per decode step and never past K-1.
    """
    b = state.first_unfinished.shape[0]
    current_seen = jnp.take_along_axis(
        state.eos_seen, state.first_unfinished[:, None], axis=1
    )[:, 0]
    bumped = jnp.where(
        current_seen & (state.first_unfinished < num_codebooks - 1),
        state.first_unfinished + 1,
        state.first_unfinished,
    )
    return EosState(eos_seen=state.eos_seen, first_unfinished=bumped)


def mask_eos_ordering(
    logits: jnp.ndarray, state: EosState, eos_token_id: int
) -> jnp.ndarray:
    """Forbid EOS for every codebook strictly above the first unfinished one.

    logits: (B, K, V). (reference logits_processors.py:50-52)
    """
    b, k, v = logits.shape
    cb = jnp.arange(k)[None, :]                       # (1, K)
    forbid = cb > state.first_unfinished[:, None]     # (B, K)
    eos_col = jax.nn.one_hot(eos_token_id, v, dtype=bool)  # (V,)
    return jnp.where(forbid[:, :, None] & eos_col[None, None, :], NEG_INF, logits)


def record_sampled(state: EosState, sampled: jnp.ndarray, eos_token_id: int) -> EosState:
    """Update eos_seen from the ids actually written this step (post pattern override)."""
    return EosState(
        eos_seen=state.eos_seen | (sampled == eos_token_id),
        first_unfinished=state.first_unfinished,
    )


def suppress_eos_before_min_length(
    logits: jnp.ndarray, cur_length, min_length: int, eos_token_id: int
) -> jnp.ndarray:
    """MinNewTokensLength equivalent: no EOS anywhere before `min_length` tokens."""
    v = logits.shape[-1]
    eos_col = jax.nn.one_hot(eos_token_id, v, dtype=bool)
    active = cur_length < min_length
    return jnp.where(active & eos_col[None, None, :], NEG_INF, logits)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits / temperature


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep only the top-k logits (static k)."""
    if top_k <= 0:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens with cumprob >= top_p."""
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens whose cumulative probability (exclusive of self) is < top_p.
    keep_sorted = (cum - probs) < top_p
    # Threshold logit: the smallest kept logit.
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def speculative_accept(
    p: jnp.ndarray,      # (..., V) target probability vectors (normalized)
    q: jnp.ndarray,      # (..., V) proposal probability vectors (normalized)
    cand: jnp.ndarray,   # (...,) int proposal tokens, drawn from q
    u: jnp.ndarray,      # (...,) uniforms in [0, 1)
    gumbel: jnp.ndarray,  # (..., V) Gumbel(0,1) noise for the residual draw
):
    """Standard speculative-sampling rejection step (Leviathan et al. 2023;
    applied draft-free per SJD, arXiv 2410.01699): accept `cand` with
    probability min(1, p/q); otherwise draw from the normalized residual
    (p - q)^+. The returned token is exactly distributed as `p` whenever
    `cand` ~ q and (u, gumbel) are independent of it.

    Returns (final_tokens, accepted_mask). The residual draw uses Gumbel-argmax
    over log of the UNnormalized residual (argmax is normalization-invariant),
    with a fallback to `p` when the residual is numerically empty (p == q).
    """
    p_c = jnp.take_along_axis(p, cand[..., None], axis=-1)[..., 0]
    q_c = jnp.take_along_axis(q, cand[..., None], axis=-1)[..., 0]
    accepted = u * q_c < p_c  # P[accept] = min(1, p_c / q_c)
    residual = jnp.clip(p - q, 0.0, None)
    empty = residual.sum(axis=-1, keepdims=True) <= 1e-9
    residual = jnp.where(empty, p, residual)
    alt = jnp.argmax(jnp.log(residual + 1e-30) + gumbel, axis=-1).astype(cand.dtype)
    return jnp.where(accepted, cand, alt), accepted


def sample_tokens(
    rng: jax.Array,
    logits: jnp.ndarray,
    *,
    do_sample: bool,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Greedy or filtered-categorical sampling over (B, K, V) -> (B, K) int32."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32)
    if temperature != 1.0:
        x = apply_temperature(x, temperature)
    x = apply_top_k(x, top_k)
    x = apply_top_p(x, top_p)
    return jax.random.categorical(rng, x, axis=-1).astype(jnp.int32)

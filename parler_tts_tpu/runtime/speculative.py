"""Speculative multi-column decoding (self-drafting Jacobi verification).

The AR decode loop (`runtime/generate.py`) is weight-bandwidth-bound at B=1:
each step streams every decoder weight from HBM to score ONE delayed column.
This module decodes W candidate columns per forward pass instead — the extra
query columns ride the same weight stream, so a forward over W columns costs
nearly the same as over one (measured profile: INFERENCE.md "Where the B=1
step time goes").

The scheme is draft-free speculative Jacobi decoding (Teng et al.,
arXiv 2410.01699 — see PAPERS.md; lookahead/Jacobi greedy per
arXiv 2402.02057):

  - keep a window of W candidate columns sampled from the model's own
    distributions computed one iteration earlier (stale context);
  - one forward over the window yields the true conditionals for every
    position given the candidates before it;
  - greedy: accept the longest prefix of candidates that match the argmax —
    token-identical to the AR greedy loop;
  - sampling: per-codebook speculative rejection (accept candidate w.p.
    min(1, p/q), else draw from the normalized residual (p-q)^+) — the output
    distribution is exactly the AR sampling distribution, column by column
    (the first partially-rejected column is still exact via the residual
    draw, so every forward finalizes >= 1 column);
  - leftover + fresh candidates for the next window are re-sampled from this
    forward's distributions (each next-window slot gets an INDEPENDENT draw,
    a requirement for the rejection identity).

Both the offline generate loop and the STREAMING chunk loop
(`make_stream_functions_speculative`) run on the same `_spec_step` body; the
streaming variant advances at least `play_steps` columns per flush in
~play_steps/cols-per-forward forwards.

The reference has no equivalent (its `generate` is strictly one column per
forward, `/root/reference/parler_tts/modeling_parler_tts.py:3321-3653`).

Exactness is CPU-tested: greedy output is token-identical to
`generate_tokens` (offline and streaming); sampled output matches the AR
sampling distribution (tests/test_speculative.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..config import GenerationConfig, ParlerTTSConfig
from ..models.decoder import DecoderCache
from ..models.parler import ParlerTTS
from ..ops.delay_pattern import (
    apply_delay_pattern_mask,
    build_delay_pattern_mask,
    undelay_pattern,
    valid_frame_lengths,
)
from ..ops.masks import causal_self_attention_bias, padding_cross_attention_bias
from ..ops.sampling import (
    EosState,
    advance_eos_state,
    apply_top_k,
    apply_top_p,
    init_eos_state,
    mask_eos_ordering,
    record_sampled,
    speculative_accept,
)
from .generate import GenerateOutput, _sample_column


class SpecStats(NamedTuple):
    """Honest speculation accounting, returned next to the tokens."""

    forwards: jnp.ndarray  # () int32 — decode forward passes run
    columns: jnp.ndarray   # () int32 — columns finalized by those forwards


@flax.struct.dataclass
class SpecState:
    """Carried state of the speculative loop (offline AND streaming).

    Buffers are W-extended: `out_ids`/`pattern_ext` span L + 2W columns
    (columns >= L forced to PAD so the window machinery never leaves the AR
    tail's conditioning), the KV cache spans s_p + L + W slots.
    """

    out_ids: jnp.ndarray             # (B, K, L + 2W) stored (pattern-overridden) ids
    cand_toks: jnp.ndarray           # (W, B, K) pre-override candidates for cols [t, t+W)
    cand_q: Optional[jnp.ndarray]    # (W, B, K, V) proposal distributions (None = greedy)
    cache: DecoderCache
    eos: EosState                    # post-record state through column t-1
    rng: jax.Array
    t: jnp.ndarray                   # () int32 — next column to finalize
    n_fwd: jnp.ndarray               # () int32
    # loop-invariant context (carried so separate jits — stream prefill vs
    # chunk step — share one body implementation)
    pattern_ext: jnp.ndarray         # (B, K, L + 2W)
    kv_valid: jnp.ndarray            # (B, S_cache)
    enc_mask: jnp.ndarray            # (B, S_enc)
    s_p: jnp.ndarray                 # () int32 prompt-prefix length
    prompt_cols: jnp.ndarray         # () int32 decoder-prompt cols (min_new_tokens base)


def _base_logits(logits, col_idx, gen: GenerationConfig, prompt_cols):
    """The EOS-state-independent prefix of the processor chain
    (`generate._sample_column` order): codebook_guard -> min-length EOS
    suppression. `col_idx` may be a scalar or a (W,) vector of column indices
    (broadcast against the trailing W axis of `logits`)."""
    x = logits.astype(jnp.float32)
    if gen.codebook_guard is not None:
        v = x.shape[-1]
        ids = jnp.arange(v)
        blocked = (ids >= gen.codebook_guard) & (ids != gen.eos_token_id)
        x = jnp.where(blocked, jnp.finfo(jnp.float32).min, x)
    if gen.min_new_tokens > 0:
        v = x.shape[-1]
        eos_col = jax.nn.one_hot(gen.eos_token_id, v, dtype=bool)
        active = col_idx < gen.min_new_tokens + prompt_cols
        if x.ndim == 4 and jnp.ndim(active) == 1:  # (B, K, W, V) with (W,) cols
            active = active[None, None, :, None]
        x = jnp.where(active & eos_col, jnp.finfo(jnp.float32).min, x)
    return x


def _make_spec_step(model: ParlerTTS, gen: GenerationConfig, window: int):
    """Build the one-forward-per-window body: SpecState -> SpecState.

    Static closure over (model, gen, window); everything traced comes from
    the state, so the same body serves the offline while_loop and the
    streaming chunk scan (separate jits).
    """
    dcfg = model.config.decoder
    k_cb, max_len, w = dcfg.num_codebooks, gen.max_length, window
    eos_id, pad_id = gen.eos_token_id, gen.pad_token_id
    greedy = not gen.do_sample
    hoist = gen.top_k <= 0 and gen.top_p >= 1.0
    win_cfg = (
        dcfg.sliding_window if gen.cache_implementation == "sliding_window" else None
    )
    eos_oh = jax.nn.one_hot(eos_id, dcfg.vocab_size, dtype=bool)[None, None, :]
    pad_oh = jax.nn.one_hot(pad_id, dcfg.vocab_size, dtype=jnp.float32)[None, None, :]
    cb_idx = jnp.arange(k_cb)[None, :]

    def verify_scan(logits, state: SpecState, uniforms, res_g, prop_g):
        """Sequential accept/verify over the W window columns.

        Two EOS trajectories are carried: `eos_prop` follows the CANDIDATE
        tokens (the conditioning of this forward's distributions — valid as
        proposal context even past the accept horizon) and `eos_real` follows
        the FINALIZED tokens and freezes once accepting stops. They coincide
        on the accepted prefix, which is what makes the verify exact.
        """
        b = logits.shape[0]
        col_idx = state.t + jnp.arange(w)                     # (W,)
        x = _base_logits(logits, col_idx, gen, state.prompt_cols)  # (B, K, W, V)
        props_pre = None
        if greedy:
            xs_main = jnp.moveaxis(x, 2, 0)                   # (W, B, K, V) logits
        elif hoist:
            xw = x / gen.temperature if gen.temperature != 1.0 else x
            xs_main = jnp.moveaxis(jax.nn.softmax(xw, axis=-1), 2, 0)  # probs P
            # W independent proposal draws per column, hoisted out of the scan
            props_pre = jnp.moveaxis(
                jnp.argmax(xw[:, :, :, None, :] + prop_g, axis=-1).astype(jnp.int32),
                2, 0,
            )                                                 # (W, B, K, W)
        else:
            xs_main = jnp.moveaxis(x, 2, 0)                   # logits; chain in-scan
        pat_w = jnp.moveaxis(
            jax.lax.dynamic_slice(
                state.pattern_ext, (0, 0, state.t), (b, k_cb, w)
            ),
            2, 0,
        )

        def body(carry, xs):
            eos_prop, eos_real, accepting, n_acc = carry
            if greedy:
                x_i, cand, pat, col = xs
            elif hoist:
                x_i, cand, q, pat, u, rg, col = xs
            else:
                x_i, cand, q, pat, u, rg, pg, col = xs
            adv = advance_eos_state(eos_prop, k_cb)
            es = adv.eos_seen                                  # (B, K)
            if greedy:
                xm = mask_eos_ordering(x_i, adv, eos_id)
                final = jnp.argmax(xm, axis=-1).astype(jnp.int32)
                final = jnp.where(es, pad_id, final)
                q_vec = props = None
            else:
                if hoist:
                    # exact post-EOS-mask distribution via renormalization:
                    # zero the EOS entry for forbidden codebooks and rescale
                    forbid = cb_idx > adv.first_unfinished[:, None]
                    p_eos = x_i[..., eos_id]
                    scale = jnp.where(
                        forbid, 1.0 / jnp.clip(1.0 - p_eos, 1e-9, None), 1.0
                    )
                    p = jnp.where(forbid[:, :, None] & eos_oh, 0.0,
                                  x_i * scale[:, :, None])
                    props = None           # precomputed (props_pre)
                    q_vec = x_i            # proposals were drawn from P = x_i
                else:
                    xm = mask_eos_ordering(x_i, adv, eos_id)
                    xw = xm / gen.temperature if gen.temperature != 1.0 else xm
                    xw = apply_top_k(xw, gen.top_k)
                    xw = apply_top_p(xw, gen.top_p)
                    p = jax.nn.softmax(xw, axis=-1)
                    props = jnp.argmax(
                        xw[:, :, None, :] + pg, axis=-1
                    ).astype(jnp.int32)                        # (B, K, W)
                    q_vec = p              # proposals drawn pre-pad-forcing
                # finished rows deterministically emit PAD (AR's post-sample fill)
                p = jnp.where(es[:, :, None], pad_oh, p)
                final, _ = speculative_accept(p, q, cand, u, rg)
            match = jnp.all(final == cand)
            eos_prop_new = record_sampled(adv, cand, eos_id)
            rec_real = record_sampled(adv, final, eos_id)
            finalized = accepting
            eos_real_new = jax.tree.map(
                lambda a_, b_: jnp.where(finalized, a_, b_), rec_real, eos_real
            )
            accepting_next = (
                accepting & match
                & ~jnp.all(rec_real.eos_seen)
                & (col + 1 < max_len)
            )
            stored = jnp.where(pat == -1, final, pat)
            n_acc = n_acc + finalized.astype(jnp.int32)
            ys = (final, stored, finalized, q_vec, props)
            return (eos_prop_new, eos_real_new, accepting_next, n_acc), ys

        if greedy:
            xs = (xs_main, state.cand_toks, pat_w, col_idx)
        elif hoist:
            xs = (xs_main, state.cand_toks, state.cand_q, pat_w, uniforms,
                  res_g, col_idx)
        else:
            xs = (xs_main, state.cand_toks, state.cand_q, pat_w, uniforms,
                  res_g, prop_g, col_idx)
        carry0 = (state.eos, state.eos, jnp.bool_(True), jnp.int32(0))
        (_, eos_real_f, _, n_acc), ys = jax.lax.scan(body, carry0, xs)
        finals, stored, finalized, q_vecs, props = ys
        if not greedy and hoist:
            props = props_pre
        return finals, stored, finalized, q_vecs, props, n_acc, eos_real_f

    def spec_step(variables, state: SpecState) -> SpecState:
        b = state.out_ids.shape[0]
        rng, ru, rr, rp = jax.random.split(state.rng, 4)
        v = dcfg.vocab_size
        uniforms = res_g = prop_g = None
        if not greedy:
            uniforms = jax.random.uniform(ru, (w, b, k_cb))
            res_g = jax.random.gumbel(rr, (w, b, k_cb, v), jnp.float32)
            prop_g = jax.random.gumbel(
                rp, (b, k_cb, w, w, v) if hoist else (w, b, k_cb, w, v),
                jnp.float32,
            )

        # ---- one forward over the whole window: inputs = columns t-1..t+W-2
        inputs = jax.lax.dynamic_slice(
            state.out_ids, (0, 0, state.t - 1), (b, k_cb, w)
        )
        emb = model.apply(
            variables, inputs, method=lambda m, x: m.decoder_lm.embed_ids(x)
        )
        q_pos = jnp.broadcast_to(
            state.s_p + (state.t - 1) + jnp.arange(w)[None, :], (b, w)
        ).astype(jnp.int32)
        bias = causal_self_attention_bias(q_pos, state.kv_valid, win_cfg)
        cross_bias = padding_cross_attention_bias(state.enc_mask, w)
        logits, cache = model.apply(
            variables, emb, q_pos,
            self_attn_bias=bias, cross_attn_bias=cross_bias, cache=state.cache,
            method=lambda m, *a, **kw: m.decoder_lm(*a, **kw),
        )                                                      # (B, K, W, V)

        finals, stored_f, finalized, q_vecs, props, n_acc, eos_new = verify_scan(
            logits, state, uniforms, res_g, prop_g
        )
        n = n_acc  # >= 1: the first window column is always finalized

        # ---- next window candidates for columns [t+n, t+n+W-1]: slot j draws
        # independently (draw index j) from this forward's distribution at
        # column min(n+j, W-1) (tail slots reuse the last computed column)
        src = jnp.minimum(n + jnp.arange(w), w - 1)            # (W,)
        if greedy:
            new_cand = jnp.take(finals, src, axis=0)           # (W, B, K)
            new_q = None
        else:
            props_src = jnp.take(props, src, axis=0)           # (W, B, K, W)
            new_cand = jnp.take_along_axis(
                props_src,
                jnp.arange(w)[:, None, None, None], axis=-1,
            )[..., 0]                                          # (W, B, K)
            new_q = jnp.take(q_vecs, src, axis=0)              # (W, B, K, V)
            # (B, K) entries that have finished (EOS recorded through the
            # accepted prefix) deterministically emit PAD at EVERY future
            # column, so propose PAD with q = delta_PAD: still exact (q is
            # the true proposal distribution) and the candidate now MATCHES
            # the forced-PAD final at the next verify. Proposals drawn from
            # the pre-pad-forcing softmax would otherwise reject almost
            # every window column for a finished entry, dragging the whole
            # batch back to ~1 column/forward for the EOS-cascade tail (and,
            # at B > 1, for the entire remainder after the shortest stream).
            es_next = advance_eos_state(eos_new, k_cb).eos_seen  # (B, K)
            new_cand = jnp.where(es_next[None], pad_id, new_cand)
            new_q = jnp.where(es_next[None, :, :, None], pad_oh[None], new_q)
        pat_next = jnp.moveaxis(
            jax.lax.dynamic_slice(
                state.pattern_ext, (0, 0, state.t + n), (b, k_cb, w)
            ),
            2, 0,
        )
        new_stored = jnp.where(pat_next == -1, new_cand, pat_next)

        # ---- write finals + next candidates back in one 2W-wide block
        cur = jnp.moveaxis(
            jax.lax.dynamic_slice(
                state.out_ids, (0, 0, state.t), (b, k_cb, 2 * w)
            ), 2, 0
        )                                                      # (2W, B, K)
        i_idx = jnp.arange(2 * w)
        fin_sel = jnp.take(stored_f, jnp.clip(i_idx, 0, w - 1), axis=0)
        cand_sel = jnp.take(new_stored, jnp.clip(i_idx - n, 0, w - 1), axis=0)
        blk = jnp.where(
            (i_idx < n)[:, None, None], fin_sel,
            jnp.where((i_idx < n + w)[:, None, None], cand_sel, cur),
        )
        out = jax.lax.dynamic_update_slice(
            state.out_ids, jnp.moveaxis(blk, 0, 2), (0, 0, state.t)
        )

        # roll the cache write pointer back to s_p + (t + n) - 1: rejected
        # columns' K/V rows are rewritten by the next forward before any
        # query can attend to them (causal bias masks slots > query position)
        cache = cache.replace(index=cache.index - w + n)
        return state.replace(
            out_ids=out, cand_toks=new_cand, cand_q=new_q, cache=cache,
            eos=eos_new, rng=rng, t=state.t + n, n_fwd=state.n_fwd + 1,
        )

    return spec_step


def _init_spec_state(
    model: ParlerTTS,
    gen: GenerationConfig,
    variables,
    desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
    decoder_prompt_codes,
    cache_dtype,
    window: int,
):
    """Shared setup: encoder precompute, delay pattern, cache, prefill, first
    sampled column, initial candidate window. Returns (SpecState, pattern)."""
    cfg: ParlerTTSConfig = model.config
    dcfg = cfg.decoder
    k_cb, max_len, w = dcfg.num_codebooks, gen.max_length, window
    b = desc_ids.shape[0]

    span = (0 if cfg.prompt_cross_attention else prompt_ids.shape[1]) + max_len + w
    if span > dcfg.max_position_embeddings:
        raise ValueError(
            f"prompt + max_length + window ({span}) exceeds "
            f"max_position_embeddings={dcfg.max_position_embeddings}"
        )

    if desc_mask is None:
        desc_mask = jnp.ones_like(desc_ids)
    if prompt_mask is None:
        prompt_mask = jnp.ones_like(prompt_ids)

    # ---- encoder precompute (identical to generate_tokens)
    enc = model.apply(variables, desc_ids, desc_mask, method="encode_description")
    prompt = model.apply(variables, prompt_ids, method="prompt_hidden")
    enc_states, enc_mask = model.apply(
        variables, enc, desc_mask,
        prompt if cfg.prompt_cross_attention else None,
        prompt_mask if cfg.prompt_cross_attention else None,
        method="build_encoder_states",
    )
    if cfg.prompt_cross_attention:
        s_p = 0
        prefix = jnp.zeros((b, 0, dcfg.hidden_size), enc_states.dtype)
        prefix_mask = jnp.zeros((b, 0), jnp.int32)
    else:
        s_p = prompt_ids.shape[1]
        prefix = prompt
        prefix_mask = prompt_mask.astype(jnp.int32)
    if enc_mask is None:
        enc_mask = jnp.ones(enc_states.shape[:2], jnp.int32)

    start = jnp.full((b, k_cb, 1), gen.bos_token_id, jnp.int32)
    if decoder_prompt_codes is not None:
        start = jnp.concatenate(
            [start, decoder_prompt_codes.astype(jnp.int32)], axis=-1
        )
    return _prefill_and_window(
        model, gen, variables, b, s_p, prefix, prefix_mask,
        enc_states, enc_mask, start, rng, cache_dtype, w,
    )


def _prefill_and_window(
    model, gen: GenerationConfig, variables, b, s_p, prefix, prefix_mask,
    enc_states, enc_mask, start, rng, cache_dtype, w,
):
    """Prefill + first sampled column + initial candidate window -> SpecState.
    Shared by the composite and decoder-only entry points."""
    cfg: ParlerTTSConfig = model.config
    dcfg = cfg.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    eos_id, pad_id = gen.eos_token_id, gen.pad_token_id
    greedy = not gen.do_sample
    hoist = gen.top_k <= 0 and gen.top_p >= 1.0
    win_cfg = (
        dcfg.sliding_window if gen.cache_implementation == "sliding_window" else None
    )

    # ---- delay pattern, extended by 2W columns of forced PAD so the window
    # machinery never indexes past the true pattern (columns >= L are never
    # finalized; forcing PAD keeps their conditioning identical to the AR tail)
    first_ids, pattern = build_delay_pattern_mask(
        start, gen.bos_token_id, pad_id, max_len
    )
    pattern_ext = jnp.concatenate(
        [pattern, jnp.full((b, k_cb, 2 * w), pad_id, pattern.dtype)], axis=-1
    )
    out_ids = jnp.where(pattern_ext == -1, pad_id, pattern_ext)

    # ---- cache + masks (W extra slots: the window forward writes K/V up to
    # column t+W-2 <= L+W-3)
    s_cache = s_p + max_len + w
    cache = DecoderCache.zeros(dcfg, b, s_cache, enc_states.shape[1], cache_dtype)
    cross_k, cross_v = model.apply(
        variables, enc_states, method=lambda m, x: m.decoder_lm.precompute_cross_kv(x)
    )
    cache = cache.replace(cross_k=cross_k, cross_v=cross_v)
    kv_valid = jnp.concatenate(
        [prefix_mask.astype(bool), jnp.ones((b, s_cache - s_p), bool)], axis=1
    )

    def embed_ids(ids):
        return model.apply(
            variables, ids, method=lambda m, x: m.decoder_lm.embed_ids(x)
        )

    # ---- prefill + first sampled column (identical to the AR path)
    s0 = first_ids.shape[-1]
    emb0 = embed_ids(first_ids)
    pre_embeds = jnp.concatenate([prefix.astype(emb0.dtype), emb0], axis=1)
    abs_pos = jnp.broadcast_to(jnp.arange(s_p + s0), (b, s_p + s0))
    bias = causal_self_attention_bias(abs_pos, kv_valid, win_cfg)
    cross_bias = padding_cross_attention_bias(enc_mask, s_p + s0)
    logits_pre, cache = model.apply(
        variables, pre_embeds, abs_pos,
        self_attn_bias=bias, cross_attn_bias=cross_bias, cache=cache,
        method=lambda m, *a, **kw: m.decoder_lm(*a, **kw),
    )

    rng, r1 = jax.random.split(rng)
    eos_state = init_eos_state(b, k_cb)
    col1, eos_state = _sample_column(
        logits_pre[:, :, -1, :], jnp.int32(s0), eos_state, pattern, r1, gen,
        k_cb, prompt_cols=s0,
    )
    out_ids = jax.lax.dynamic_update_slice(out_ids, col1[:, :, None], (0, 0, s0))

    # ---- initial candidate window for columns [s0+1, s0+W], proposed from the
    # prefill column's distribution (any known proposal is valid)
    t0 = s0 + 1
    x1 = _base_logits(logits_pre[:, :, -1, :], jnp.int32(s0), gen, s0)
    adv0 = advance_eos_state(eos_state, k_cb)
    if greedy:
        xm = mask_eos_ordering(x1, adv0, eos_id)
        raw = jnp.argmax(xm, axis=-1).astype(jnp.int32)
        raw = jnp.where(adv0.eos_seen, pad_id, raw)
        cand_toks = jnp.broadcast_to(raw[None], (w, b, k_cb))
        cand_q = None
    else:
        if hoist:
            xw = x1 / gen.temperature if gen.temperature != 1.0 else x1
        else:
            xm = mask_eos_ordering(x1, adv0, eos_id)
            xw = xm / gen.temperature if gen.temperature != 1.0 else xm
            xw = apply_top_k(xw, gen.top_k)
            xw = apply_top_p(xw, gen.top_p)
        q0 = jax.nn.softmax(xw, axis=-1)
        rng, rp = jax.random.split(rng)
        g = jax.random.gumbel(rp, (b, k_cb, w, xw.shape[-1]), jnp.float32)
        props0 = jnp.argmax(xw[:, :, None, :] + g, axis=-1).astype(jnp.int32)
        cand_toks = jnp.moveaxis(props0, 2, 0)            # (W, B, K)
        cand_q = jnp.broadcast_to(q0[None], (w, b, k_cb) + q0.shape[-1:])
        # finished entries propose PAD with q = delta_PAD (same exactness-and-
        # acceptance argument as the spec_step next-window forcing)
        es0 = adv0.eos_seen
        pad_oh0 = jax.nn.one_hot(pad_id, q0.shape[-1], dtype=jnp.float32)
        cand_toks = jnp.where(es0[None], pad_id, cand_toks)
        cand_q = jnp.where(es0[None, :, :, None], pad_oh0, cand_q)
    pat0 = jnp.moveaxis(
        jax.lax.dynamic_slice(pattern_ext, (0, 0, t0), (b, k_cb, w)), 2, 0
    )
    stored0 = jnp.where(pat0 == -1, cand_toks, pat0)
    out_ids = jax.lax.dynamic_update_slice(
        out_ids, jnp.moveaxis(stored0, 0, 2), (0, 0, t0)
    )

    state = SpecState(
        out_ids=out_ids, cand_toks=cand_toks, cand_q=cand_q, cache=cache,
        eos=eos_state, rng=rng, t=jnp.int32(t0), n_fwd=jnp.int32(0),
        pattern_ext=pattern_ext, kv_valid=kv_valid,
        enc_mask=jnp.asarray(enc_mask), s_p=jnp.int32(s_p),
        prompt_cols=jnp.int32(s0),
    )
    return state, pattern


def _finalize_spec_output(
    final: SpecState, pattern, gen: GenerationConfig, k_cb: int, t0,
    frame_pad_id: int,
):
    """Shared tail restoration: columns >= final.t were never finalized, so
    restore the AR tail (pattern PAD), re-apply the delay mask, un-delay, and
    package (GenerateOutput, SpecStats)."""
    max_len = gen.max_length
    cols = jnp.arange(max_len)[None, None, :]
    default_tail = jnp.where(pattern == -1, gen.pad_token_id, pattern)
    out = jnp.where(
        cols >= final.t, default_tail, final.out_ids[:, :, :max_len]
    )
    delayed = apply_delay_pattern_mask(out, pattern)
    codes = undelay_pattern(delayed, k_cb)
    lengths = valid_frame_lengths(codes, frame_pad_id)
    stats = SpecStats(forwards=final.n_fwd, columns=final.t - t0)
    return GenerateOutput(delayed, codes, lengths, final.t), stats


def generate_tokens_speculative(
    model: ParlerTTS,
    gen: GenerationConfig,
    params,
    desc_ids: jnp.ndarray,
    desc_mask: Optional[jnp.ndarray],
    prompt_ids: jnp.ndarray,
    prompt_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    decoder_prompt_codes: Optional[jnp.ndarray] = None,
    cache_dtype=jnp.bfloat16,
    window: int = 8,
):
    """Speculative generation; same contract as `generate_tokens` plus stats.

    Greedy (do_sample=False) is token-identical to the AR loop. Sampling
    preserves the AR sampling distribution but consumes the rng stream
    differently, so individual draws differ from `generate_tokens` at equal
    seeds. With B > 1 the accept horizon is shared across rows (the window
    advances by the minimum accepted prefix over the batch): still exact per
    row, but acceptance decays with B — speculation is a small-batch
    latency lever.
    """
    assert window >= 1
    dcfg = model.config.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    variables = {"params": params}

    state, pattern = _init_spec_state(
        model, gen, variables, desc_ids, desc_mask, prompt_ids, prompt_mask,
        rng, decoder_prompt_codes, cache_dtype, window,
    )
    t0 = state.t  # s0 + 1 (traced)
    spec_step = _make_spec_step(model, gen, window)

    def cond(s: SpecState):
        return (s.t < max_len) & ~jnp.all(s.eos.eos_seen)

    final = jax.lax.while_loop(cond, lambda s: spec_step(variables, s), state)
    return _finalize_spec_output(final, pattern, gen, k_cb, t0,
                                 dcfg.pad_token_id)


def make_generate_speculative(
    model: ParlerTTS,
    gen: GenerationConfig,
    window: int = 8,
    cache_dtype=jnp.bfloat16,
    mesh=None,
):
    """jit-wrapped `generate_tokens_speculative`.

    With `mesh`, the program runs SPMD exactly like `make_generate(mesh=...)`
    (batch over the 'data' axis, decoder weights over 'model' per
    `parallel/mesh.py`) — TP decode and speculation COMPOSE: TP-N divides the
    per-chip weight bytes of every window forward while the window divides
    the number of forwards, so the two latency levers multiply for large
    models (greedy output stays token-identical to the single-device AR loop;
    `tests/test_sharded_generation.py`)."""
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        b_sh, r_sh = batch_sharding(mesh), replicated(mesh)

        @functools.partial(
            jax.jit,
            in_shardings=(None, b_sh, b_sh, b_sh, b_sh, r_sh),
            out_shardings=None,
        )
        def fn_sharded(params, desc_ids, desc_mask, prompt_ids, prompt_mask,
                       rng):
            return generate_tokens_speculative(
                model, gen, params, desc_ids, desc_mask, prompt_ids,
                prompt_mask, rng, cache_dtype=cache_dtype, window=window,
            )

        return fn_sharded

    @functools.partial(jax.jit, static_argnames=())
    def fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
           decoder_prompt_codes=None):
        return generate_tokens_speculative(
            model, gen, params, desc_ids, desc_mask, prompt_ids, prompt_mask,
            rng, decoder_prompt_codes=decoder_prompt_codes,
            cache_dtype=cache_dtype, window=window,
        )

    return fn


def make_stream_functions_speculative(
    model: ParlerTTS,
    gen: GenerationConfig,
    window: int = 8,
    cache_dtype=jnp.bfloat16,
):
    """(prefill_fn, step_chunk_fn) for SPECULATIVE streaming.

    Same host-facing contract as `generate.make_stream_functions` (the state
    exposes `.t`, `.eos`, `.out_ids`; the host slices finalized columns
    `out_ids[:, :, :t]`), but each flush advances AT LEAST `n_steps` columns
    in ~n_steps/cols-per-forward forwards instead of n_steps forwards —
    the flush may overshoot by up to window-1 columns (the host sample-grid
    bookkeeping is oblivious to chunk-size jitter).

    Greedy streamed tokens are identical to the offline AR loop
    (tests/test_speculative.py).
    """
    max_len = gen.max_length
    spec_step = _make_spec_step(model, gen, window)

    @jax.jit
    def prefill_fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
                   decoder_prompt_codes=None):
        state, _ = _init_spec_state(
            model, gen, {"params": params}, desc_ids, desc_mask, prompt_ids,
            prompt_mask, rng, decoder_prompt_codes, cache_dtype, window,
        )
        return state

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def step_chunk_fn(params, state: SpecState, n_steps: int):
        variables = {"params": params}
        t_target = jnp.minimum(state.t + n_steps, max_len)

        def cond(s: SpecState):
            return (s.t < t_target) & ~jnp.all(s.eos.eos_seen)

        return jax.lax.while_loop(
            cond, lambda s: spec_step(variables, s), state
        )

    return prefill_fn, step_chunk_fn


def generate_tokens_decoder_only_speculative(
    model: ParlerTTS,
    gen: GenerationConfig,
    params,
    rng: jax.Array,
    batch_size: int,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_mask: Optional[jnp.ndarray] = None,
    decoder_prompt_codes: Optional[jnp.ndarray] = None,
    cache_dtype=jnp.bfloat16,
    window: int = 8,
):
    """Decoder-only speculative generation (reference
    `ParlerTTSForCausalLM.generate`, modeling:2071-2298, through the same
    window-verify machinery as the composite path): no text encoder, no
    prompt prefix — optional precomputed encoder states for cross-attention,
    optional audio-prompt codes. Same exactness contract as
    `generate_tokens_speculative`.
    """
    assert window >= 1
    cfg = model.config
    dcfg = cfg.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    if max_len + window > dcfg.max_position_embeddings:
        raise ValueError(
            f"max_length + window ({max_len + window}) exceeds "
            f"max_position_embeddings={dcfg.max_position_embeddings}"
        )
    b = batch_size
    variables = {"params": params}

    if encoder_hidden_states is None:
        # zero-state cross attention (the decoder still has cross-attn params)
        encoder_hidden_states = jnp.zeros((b, 1, dcfg.hidden_size), jnp.float32)
        encoder_mask = jnp.zeros((b, 1), jnp.int32)
    if encoder_mask is None:
        encoder_mask = jnp.ones(encoder_hidden_states.shape[:2], jnp.int32)

    start = jnp.full((b, k_cb, 1), gen.bos_token_id, jnp.int32)
    if decoder_prompt_codes is not None:
        start = jnp.concatenate(
            [start, decoder_prompt_codes.astype(jnp.int32)], axis=-1
        )
    prefix = jnp.zeros((b, 0, dcfg.hidden_size), jnp.float32)
    prefix_mask = jnp.zeros((b, 0), jnp.int32)
    state, pattern = _prefill_and_window(
        model, gen, variables, b, 0, prefix, prefix_mask,
        encoder_hidden_states, encoder_mask, start, rng, cache_dtype, window,
    )
    t0 = state.t
    spec_step = _make_spec_step(model, gen, window)

    def cond(s: SpecState):
        return (s.t < max_len) & ~jnp.all(s.eos.eos_seen)

    final = jax.lax.while_loop(cond, lambda s: spec_step(variables, s), state)
    return _finalize_spec_output(final, pattern, gen, k_cb, t0,
                                 dcfg.pad_token_id)

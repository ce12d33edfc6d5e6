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
    a requirement for the rejection identity);
  - a second draft source (`history_lookup_window`, prompt-lookup/REST
    style): when the last g finalized columns re-occur earlier in the
    stream, the window proposes that occurrence's continuation — as raw
    candidates under greedy, as delta proposal distributions under sampling
    (still exact: accept w.p. p(token), residual excludes it). Self-drafts
    remain the fallback when no match exists.

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
        elif x.ndim == 4 and jnp.ndim(active) == 2:  # per-row (B, W) cols
            active = active[:, None, :, None]
        x = jnp.where(active & eos_col, jnp.finfo(jnp.float32).min, x)
    return x


def history_lookup_window(out_ids, stored_f, t, n, fallback, *, g_n, w,
                          k_cb, per_row=False, return_found=False):
    """History-lookup draft (prompt-lookup / REST style).

    Self-drafted Jacobi candidates carry NO new information when the model
    is sharply sequential: token t+1 a deterministic function of token t
    means each iteration extends the correct prefix by exactly one column
    (measured: 1.01 cols/forward on an overfit mini-v1,
    benchmarks/ckpt_overfit/results.json). Codec audio is locally
    repetitive, so the strongest free draft is the model's OWN finalized
    history: find the latest position whose last `g_n` columns (all K
    codebooks, delayed-id space) equal the current suffix and propose its
    continuation as the window. Draft quality cannot affect correctness —
    the verify pass accepts only columns matching the fresh argmax — so
    this trades nothing: spurious matches cost acceptance, never exactness.
    With random weights matches essentially never occur and the self-draft
    `fallback` keeps the Jacobi behavior.

    All static shapes: the match is one (B, L, g) compare + g shifted adds
    (O(B*L*g*K) elementwise — microseconds next to the forward).

    Args: out_ids (B, K, L) stored ids finalized below column t; stored_f
    (W, B, K) this forward's finalized window trajectory (written at t
    before matching, so columns [t, t+n) are ground truth); t scalar or (B,)
    next-to-finalize at entry; n scalar or (B,) columns accepted this
    forward; fallback (W, B, K) self-draft candidates. Returns (W, B, K).
    """
    b = out_ids.shape[0]
    length = out_ids.shape[-1]
    blk = jnp.moveaxis(stored_f, 0, 2)                     # (B, K, W)
    if per_row:
        hist = jax.vmap(
            lambda ob, bb, tb: jax.lax.dynamic_update_slice(ob, bb, (0, tb))
        )(out_ids, blk, t)
        t_new = t + n                                      # (B,)
        tgt = jax.vmap(
            lambda h, tn: jax.lax.dynamic_slice(
                h, (0, tn - g_n), (k_cb, g_n))
        )(hist, t_new)                                     # (B, K, g)
    else:
        hist = jax.lax.dynamic_update_slice(out_ids, blk, (0, 0, t))
        t_new = t + n                                      # ()
        tgt = jax.lax.dynamic_slice(
            hist, (0, 0, t_new - g_n), (b, k_cb, g_n))     # (B, K, g)
    eq = (hist[:, :, :, None] == tgt[:, :, None, :]).all(axis=1)  # (B, L, g)
    n_pos = length - g_n + 1
    score = sum(
        eq[:, j:n_pos + j, j].astype(jnp.int32) for j in range(g_n)
    )                                                      # (B, P)
    pos = jnp.arange(n_pos) + g_n                          # start col p
    # p < t_new (no trivial self-match; continuation grounded in history).
    # Early columns where t_new - g < 0 clamp the tgt slice, but then no
    # p >= g can be valid, so `found` stays False — safe by construction.
    valid = pos[None, :] <= (jnp.atleast_1d(t_new)[:, None] - 1)
    sc = jnp.where(valid, score, -1)
    key = sc * (length + 1) + pos[None, :]                 # latest-match tiebreak
    best = jnp.argmax(key, axis=1)                         # (B,)
    bp = pos[best]
    found = jnp.take_along_axis(sc, best[:, None], axis=1)[:, 0] == g_n
    cont = jax.vmap(
        lambda h, p: jax.lax.dynamic_slice(h, (0, p), (k_cb, w))
    )(hist, bp)                                            # (B, K, W)
    cont = jnp.moveaxis(cont, 2, 0)                        # (W, B, K)
    blended = jnp.where(found[None, :, None], cont, fallback)
    if return_found:
        return blended, found
    return blended


def _make_spec_step(
    model: ParlerTTS, gen: GenerationConfig, window: int, per_row: bool = False,
    lookup_ngram: int = 0,
):
    """Build the one-forward-per-window body: SpecState -> SpecState.

    Static closure over (model, gen, window); everything traced comes from
    the state, so the same body serves the offline while_loop and the
    streaming chunk scan (separate jits).

    With `per_row=True` every batch row advances by ITS OWN accepted prefix
    (state.t and the cache write pointer become (B,) vectors; rows slice
    their window inputs, positions, pattern and output blocks at per-row
    offsets) instead of the batch-shared minimum — the per-forward accepted
    columns then do not decay with batch size, which turns speculation into
    a THROUGHPUT lever as well as a latency one. Rows that finish (EOS on
    every codebook, or max_length) freeze (advance 0) while the rest of the
    batch keeps moving. Each row's output is exact under the same contract
    as the shared-horizon mode.
    """
    dcfg = model.config.decoder
    k_cb, max_len, w = dcfg.num_codebooks, gen.max_length, window
    eos_id, pad_id = gen.eos_token_id, gen.pad_token_id
    greedy = not gen.do_sample
    hoist = gen.top_k <= 0 and gen.top_p >= 1.0
    win_cfg = (
        dcfg.sliding_window if gen.cache_implementation == "sliding_window" else None
    )
    # speculation x flash-decode composition: the W-column window forward
    # rides the Pallas decode kernel (W query columns of the same cache
    # stream, per-column causal limits) instead of dense-XLA attention over
    # all S_cache slots. The kernel's [start, limit) contract can't express a
    # query-relative sliding window — that mode keeps the bias path.
    use_flash = model.use_flash_decode and win_cfg is None
    eos_oh = jax.nn.one_hot(eos_id, dcfg.vocab_size, dtype=bool)[None, None, :]
    pad_oh = jax.nn.one_hot(pad_id, dcfg.vocab_size, dtype=jnp.float32)[None, None, :]
    cb_idx = jnp.arange(k_cb)[None, :]
    g_n = lookup_ngram

    def lookup_candidates(out_ids, stored_f, t, n, fallback,
                          return_found=False):
        return history_lookup_window(
            out_ids, stored_f, t, n, fallback, g_n=g_n, w=w, k_cb=k_cb,
            per_row=per_row, return_found=return_found,
        )

    def verify_window(logits, state: SpecState, uniforms, res_g):
        """Accept/verify the W window columns — VECTORIZED across the window.

        The per-column verify in the naive formulation is a W-step sequential
        scan, which costs ~W serial op-dispatch chains per forward on TPU.
        But the only true sequential dependency is the EOS trajectory of the
        CANDIDATE tokens (the conditioning of this forward's distributions),
        and that trajectory is known UP FRONT: `eos_seen` is a cumulative OR
        over candidate EOS hits, and `first_unfinished` is a tiny (B,)-sized
        bump recurrence (at most +1 per column) over that cumulative OR —
        unrolled here over W columns of scalar-ish ops while every V-sized op
        (softmax/argmax/rejection) runs once over the whole (W, B, K, V)
        block. The FINALIZED-token trajectory coincides with the candidate
        trajectory on the accepted prefix (where final == cand), which is
        what makes using the candidate chain exact; the one column that can
        differ (the first rejected one) is re-recorded at the gather below.
        """
        b = logits.shape[0]
        if per_row:
            col_idx = state.t[:, None] + jnp.arange(w)[None, :]    # (B, W)
        else:
            col_idx = state.t + jnp.arange(w)                 # (W,)
        x = _base_logits(logits, col_idx, gen, state.prompt_cols)  # (B, K, W, V)
        xw = jnp.moveaxis(x, 2, 0)                            # (W, B, K, V)
        cand = state.cand_toks                                # (W, B, K)

        # --- candidate-driven EOS chain, closed form over the window ---
        e0 = state.eos.eos_seen                               # (B, K)
        cum = jnp.cumsum(cand == eos_id, axis=0) > 0          # OR_{j<=i}
        es_after = e0[None] | cum                             # (W,B,K) through col i
        # eos_seen BEFORE column i (the `adv.eos_seen` of the naive scan)
        es = jnp.concatenate([e0[None], es_after[:-1]], axis=0)
        # first_unfinished bump recurrence: fu_i = bump(fu_{i-1}, es_i)
        fu = state.eos.first_unfinished                       # (B,)
        fus = []
        for i in range(w):
            cur_seen = jnp.take_along_axis(es[i], fu[:, None], axis=1)[:, 0]
            fu = jnp.where(cur_seen & (fu < k_cb - 1), fu + 1, fu)
            fus.append(fu)
        fu_w = jnp.stack(fus)                                 # (W, B)
        forbid = cb_idx[None] > fu_w[:, :, None]              # (W, B, K)

        # --- per-column finals, one vectorized block over (W, B, K, V) ---
        if greedy:
            xm = jnp.where(forbid[..., None] & eos_oh[None],
                           jnp.finfo(jnp.float32).min, xw)
            final = jnp.argmax(xm, axis=-1).astype(jnp.int32)
            final = jnp.where(es, pad_id, final)
            q_vecs = None
        else:
            if hoist:
                xt = xw / gen.temperature if gen.temperature != 1.0 else xw
                q_vecs = jax.nn.softmax(xt, axis=-1)          # proposal dist P
                # exact post-EOS-mask distribution via renormalization:
                # zero the EOS entry for forbidden codebooks and rescale
                p_eos = q_vecs[..., eos_id]
                scale = jnp.where(
                    forbid, 1.0 / jnp.clip(1.0 - p_eos, 1e-9, None), 1.0
                )
                p = jnp.where(forbid[..., None] & eos_oh[None], 0.0,
                              q_vecs * scale[..., None])
            else:
                xm = jnp.where(forbid[..., None] & eos_oh[None],
                               jnp.finfo(jnp.float32).min, xw)
                xt = xm / gen.temperature if gen.temperature != 1.0 else xm
                xt = apply_top_k(xt, gen.top_k)
                xt = apply_top_p(xt, gen.top_p)
                p = jax.nn.softmax(xt, axis=-1)
                q_vecs = p                 # proposals drawn pre-pad-forcing
            # finished rows deterministically emit PAD (AR's post-sample fill)
            p = jnp.where(es[..., None], pad_oh[None], p)
            final, _ = speculative_accept(p, state.cand_q, cand, uniforms, res_g)

        # --- accept horizon: finalized_i = AND_{j<i} m_j (first col always in)
        if per_row:
            match = jnp.all(final == cand, axis=2)            # (W, B)
            m = (
                match
                & ~jnp.all(es_after, axis=2)
                & (col_idx.T + 1 < max_len)
            )                                                 # (W, B)
            finalized = jnp.concatenate(
                [jnp.ones((1, b), bool),
                 jnp.cumprod(m[:-1].astype(jnp.int32), axis=0) > 0]
            )                                                 # (W, B)
            # frozen rows (all-EOS recorded, or at max_length) advance 0
            done = jnp.all(state.eos.eos_seen, axis=1) | (state.t >= max_len)
            n_acc = jnp.where(
                done, 0, jnp.sum(finalized.astype(jnp.int32), axis=0)
            )                                                 # (B,)

            i_last = jnp.clip(n_acc - 1, 0, w - 1)            # (B,)
            fin_last = jnp.take_along_axis(
                final, i_last[None, :, None], axis=0
            )[0]                                              # (B, K)
            es_last = jnp.take_along_axis(es, i_last[None, :, None], axis=0)[0]
            fu_last = jnp.take_along_axis(fu_w, i_last[None, :], axis=0)[0]
            eos_real_f = EosState(
                eos_seen=jnp.where(
                    done[:, None], state.eos.eos_seen,
                    es_last | (fin_last == eos_id),
                ),
                first_unfinished=jnp.where(
                    done, state.eos.first_unfinished, fu_last
                ),
            )
            pat_w = jnp.moveaxis(
                jax.vmap(
                    lambda pb, tb: jax.lax.dynamic_slice(pb, (0, tb), (k_cb, w))
                )(state.pattern_ext, state.t),
                2, 0,
            )
        else:
            match = jnp.all(final == cand, axis=(1, 2))       # (W,)
            m = match & ~jnp.all(es_after, axis=(1, 2)) & (col_idx + 1 < max_len)
            finalized = jnp.concatenate(
                [jnp.ones((1,), bool), jnp.cumprod(m[:-1].astype(jnp.int32)) > 0]
            )                                                 # (W,)
            n_acc = jnp.sum(finalized.astype(jnp.int32))

            # --- eos state after the last finalized column, with FINAL tokens
            # (differs from the candidate chain only when that column rejected)
            i_last = n_acc - 1
            fin_last = jax.lax.dynamic_index_in_dim(final, i_last, 0, False)
            es_last = jax.lax.dynamic_index_in_dim(es, i_last, 0, False)
            fu_last = jax.lax.dynamic_index_in_dim(fu_w, i_last, 0, False)
            eos_real_f = EosState(
                eos_seen=es_last | (fin_last == eos_id), first_unfinished=fu_last
            )
            pat_w = jnp.moveaxis(
                jax.lax.dynamic_slice(
                    state.pattern_ext, (0, 0, state.t), (b, k_cb, w)
                ),
                2, 0,
            )
        stored = jnp.where(pat_w == -1, final, pat_w)
        return final, stored, q_vecs, n_acc, eos_real_f

    def spec_step(variables, state: SpecState) -> SpecState:
        b = state.out_ids.shape[0]
        rng, ru, rr, rp = jax.random.split(state.rng, 4)
        v = dcfg.vocab_size
        uniforms = res_g = None
        if not greedy:
            uniforms = jax.random.uniform(ru, (w, b, k_cb))
            res_g = jax.random.gumbel(rr, (w, b, k_cb, v), jnp.float32)

        # ---- one forward over the whole window: inputs = columns t-1..t+W-2
        if per_row:
            inputs = jax.vmap(
                lambda ob, tb: jax.lax.dynamic_slice(ob, (0, tb - 1), (k_cb, w))
            )(state.out_ids, state.t)
            q_pos = (
                state.s_p + (state.t[:, None] - 1) + jnp.arange(w)[None, :]
            ).astype(jnp.int32)                                # (B, W)
        else:
            inputs = jax.lax.dynamic_slice(
                state.out_ids, (0, 0, state.t - 1), (b, k_cb, w)
            )
            q_pos = jnp.broadcast_to(
                state.s_p + (state.t - 1) + jnp.arange(w)[None, :], (b, w)
            ).astype(jnp.int32)
        emb = model.apply(
            variables, inputs, method=lambda m, x: m.decoder_lm.embed_ids(x)
        )
        bias = causal_self_attention_bias(q_pos, state.kv_valid, win_cfg)
        cross_bias = padding_cross_attention_bias(state.enc_mask, w)
        decode_lengths = None
        if use_flash:
            # left-padded prompts: invalid slots are the kv_valid zeros, all
            # at the front (the AR loop's flash_starts contract); the first
            # window column (position s_p + t - 1) sees pos < s_p + t
            starts = (
                state.kv_valid.shape[1]
                - state.kv_valid.sum(axis=1)
            ).astype(jnp.int32)
            decode_lengths = (starts, (state.s_p + state.t).astype(jnp.int32))
        logits, cache = model.apply(
            variables, emb, q_pos,
            self_attn_bias=bias, cross_attn_bias=cross_bias, cache=state.cache,
            decode_lengths=decode_lengths,
            method=lambda m, *a, **kw: m.decoder_lm(*a, **kw),
        )                                                      # (B, K, W, V)

        finals, stored_f, q_vecs, n_acc, eos_new = verify_window(
            logits, state, uniforms, res_g
        )
        n = n_acc  # >= 1: the first window column is always finalized

        # ---- next window candidates for columns [t+n, t+n+W-1]: slot j draws
        # independently from this forward's distribution at column
        # min(n+j, W-1) (tail slots reuse the last computed column). Drawing
        # AFTER the accept count is known needs only W gumbel vectors — the
        # per-(column, slot) pre-draw would be W**2 * V gumbels per forward
        # (~43 MB at W=24), of which only W are ever consumed.
        if per_row:
            src = jnp.minimum(
                n[None, :] + jnp.arange(w)[:, None], w - 1
            )                                                  # (W, B)
            take_src = lambda a: jnp.take_along_axis(  # noqa: E731
                a, src.reshape(src.shape + (1,) * (a.ndim - 2)), axis=0
            )
        else:
            src = jnp.minimum(n + jnp.arange(w), w - 1)        # (W,)
            take_src = lambda a: jnp.take(a, src, axis=0)  # noqa: E731
        if greedy:
            new_cand = take_src(finals)                        # (W, B, K)
            if g_n:
                new_cand = lookup_candidates(
                    state.out_ids, stored_f, state.t, n, new_cand)
                # finished (B, K) entries deterministically emit PAD at every
                # future column; forcing the draft to PAD matches the forced
                # final (self-draft finals are already PAD there)
                es_next = advance_eos_state(eos_new, k_cb).eos_seen
                new_cand = jnp.where(es_next[None], pad_id, new_cand)
            new_q = None
        else:
            new_q = take_src(q_vecs)                           # (W, B, K, V)
            if g_n:
                # SAMPLED-mode lookup drafts: where the history suffix
                # matches, propose the looked-up continuation with a DELTA
                # proposal distribution q = one_hot(token). Speculative
                # rejection stays exact for any q the candidate is actually
                # drawn from — with a delta it accepts w.p. p(token) and the
                # residual draw excludes the token — and peaked models put
                # most of p on the true continuation precisely when the
                # lookup finds it. The candidate draw below then emits the
                # lookup token deterministically (argmax of log q + gumbel).
                lk_cand, lk_found = lookup_candidates(
                    state.out_ids, stored_f, state.t, n,
                    jnp.zeros((w, b, k_cb), jnp.int32), return_found=True)
                lk_q = jax.nn.one_hot(lk_cand, v, dtype=jnp.float32)
                new_q = jnp.where(
                    lk_found[None, :, None, None], lk_q, new_q)
            gp = jax.random.gumbel(rp, (w, b, k_cb, v), jnp.float32)
            new_cand = jnp.argmax(
                jnp.where(new_q > 0.0, jnp.log(new_q), -jnp.inf) + gp, axis=-1
            ).astype(jnp.int32)                                # (W, B, K)
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
        if per_row:
            pat_next = jnp.moveaxis(
                jax.vmap(
                    lambda pb, tb: jax.lax.dynamic_slice(
                        pb, (0, tb), (k_cb, w)
                    )
                )(state.pattern_ext, state.t + n),
                2, 0,
            )
        else:
            pat_next = jnp.moveaxis(
                jax.lax.dynamic_slice(
                    state.pattern_ext, (0, 0, state.t + n), (b, k_cb, w)
                ),
                2, 0,
            )
        new_stored = jnp.where(pat_next == -1, new_cand, pat_next)

        # ---- write finals + next candidates back in one 2W-wide block
        i_idx = jnp.arange(2 * w)
        fin_sel = jnp.take(stored_f, jnp.clip(i_idx, 0, w - 1), axis=0)
        if per_row:
            cur = jnp.moveaxis(
                jax.vmap(
                    lambda ob, tb: jax.lax.dynamic_slice(
                        ob, (0, tb), (k_cb, 2 * w)
                    )
                )(state.out_ids, state.t),
                2, 0,
            )                                                  # (2W, B, K)
            cand_sel = jnp.take_along_axis(
                new_stored,
                jnp.clip(i_idx[:, None] - n[None, :], 0, w - 1)[:, :, None],
                axis=0,
            )                                                  # (2W, B, K)
            below_n = (i_idx[:, None] < n[None, :])[:, :, None]
            below_nw = (i_idx[:, None] < n[None, :] + w)[:, :, None]
            blk = jnp.where(below_n, fin_sel, jnp.where(below_nw, cand_sel, cur))
            out = jax.vmap(
                lambda ob, bb, tb: jax.lax.dynamic_update_slice(ob, bb, (0, tb))
            )(state.out_ids, jnp.moveaxis(blk, 0, 2), state.t)
        else:
            cur = jnp.moveaxis(
                jax.lax.dynamic_slice(
                    state.out_ids, (0, 0, state.t), (b, k_cb, 2 * w)
                ), 2, 0
            )                                                  # (2W, B, K)
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
    per_row: bool = False,
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
        enc_states, enc_mask, start, rng, cache_dtype, w, per_row=per_row,
    )


def _prefill_and_window(
    model, gen: GenerationConfig, variables, b, s_p, prefix, prefix_mask,
    enc_states, enc_mask, start, rng, cache_dtype, w, per_row: bool = False,
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
    cache = DecoderCache.zeros(dcfg, b, s_cache, enc_states.shape[1], cache_dtype,
                               flat_self=model.use_flash_decode)
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

    t_init = (
        jnp.full((b,), t0, jnp.int32) if per_row else jnp.int32(t0)
    )
    if per_row:
        # per-row write pointer from here on (rows advance independently)
        cache = cache.replace(
            index=jnp.broadcast_to(cache.index, (b,)).astype(jnp.int32)
        )
    state = SpecState(
        out_ids=out_ids, cand_toks=cand_toks, cand_q=cand_q, cache=cache,
        eos=eos_state, rng=rng, t=t_init, n_fwd=jnp.int32(0),
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
    per_row = jnp.ndim(final.t) == 1
    thr = final.t[:, None, None] if per_row else final.t
    out = jnp.where(
        cols >= thr, default_tail, final.out_ids[:, :, :max_len]
    )
    delayed = apply_delay_pattern_mask(out, pattern)
    codes = undelay_pattern(delayed, k_cb)
    lengths = valid_frame_lengths(codes, frame_pad_id)
    if per_row:
        stats = SpecStats(
            forwards=final.n_fwd, columns=jnp.sum(final.t - t0)
        )
        steps = jnp.max(final.t)
    else:
        stats = SpecStats(forwards=final.n_fwd, columns=final.t - t0)
        steps = final.t
    return GenerateOutput(delayed, codes, lengths, steps), stats


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
    per_row: bool = False,
    lookup_ngram: int = 3,
):
    """Speculative generation; same contract as `generate_tokens` plus stats.

    `lookup_ngram=g` (0 disables) adds a history-lookup draft source: when
    the last g finalized columns re-occur earlier in the stream, the window
    proposes that occurrence's continuation instead of the Jacobi
    self-draft (`history_lookup_window`) — raw candidates under greedy,
    delta proposal distributions under sampling. Greedy tokens and the
    sampling distribution are unchanged either way — only acceptance
    (speed) moves.

    Greedy (do_sample=False) is token-identical to the AR loop. Sampling
    preserves the AR sampling distribution but consumes the rng stream
    differently, so individual draws differ from `generate_tokens` at equal
    seeds. With B > 1 the default shares the accept horizon across rows (the
    window advances by the minimum accepted prefix over the batch): still
    exact per row, but acceptance decays with B. `per_row=True` advances
    every row by its OWN accepted prefix (per-row column pointer + per-row
    KV write offsets), keeping the B=1 acceptance rate at any batch size —
    the batched-serving mode.
    """
    assert window >= 1
    dcfg = model.config.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    variables = {"params": params}

    state, pattern = _init_spec_state(
        model, gen, variables, desc_ids, desc_mask, prompt_ids, prompt_mask,
        rng, decoder_prompt_codes, cache_dtype, window, per_row=per_row,
    )
    t0 = state.t  # s0 + 1 (traced)
    spec_step = _make_spec_step(model, gen, window, per_row=per_row,
                                lookup_ngram=lookup_ngram)

    if per_row:
        def cond(s: SpecState):
            active = (s.t < max_len) & ~jnp.all(s.eos.eos_seen, axis=1)
            return jnp.any(active)
    else:
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
    per_row: bool = False,
    lookup_ngram: int = 3,
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
                per_row=per_row, lookup_ngram=lookup_ngram,
            )

        return fn_sharded

    @functools.partial(jax.jit, static_argnames=())
    def fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
           decoder_prompt_codes=None):
        return generate_tokens_speculative(
            model, gen, params, desc_ids, desc_mask, prompt_ids, prompt_mask,
            rng, decoder_prompt_codes=decoder_prompt_codes,
            cache_dtype=cache_dtype, window=window, per_row=per_row,
            lookup_ngram=lookup_ngram,
        )

    return fn


def make_stream_functions_speculative(
    model: ParlerTTS,
    gen: GenerationConfig,
    window: int = 8,
    cache_dtype=jnp.bfloat16,
    per_row: bool = False,
    lookup_ngram: int = 3,
):
    """(prefill_fn, step_chunk_fn) for SPECULATIVE streaming.

    Same host-facing contract as `generate.make_stream_functions` (the state
    exposes `.t`, `.eos`, `.out_ids`; the host slices finalized columns
    `out_ids[:, :, :t]`), but each flush advances AT LEAST `n_steps` columns
    in ~n_steps/cols-per-forward forwards instead of n_steps forwards —
    the flush may overshoot by up to window-1 columns (the host sample-grid
    bookkeeping is oblivious to chunk-size jitter).

    With `per_row=True` (batched streaming) every row advances by its OWN
    accepted prefix: `state.t` is (B,), a chunk step runs forwards until
    every active row has reached ITS target, and the host gates each flush on
    the slowest active row. The slowest-row pointer after f forwards is
    min_i(sum_f n_i) >= sum_f(min_i n_i) — per-row advance dominates the
    shared horizon for every batch, and faster rows buffer finalized columns
    that surface as soon as the gate catches up. Rows' columns beyond their
    own pointer hold unverified window candidates — the host must mask them
    (pipeline.stream_batch restores the pattern tail before un-delaying).

    Greedy streamed tokens are identical to the offline AR loop
    (tests/test_speculative.py).
    """
    max_len = gen.max_length
    spec_step = _make_spec_step(model, gen, window, per_row=per_row,
                                lookup_ngram=lookup_ngram)

    @jax.jit
    def prefill_fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
                   decoder_prompt_codes=None):
        state, _ = _init_spec_state(
            model, gen, {"params": params}, desc_ids, desc_mask, prompt_ids,
            prompt_mask, rng, decoder_prompt_codes, cache_dtype, window,
            per_row=per_row,
        )
        return state

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def step_chunk_fn(params, state: SpecState, n_steps: int):
        variables = {"params": params}
        t_target = jnp.minimum(state.t + n_steps, max_len)  # scalar or (B,)

        if per_row:
            def cond(s: SpecState):
                lagging = (s.t < t_target) & ~jnp.all(s.eos.eos_seen, axis=1)
                return jnp.any(lagging)
        else:
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
    lookup_ngram: int = 3,
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
    spec_step = _make_spec_step(model, gen, window, lookup_ngram=lookup_ngram)

    def cond(s: SpecState):
        return (s.t < max_len) & ~jnp.all(s.eos.eos_seen)

    final = jax.lax.while_loop(cond, lambda s: spec_step(variables, s), state)
    return _finalize_spec_output(final, pattern, gen, k_cb, t0,
                                 dcfg.pad_token_id)

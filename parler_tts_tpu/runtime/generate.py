"""TPU-native generation runtime.

The reference drives generation from a Python loop over `GenerationMixin._sample`
with a stateful logits processor and per-step host work
(`/root/reference/parler_tts/modeling_parler_tts.py:3321-3653`). Here the ENTIRE
token loop — prefill, per-step decoder forward over the static KV cache,
delay-pattern override, EOS-ordering constraint, min-length suppression,
temperature/top-k/top-p sampling, early-exit — is one jitted program built from
`lax.while_loop`, compiled once and iterated on-device with zero host syncs.

Variable-length generation under static shapes: the loop early-exits when every
codebook of every sample has emitted EOS; unsampled tail columns hold PAD so
`valid_frame_lengths` recovers the per-sample `audios_length` output parity
(reference modeling:3648-3650).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

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
    init_eos_state,
    mask_eos_ordering,
    record_sampled,
    sample_tokens,
    suppress_eos_before_min_length,
)


@flax.struct.dataclass
class GenLoopState:
    out_ids: jnp.ndarray   # (B, K, L) delayed ids (pattern-overridden)
    cache: DecoderCache
    eos: EosState
    rng: jax.Array
    t: jnp.ndarray         # () int32 — next column to sample


class GenerateOutput(NamedTuple):
    delayed_ids: jnp.ndarray  # (B, K, L)
    codes: jnp.ndarray        # (B, K, L - K) un-delayed
    lengths: jnp.ndarray      # (B,) valid frame counts
    steps: jnp.ndarray        # () columns actually sampled (early exit aware)


def _sample_column(
    logits: jnp.ndarray,  # (B, K, V)
    t: jnp.ndarray,
    eos_state: EosState,
    pattern: jnp.ndarray,
    rng: jax.Array,
    gen: GenerationConfig,
    num_codebooks: int,
    prompt_cols: int = 1,
) -> Tuple[jnp.ndarray, EosState]:
    """One sampling event: processors in reference order (min-length -> EOS
    ordering -> warpers), finished-row PAD forcing, delay-pattern override.
    `prompt_cols` = decoder-prompt column count (1 = BOS only; more when voice
    steering) — min_new_tokens counts from there, like HF's prompt_length_to_skip.
    """
    x = logits.astype(jnp.float32)
    if gen.codebook_guard is not None:
        v = x.shape[-1]
        ids = jnp.arange(v)
        blocked = (ids >= gen.codebook_guard) & (ids != gen.eos_token_id)
        x = jnp.where(blocked[None, None, :], jnp.finfo(jnp.float32).min, x)
    if gen.min_new_tokens > 0:
        x = suppress_eos_before_min_length(
            x, t, gen.min_new_tokens + prompt_cols, gen.eos_token_id
        )
    eos_state = advance_eos_state(eos_state, num_codebooks)
    x = mask_eos_ordering(x, eos_state, gen.eos_token_id)
    toks = sample_tokens(
        rng, x,
        do_sample=gen.do_sample, temperature=gen.temperature,
        top_k=gen.top_k, top_p=gen.top_p,
    )
    # finished rows keep emitting PAD (== EOS id in the v1 layout), mirroring
    # HF `_sample`'s unfinished-sequence fill
    toks = jnp.where(eos_state.eos_seen, gen.pad_token_id, toks)
    eos_state = record_sampled(eos_state, toks, gen.eos_token_id)
    pat_col = pattern[:, :, t]
    stored = jnp.where(pat_col == -1, toks, pat_col)
    return stored, eos_state


def generate_tokens(
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
) -> GenerateOutput:
    """Full token generation (trace-once; wrap in jax.jit via `make_generate`).

    `decoder_prompt_codes` (B, K, T0) enables voice steering: codec tokens of a
    reference audio clip are used as the decoder prompt, so generation
    continues that voice (reference `_prepare_audio_encoder_kwargs_for_generation`,
    modeling:3136-3194 — there the codes come from `audio_encoder.encode`; here
    the pipeline encodes with the JAX DAC and passes codes in).
    """
    cfg: ParlerTTSConfig = model.config
    dcfg = cfg.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    b = desc_ids.shape[0]
    variables = {"params": params}

    # the cache/position span is prompt prefix + max_len; past the position
    # table, jnp.take's fill mode would silently emit NaN rows (torch raises)
    span = (0 if cfg.prompt_cross_attention else prompt_ids.shape[1]) + max_len
    if span > dcfg.max_position_embeddings:
        raise ValueError(
            f"prompt ({prompt_ids.shape[1]}) + max_length ({max_len}) exceeds "
            f"max_position_embeddings={dcfg.max_position_embeddings}"
        )

    if desc_mask is None:
        desc_mask = jnp.ones_like(desc_ids)
    if prompt_mask is None:
        prompt_mask = jnp.ones_like(prompt_ids)

    # ---- encoder precompute
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

    # ---- delay pattern (BOS start column, plus audio-prompt codes when
    # voice-steering — the reference prepends the start token the same way,
    # modeling:3022-3031)
    start = jnp.full((b, k_cb, 1), gen.bos_token_id, jnp.int32)
    if decoder_prompt_codes is not None:
        start = jnp.concatenate(
            [start, decoder_prompt_codes.astype(jnp.int32)], axis=-1
        )
    first_ids, pattern = build_delay_pattern_mask(
        start, gen.bos_token_id, gen.pad_token_id, max_len
    )
    out_ids = jnp.where(pattern == -1, gen.pad_token_id, pattern)

    # ---- cache + masks
    s_cache = s_p + max_len
    cache = DecoderCache.zeros(dcfg, b, s_cache, enc_states.shape[1], cache_dtype,
                               flat_self=model.use_flash_decode)
    cross_k, cross_v = model.apply(
        variables, enc_states, method=lambda m, x: m.decoder_lm.precompute_cross_kv(x)
    )
    cache = cache.replace(cross_k=cross_k, cross_v=cross_v)

    kv_valid = jnp.concatenate(
        [prefix_mask.astype(bool), jnp.ones((b, max_len), bool)], axis=1
    )

    # left-padded prompts: first valid cache slot per batch row (for the
    # opt-in flash-decode kernel's mask-free masking)
    flash_starts = (s_p - prefix_mask.sum(axis=1)).astype(jnp.int32)

    # sliding-window cache option (reference modeling:3269-3270)
    window = (
        dcfg.sliding_window if gen.cache_implementation == "sliding_window" else None
    )
    # the Pallas flash-decode kernel's [start, limit) bounds can't express a
    # query-relative window; route windowed decode through the bias path
    use_decode_lengths = window is None

    # Positions are ABSOLUTE cache-slot indices for both sinusoidal and RoPE:
    # the reference derives position_ids from cache_position before its RoPE
    # mask-cumsum branch, which is therefore dead code (modeling:1466-1468).
    def decoder_forward(embeds, abs_positions, cache, decode_lengths=None):
        bias = causal_self_attention_bias(abs_positions, kv_valid, window)
        cross_bias = padding_cross_attention_bias(enc_mask, embeds.shape[1])
        return model.apply(
            variables, embeds, abs_positions,
            self_attn_bias=bias, cross_attn_bias=cross_bias, cache=cache,
            decode_lengths=decode_lengths,
            method=lambda m, *a, **kw: m.decoder_lm(*a, **kw),
        )

    def embed_ids(ids):
        return model.apply(
            variables, ids, method=lambda m, x: m.decoder_lm.embed_ids(x)
        )

    # ---- prefill: [prompt prefix, delayed columns 0 .. s0-1]
    s0 = first_ids.shape[-1]  # 1 (BOS) or 1 + voice-prompt length
    emb0 = embed_ids(first_ids)
    pre_embeds = jnp.concatenate([prefix.astype(emb0.dtype), emb0], axis=1)
    abs_pos = jnp.broadcast_to(jnp.arange(s_p + s0), (b, s_p + s0))
    logits_pre, cache = decoder_forward(pre_embeds, abs_pos, cache)

    # ---- first sampled column (index s0)
    rng, r1 = jax.random.split(rng)
    eos_state = init_eos_state(b, k_cb)
    col1, eos_state = _sample_column(
        logits_pre[:, :, -1, :], jnp.int32(s0), eos_state, pattern, r1, gen,
        k_cb, prompt_cols=s0,
    )
    out_ids = jax.lax.dynamic_update_slice(out_ids, col1[:, :, None], (0, 0, s0))

    # ---- decode loop: sample columns s0+1 .. L-1
    def cond(s: GenLoopState):
        return (s.t < max_len) & ~jnp.all(s.eos.eos_seen)

    def body(s: GenLoopState):
        col_in = jax.lax.dynamic_slice_in_dim(s.out_ids, s.t - 1, 1, axis=2)  # (B,K,1)
        emb = embed_ids(col_in)
        q_pos = jnp.full((b, 1), s_p, jnp.int32) + (s.t - 1)
        logits, cache = decoder_forward(
            emb, q_pos, s.cache,
            decode_lengths=(flash_starts, s_p + s.t) if use_decode_lengths else None,
        )
        rng, r = jax.random.split(s.rng)
        col, eos = _sample_column(
            logits[:, :, -1, :], s.t, s.eos, pattern, r, gen, k_cb,
            prompt_cols=s0,
        )
        out = jax.lax.dynamic_update_slice(
            s.out_ids, col[:, :, None], (0, 0, s.t)
        )
        return GenLoopState(out, cache, eos, rng, s.t + 1)

    init = GenLoopState(out_ids, cache, eos_state, rng, jnp.int32(s0 + 1))
    final = jax.lax.while_loop(cond, body, init)

    delayed = apply_delay_pattern_mask(final.out_ids, pattern)
    codes = undelay_pattern(delayed, k_cb)
    lengths = valid_frame_lengths(codes, dcfg.pad_token_id)  # pad==eos==codebook_size
    return GenerateOutput(delayed, codes, lengths, final.t)


def make_generate(model: ParlerTTS, gen: GenerationConfig, cache_dtype=jnp.bfloat16,
                  mesh=None):
    """jit-wrapped `generate_tokens` (one compile per input-shape signature).

    With `mesh`, batched serving shards the batch over the mesh's 'data' axis
    (params replicated / 'model'-sharded per the partition rules) — the
    multi-chip throughput path; XLA inserts any needed collectives.
    """
    if mesh is None:
        @functools.partial(jax.jit, static_argnames=())
        def fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
               decoder_prompt_codes=None):
            return generate_tokens(
                model, gen, params, desc_ids, desc_mask, prompt_ids, prompt_mask,
                rng, decoder_prompt_codes=decoder_prompt_codes,
                cache_dtype=cache_dtype,
            )

        return fn

    from ..parallel.mesh import batch_sharding, replicated

    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(None, b_sh, b_sh, b_sh, b_sh, r_sh),
        out_shardings=None,
    )
    def fn_sharded(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng):
        return generate_tokens(
            model, gen, params, desc_ids, desc_mask, prompt_ids, prompt_mask,
            rng, cache_dtype=cache_dtype,
        )

    return fn_sharded


def generate_tokens_fused(
    model: ParlerTTS,
    gen: GenerationConfig,
    params,
    fused,  # FusedParams (ops/pallas/fused_decode_step.py), prepared once
    desc_ids: jnp.ndarray,
    desc_mask: Optional[jnp.ndarray],
    prompt_ids: jnp.ndarray,
    prompt_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    decoder_prompt_codes: Optional[jnp.ndarray] = None,
    block_s: int = 256,
    interpret: bool = False,
) -> GenerateOutput:
    """B=1 generation whose decode step is the fused Pallas megakernel
    (`ops/pallas/fused_decode_step.py`): the whole 24-layer stack runs as ONE
    kernel per token with int8 weights double-buffered layer-ahead into VMEM,
    eliminating the per-op dispatch latency that bounds B=1 decode. Prefill and
    sampling stay on the XLA path; tokens may differ from the bf16 path only
    through int8 weight rounding (serving trade-off, opt-in via
    `ParlerTTSPipeline(..., fused_decode=True)`).
    """
    from ..ops.pallas.fused_decode_step import fused_decode_layers
    from ..ops.positions import sinusoidal_embed, sinusoidal_table

    cfg: ParlerTTSConfig = model.config
    dcfg = cfg.decoder
    assert desc_ids.shape[0] == 1, "fused decode path is B=1 (serving latency mode)"
    assert not dcfg.rope_embeddings, "fused kernel: sinusoidal positions only"
    assert gen.cache_implementation != "sliding_window", (
        "fused kernel uses [start, limit) bounds; sliding_window needs the XLA path"
    )
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    b = 1
    n_layers, d = dcfg.num_hidden_layers, dcfg.hidden_size
    n_heads, dh = dcfg.num_attention_heads, dcfg.head_dim
    variables = {"params": params}

    if desc_mask is None:
        desc_mask = jnp.ones_like(desc_ids)
    if prompt_mask is None:
        prompt_mask = jnp.ones_like(prompt_ids)

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
        prefix = jnp.zeros((b, 0, d), enc_states.dtype)
        prefix_mask = jnp.zeros((b, 0), jnp.int32)
    else:
        s_p = prompt_ids.shape[1]
        prefix = prompt
        prefix_mask = prompt_mask.astype(jnp.int32)

    start_col = jnp.full((b, k_cb, 1), gen.bos_token_id, jnp.int32)
    if decoder_prompt_codes is not None:
        start_col = jnp.concatenate(
            [start_col, decoder_prompt_codes.astype(jnp.int32)], axis=-1
        )
    first_ids, pattern = build_delay_pattern_mask(
        start_col, gen.bos_token_id, gen.pad_token_id, max_len
    )
    out_ids = jnp.where(pattern == -1, gen.pad_token_id, pattern)

    # cache rows padded to the kernel block so streaming DMAs stay in-bounds;
    # rows past `limit` are never read (mask-free [start, limit) bounds).
    # NB: always the 5-D layout — the megakernel consumes (L, S, D) reshapes
    # of it and the loop body writes back with 5-D update slices, so the flat
    # flash-decode layout must not leak in here even when the model enables it.
    s_cache = -(-(s_p + max_len) // block_s) * block_s
    cache = DecoderCache.zeros(dcfg, b, s_cache, enc_states.shape[1], jnp.bfloat16,
                               flat_self=False)
    cross_k, cross_v = model.apply(
        variables, enc_states, method=lambda m, x: m.decoder_lm.precompute_cross_kv(x)
    )
    cache = cache.replace(cross_k=cross_k, cross_v=cross_v)

    kv_valid = jnp.concatenate(
        [prefix_mask.astype(bool), jnp.ones((b, s_cache - s_p), bool)], axis=1
    )
    flash_start = (s_p - prefix_mask.sum(axis=1)).astype(jnp.int32)[0]

    def embed_ids(ids):
        return model.apply(
            variables, ids, method=lambda m, x: m.decoder_lm.embed_ids(x)
        )

    # ---- prefill on the XLA path (multi-column; runs once)
    s0 = first_ids.shape[-1]
    emb0 = embed_ids(first_ids)
    pre_embeds = jnp.concatenate([prefix.astype(emb0.dtype), emb0], axis=1)
    abs_pos = jnp.broadcast_to(jnp.arange(s_p + s0), (b, s_p + s0))
    bias = causal_self_attention_bias(abs_pos, kv_valid)
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

    # ---- fused decode loop
    table = sinusoidal_table(dcfg.max_position_embeddings, d, jnp.float32)
    s_enc = enc_states.shape[1]
    enc_bias = jnp.where(
        enc_mask.astype(bool), 0.0, jnp.finfo(jnp.float32).min
    ).astype(jnp.float32)  # (1, S_enc)
    ln = params["decoder"]["decoder"]["layer_norm"]
    lm_heads = params["decoder"]["lm_heads"]  # (K, D, V)

    def cond(s: GenLoopState):
        return (s.t < max_len) & ~jnp.all(s.eos.eos_seen)

    def body(s: GenLoopState):
        col_in = jax.lax.dynamic_slice_in_dim(s.out_ids, s.t - 1, 1, axis=2)
        q_pos = jnp.full((b, 1), s_p, jnp.int32) + (s.t - 1)
        x_emb = (embed_ids(col_in).astype(jnp.float32)
                 + sinusoidal_embed(table, q_pos))[0]  # (1, D)
        n_rows = (jnp.int32(s_p) + s.t - 1).astype(jnp.int32)
        hidden, new_k, new_v = fused_decode_layers(
            dcfg, fused, x_emb.astype(jnp.bfloat16),
            s.cache.self_k[:, 0].reshape(n_layers, s_cache, d),
            s.cache.self_v[:, 0].reshape(n_layers, s_cache, d),
            s.cache.cross_k[:, 0].reshape(n_layers, s_enc, d),
            s.cache.cross_v[:, 0].reshape(n_layers, s_enc, d),
            enc_bias, flash_start, n_rows,
            block_s=block_s, interpret=interpret,
        )
        # final LN (f32) + stacked heads — tiny; stays in XLA
        hf = hidden.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = ((hf - mu) ** 2).mean(-1, keepdims=True)
        hf = (hf - mu) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        logits = jnp.einsum("td,kdv->ktv", hf, lm_heads.astype(jnp.float32))[None]

        cache = s.cache.replace(
            self_k=jax.lax.dynamic_update_slice(
                s.cache.self_k,
                new_k.reshape(n_layers, 1, 1, n_heads, dh).astype(s.cache.self_k.dtype),
                (0, 0, n_rows, 0, 0),
            ),
            self_v=jax.lax.dynamic_update_slice(
                s.cache.self_v,
                new_v.reshape(n_layers, 1, 1, n_heads, dh).astype(s.cache.self_v.dtype),
                (0, 0, n_rows, 0, 0),
            ),
        )
        rng, r = jax.random.split(s.rng)
        col, eos = _sample_column(
            logits[:, :, -1, :], s.t, s.eos, pattern, r, gen, k_cb, prompt_cols=s0,
        )
        out = jax.lax.dynamic_update_slice(s.out_ids, col[:, :, None], (0, 0, s.t))
        return GenLoopState(out, cache, eos, rng, s.t + 1)

    init = GenLoopState(out_ids, cache, eos_state, rng, jnp.int32(s0 + 1))
    final = jax.lax.while_loop(cond, body, init)

    delayed = apply_delay_pattern_mask(final.out_ids, pattern)
    codes = undelay_pattern(delayed, k_cb)
    lengths = valid_frame_lengths(codes, dcfg.pad_token_id)
    return GenerateOutput(delayed, codes, lengths, final.t)


def make_generate_fused(model: ParlerTTS, gen: GenerationConfig, block_s: int = 256,
                        interpret: bool = False):
    """jit-wrapped `generate_tokens_fused`; FusedParams passed as a jit arg so
    the int8 weights live on device once (not closure-captured)."""
    @jax.jit
    def fn(params, fused, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
           decoder_prompt_codes=None):
        return generate_tokens_fused(
            model, gen, params, fused, desc_ids, desc_mask, prompt_ids,
            prompt_mask, rng, decoder_prompt_codes=decoder_prompt_codes,
            block_s=block_s, interpret=interpret,
        )

    return fn


def generate_tokens_decoder_only(
    model: ParlerTTS,
    gen: GenerationConfig,
    params,
    rng: jax.Array,
    batch_size: int,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_mask: Optional[jnp.ndarray] = None,
    decoder_prompt_codes: Optional[jnp.ndarray] = None,
    cache_dtype=jnp.bfloat16,
) -> GenerateOutput:
    """Decoder-only generation (reference `ParlerTTSForCausalLM.generate`,
    modeling:2071-2298): no text encoder, no prompt prefix — optional
    precomputed encoder states for cross-attention, optional audio-prompt codes.
    """
    dcfg = model.config.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    if max_len > dcfg.max_position_embeddings:
        raise ValueError(
            f"max_length ({max_len}) exceeds "
            f"max_position_embeddings={dcfg.max_position_embeddings}"
        )
    b = batch_size
    variables = {"params": params}

    start = jnp.full((b, k_cb, 1), gen.bos_token_id, jnp.int32)
    if decoder_prompt_codes is not None:
        start = jnp.concatenate([start, decoder_prompt_codes.astype(jnp.int32)], axis=-1)
    first_ids, pattern = build_delay_pattern_mask(
        start, gen.bos_token_id, gen.pad_token_id, max_len
    )
    out_ids = jnp.where(pattern == -1, gen.pad_token_id, pattern)

    if encoder_hidden_states is None:
        # zero-state cross attention (the decoder still has cross-attn params)
        encoder_hidden_states = jnp.zeros((b, 1, dcfg.hidden_size), jnp.float32)
        encoder_mask = jnp.zeros((b, 1), jnp.int32)

    cache = DecoderCache.zeros(dcfg, b, max_len, encoder_hidden_states.shape[1], cache_dtype,
                               flat_self=model.use_flash_decode)
    cross_k, cross_v = model.apply(
        variables, encoder_hidden_states,
        method=lambda m, x: m.decoder_lm.precompute_cross_kv(x),
    )
    cache = cache.replace(cross_k=cross_k, cross_v=cross_v)
    kv_valid = jnp.ones((b, max_len), bool)
    window = (
        dcfg.sliding_window if gen.cache_implementation == "sliding_window" else None
    )

    def fwd(embeds, abs_positions, cache):
        bias = causal_self_attention_bias(abs_positions, kv_valid, window)
        cross_bias = padding_cross_attention_bias(encoder_mask, embeds.shape[1])
        return model.apply(
            variables, embeds, abs_positions,
            self_attn_bias=bias, cross_attn_bias=cross_bias, cache=cache,
            method=lambda m, *a, **kw: m.decoder_lm(*a, **kw),
        )

    def embed_ids(ids):
        return model.apply(variables, ids, method=lambda m, x: m.decoder_lm.embed_ids(x))

    s0 = first_ids.shape[-1]
    abs_pos = jnp.broadcast_to(jnp.arange(s0), (b, s0))
    logits_pre, cache = fwd(embed_ids(first_ids), abs_pos, cache)

    rng, r1 = jax.random.split(rng)
    eos_state = init_eos_state(b, k_cb)
    col1, eos_state = _sample_column(
        logits_pre[:, :, -1, :], jnp.int32(s0), eos_state, pattern, r1, gen,
        k_cb, prompt_cols=s0,
    )
    out_ids = jax.lax.dynamic_update_slice(out_ids, col1[:, :, None], (0, 0, s0))

    def cond(s: GenLoopState):
        return (s.t < max_len) & ~jnp.all(s.eos.eos_seen)

    def body(s: GenLoopState):
        col_in = jax.lax.dynamic_slice_in_dim(s.out_ids, s.t - 1, 1, axis=2)
        q_pos = jnp.zeros((b, 1), jnp.int32) + (s.t - 1)
        logits, cache = fwd(embed_ids(col_in), q_pos, s.cache)
        rng, r = jax.random.split(s.rng)
        col, eos = _sample_column(
            logits[:, :, -1, :], s.t, s.eos, pattern, r, gen, k_cb, prompt_cols=s0
        )
        out = jax.lax.dynamic_update_slice(s.out_ids, col[:, :, None], (0, 0, s.t))
        return GenLoopState(out, cache, eos, rng, s.t + 1)

    final = jax.lax.while_loop(
        cond, body, GenLoopState(out_ids, cache, eos_state, rng, jnp.int32(s0 + 1))
    )
    delayed = apply_delay_pattern_mask(final.out_ids, pattern)
    codes = undelay_pattern(delayed, k_cb)
    lengths = valid_frame_lengths(codes, dcfg.pad_token_id)
    return GenerateOutput(delayed, codes, lengths, final.t)


# ------------------------------------------------------------------ streaming
@flax.struct.dataclass
class StreamState:
    """Carried state for the host-driven streaming loop (prefill + chunk steps)."""

    out_ids: jnp.ndarray
    cache: DecoderCache
    eos: EosState
    rng: jax.Array
    t: jnp.ndarray
    pattern: jnp.ndarray
    kv_valid: jnp.ndarray
    enc_mask: Optional[jnp.ndarray]
    s_p: jnp.ndarray
    # decoder-prompt column count (1 = BOS only; 1+T0 when voice steering).
    # min_new_tokens must count from here exactly like the offline path
    # (`generate_tokens` passes prompt_cols=s0 at :231) or streaming suppresses
    # EOS for fewer steps than offline under voice steering.
    prompt_cols: jnp.ndarray


def make_stream_functions(model: ParlerTTS, gen: GenerationConfig, cache_dtype=jnp.bfloat16):
    """(prefill_fn, step_chunk_fn) for streaming generation.

    `prefill_fn(params, desc..., prompt..., rng) -> StreamState`
    `step_chunk_fn(params, state, n_steps) -> StreamState` advances a fixed
    number of columns (static n via closure-free scan bound by `gen.max_length`,
    masked by done state) so the host can fetch tokens every `play_steps`.
    """
    cfg = model.config
    dcfg = cfg.decoder
    k_cb, max_len = dcfg.num_codebooks, gen.max_length
    window = (
        dcfg.sliding_window if gen.cache_implementation == "sliding_window" else None
    )

    @jax.jit
    def prefill_fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, rng,
                   decoder_prompt_codes=None):
        b = desc_ids.shape[0]
        # same trace-time guard as generate_tokens: positions past the table
        # would silently produce NaN audio (shapes are static under jit)
        span = (0 if cfg.prompt_cross_attention else prompt_ids.shape[1]) + max_len
        if span > dcfg.max_position_embeddings:
            raise ValueError(
                f"prompt ({prompt_ids.shape[1]}) + max_length ({max_len}) exceeds "
                f"max_position_embeddings={dcfg.max_position_embeddings}"
            )
        variables = {"params": params}
        if desc_mask is None:
            desc_mask = jnp.ones_like(desc_ids)
        if prompt_mask is None:
            prompt_mask = jnp.ones_like(prompt_ids)
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

        start = jnp.full((b, k_cb, 1), gen.bos_token_id, jnp.int32)
        if decoder_prompt_codes is not None:  # voice steering
            start = jnp.concatenate(
                [start, decoder_prompt_codes.astype(jnp.int32)], axis=-1
            )
        first_ids, pattern = build_delay_pattern_mask(
            start, gen.bos_token_id, gen.pad_token_id, max_len
        )
        out_ids = jnp.where(pattern == -1, gen.pad_token_id, pattern)

        cache = DecoderCache.zeros(dcfg, b, s_p + max_len, enc_states.shape[1], cache_dtype,
                                   flat_self=model.use_flash_decode)
        cross_k, cross_v = model.apply(
            variables, enc_states, method=lambda m, x: m.decoder_lm.precompute_cross_kv(x)
        )
        cache = cache.replace(cross_k=cross_k, cross_v=cross_v)
        kv_valid = jnp.concatenate(
            [prefix_mask.astype(bool), jnp.ones((b, max_len), bool)], axis=1
        )

        s0 = first_ids.shape[-1]
        emb0 = model.apply(variables, first_ids, method=lambda m, x: m.decoder_lm.embed_ids(x))
        pre_embeds = jnp.concatenate([prefix.astype(emb0.dtype), emb0], axis=1)
        abs_pos = jnp.broadcast_to(jnp.arange(s_p + s0), (b, s_p + s0))
        bias = causal_self_attention_bias(abs_pos, kv_valid, window)
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
        return StreamState(
            out_ids, cache, eos_state, rng, jnp.int32(s0 + 1), pattern, kv_valid,
            enc_mask, jnp.int32(s_p), jnp.int32(s0),
        )

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def step_chunk_fn(params, state: StreamState, n_steps: int):
        variables = {"params": params}
        b = state.out_ids.shape[0]

        def one(s: StreamState, _):
            done = (s.t >= max_len) | jnp.all(s.eos.eos_seen)

            col_in = jax.lax.dynamic_slice_in_dim(s.out_ids, s.t - 1, 1, axis=2)
            emb = model.apply(variables, col_in, method=lambda m, x: m.decoder_lm.embed_ids(x))
            q_pos = s.s_p[None, None] + (s.t - 1)
            q_pos = jnp.broadcast_to(q_pos, (b, 1)).astype(jnp.int32)
            bias = causal_self_attention_bias(q_pos, s.kv_valid, window)
            cross_bias = padding_cross_attention_bias(s.enc_mask, 1)
            logits, cache = model.apply(
                variables, emb, q_pos,
                self_attn_bias=bias, cross_attn_bias=cross_bias, cache=s.cache,
                method=lambda m, *a, **kw: m.decoder_lm(*a, **kw),
            )
            rng, r = jax.random.split(s.rng)
            col, eos = _sample_column(
                logits[:, :, -1, :], s.t, s.eos, s.pattern, r, gen, k_cb,
                prompt_cols=s.prompt_cols,
            )
            out = jax.lax.dynamic_update_slice(s.out_ids, col[:, :, None], (0, 0, s.t))

            # freeze everything once done (static-shape no-op steps)
            new = StreamState(
                jnp.where(done, s.out_ids, out),
                jax.tree.map(lambda a, c: jnp.where(done, a, c), s.cache, cache),
                jax.tree.map(lambda a, c: jnp.where(done, a, c), s.eos, eos),
                jnp.where(done, s.rng, rng),
                jnp.where(done, s.t, s.t + 1),
                s.pattern, s.kv_valid, s.enc_mask, s.s_p, s.prompt_cols,
            )
            return new, None

        state, _ = jax.lax.scan(one, state, None, length=n_steps)
        return state

    return prefill_fn, step_chunk_fn

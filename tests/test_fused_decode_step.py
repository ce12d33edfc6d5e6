"""Fused decode-step megakernel vs the XLA decoder path (tokens + hidden)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.config import DecoderConfig
from parler_tts_tpu.models.decoder import DecoderCache, ParlerForCausalLM
from parler_tts_tpu.ops.masks import causal_self_attention_bias, padding_cross_attention_bias
from parler_tts_tpu.ops.pallas.fused_decode_step import (
    fused_decode_layers,
    prepare_fused_params,
)
from parler_tts_tpu.ops.positions import sinusoidal_embed, sinusoidal_table

CFG = DecoderConfig(
    vocab_size=96,
    hidden_size=256,
    num_hidden_layers=3,
    num_attention_heads=4,   # dh = 64, MHA
    ffn_dim=512,
    num_codebooks=4,
    max_position_embeddings=256,
    pad_token_id=88,
    bos_token_id=89,
    eos_token_id=88,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def setup():
    model = ParlerForCausalLM(CFG)
    rng = np.random.default_rng(0)
    s_enc, s_cache, prefix_len = 16, 128, 21
    enc = jnp.asarray(rng.normal(size=(1, s_enc, CFG.hidden_size)) * 0.5, jnp.float32)
    enc_mask = np.ones((1, s_enc), np.int32)
    enc_mask[0, 12:] = 0

    ids = rng.integers(0, 88, size=(1, CFG.num_codebooks, prefix_len + 1))

    def init_all(m):
        m.embed_ids(jnp.zeros((1, CFG.num_codebooks, 2), jnp.int32))
        return m(
            jnp.zeros((1, 2, CFG.hidden_size)),
            jnp.zeros((1, 2), jnp.int32),
            self_attn_bias=None,
            encoder_hidden_states=jnp.zeros((1, 4, CFG.hidden_size)),
        )

    params = model.init(jax.random.key(1), method=init_all)["params"]

    variables = {"params": params}
    cross_k, cross_v = model.apply(variables, enc, method="precompute_cross_kv")
    cache = DecoderCache.zeros(CFG, 1, s_cache, s_enc, jnp.float32)
    cache = cache.replace(cross_k=cross_k, cross_v=cross_v)
    kv_valid = jnp.ones((1, s_cache), bool)

    # XLA prefill over the prefix
    embeds = model.apply(variables, jnp.asarray(ids[:, :, :prefix_len]), method="embed_ids")
    table = sinusoidal_table(CFG.max_position_embeddings, CFG.hidden_size)
    pos = jnp.arange(prefix_len)[None]
    bias = causal_self_attention_bias(pos, kv_valid)
    cross_bias = padding_cross_attention_bias(jnp.asarray(enc_mask), prefix_len)
    _, cache = model.apply(
        variables, embeds, pos, self_attn_bias=bias, cross_attn_bias=cross_bias,
        cache=cache,
    )
    return model, params, cache, ids, enc_mask, prefix_len, s_cache, s_enc


def test_fused_step_matches_xla(setup):
    model, params, cache, ids, enc_mask, prefix_len, s_cache, s_enc = setup
    variables = {"params": params}
    d = CFG.hidden_size
    L = CFG.num_hidden_layers
    table = sinusoidal_table(CFG.max_position_embeddings, d)

    # ---- XLA single decode step (the oracle)
    step_ids = jnp.asarray(ids[:, :, prefix_len:prefix_len + 1])
    emb = model.apply(variables, step_ids, method="embed_ids")
    pos = jnp.asarray([[prefix_len]])
    kv_valid = jnp.ones((1, s_cache), bool)
    bias = causal_self_attention_bias(pos, kv_valid)
    cross_bias = padding_cross_attention_bias(jnp.asarray(enc_mask), 1)
    logits_ref, cache_after = model.apply(
        variables, emb, pos, self_attn_bias=bias, cross_attn_bias=cross_bias,
        cache=cache,
    )

    # ---- fused kernel step
    fp = prepare_fused_params(params["decoder"], CFG)
    x_emb = (emb + sinusoidal_embed(table, pos))[0]  # (1, D) positions added
    cache_k2d = cache.self_k[:, 0].reshape(L, s_cache, d)
    cache_v2d = cache.self_v[:, 0].reshape(L, s_cache, d)
    cross_k2d = cache.cross_k[:, 0].reshape(L, s_enc, d)
    cross_v2d = cache.cross_v[:, 0].reshape(L, s_enc, d)
    enc_bias = jnp.where(jnp.asarray(enc_mask, bool), 0.0,
                         jnp.finfo(jnp.float32).min).astype(jnp.float32)

    hidden, new_k, new_v = fused_decode_layers(
        CFG, fp, x_emb, cache_k2d, cache_v2d, cross_k2d, cross_v2d, enc_bias,
        jnp.int32(0), jnp.int32(prefix_len), block_s=64, interpret=True,
    )

    # final LN + heads in XLA
    ln = params["decoder"]["layer_norm"]
    hf = hidden.astype(jnp.float32)
    mu = hf.mean(-1, keepdims=True)
    var = ((hf - mu) ** 2).mean(-1, keepdims=True)
    hf = (hf - mu) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
    logits_fused = jnp.einsum("td,kdv->ktv", hf, params["lm_heads"])[None]

    a = np.asarray(logits_ref[:, :, -1, :])
    b = np.asarray(logits_fused[:, :, 0, :])
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, f"fused logits rel err {rel}"
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree == 1.0, f"top-1 agreement {agree}"

    # new cache rows match what the XLA step wrote (int8 weight tolerance)
    got_k = np.asarray(new_k[:, 0], np.float32)  # (L, D)
    want_k = np.asarray(
        cache_after.self_k[:, 0, prefix_len].reshape(L, d), np.float32
    )
    rel_k = np.abs(got_k - want_k).max() / (np.abs(want_k).max() + 1e-9)
    assert rel_k < 0.05, f"new k rel err {rel_k}"


def test_fused_step_left_padded_start(setup):
    """Nonzero `start` (left-padded prompt) masks the leading cache rows."""
    model, params, cache, ids, enc_mask, prefix_len, s_cache, s_enc = setup
    variables = {"params": params}
    d, L = CFG.hidden_size, CFG.num_hidden_layers
    table = sinusoidal_table(CFG.max_position_embeddings, d)
    start = 3

    step_ids = jnp.asarray(ids[:, :, prefix_len:prefix_len + 1])
    emb = model.apply(variables, step_ids, method="embed_ids")
    pos = jnp.asarray([[prefix_len]])
    kv_valid = jnp.ones((1, s_cache), bool).at[0, :start].set(False)
    bias = causal_self_attention_bias(pos, kv_valid)
    cross_bias = padding_cross_attention_bias(jnp.asarray(enc_mask), 1)
    logits_ref, _ = model.apply(
        variables, emb, pos, self_attn_bias=bias, cross_attn_bias=cross_bias,
        cache=cache,
    )

    fp = prepare_fused_params(params["decoder"], CFG)
    x_emb = (emb + sinusoidal_embed(table, pos))[0]
    enc_bias = jnp.where(jnp.asarray(enc_mask, bool), 0.0,
                         jnp.finfo(jnp.float32).min).astype(jnp.float32)
    hidden, _, _ = fused_decode_layers(
        CFG, fp, x_emb,
        cache.self_k[:, 0].reshape(L, s_cache, d),
        cache.self_v[:, 0].reshape(L, s_cache, d),
        cache.cross_k[:, 0].reshape(L, s_enc, d),
        cache.cross_v[:, 0].reshape(L, s_enc, d),
        enc_bias, jnp.int32(start), jnp.int32(prefix_len),
        block_s=64, interpret=True,
    )
    ln = params["decoder"]["layer_norm"]
    hf = hidden.astype(jnp.float32)
    mu = hf.mean(-1, keepdims=True)
    var = ((hf - mu) ** 2).mean(-1, keepdims=True)
    hf = (hf - mu) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
    logits_fused = jnp.einsum("td,kdv->ktv", hf, params["lm_heads"])[None]

    a = np.asarray(logits_ref[:, :, -1, :])
    b = np.asarray(logits_fused[:, :, 0, :])
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, f"rel err {rel}"

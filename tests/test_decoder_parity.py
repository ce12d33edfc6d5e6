"""Golden parity: our decoder vs the reference torch ParlerTTSForCausalLM."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parler_tts_tpu.config import DecoderConfig
from parler_tts_tpu.models import DecoderCache, ParlerForCausalLM
from parler_tts_tpu.ops import (
    causal_self_attention_bias,
    dense_self_attention_bias,
    padding_cross_attention_bias,
)
from parler_tts_tpu.utils.hf_bridge import convert_decoder_params, torch_state_dict_to_numpy

from reference_oracle import import_reference_parler_tts

ref_pkg = import_reference_parler_tts()


def make_pair(seed=0, **overrides):
    """Build a tiny reference model and a matching jax model + converted params."""
    kw = dict(
        vocab_size=100,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        ffn_dim=128,
        num_codebooks=3,
        max_position_embeddings=128,
        pad_token_id=88,
        bos_token_id=89,
        eos_token_id=88,
        dropout=0.0,
    )
    kw.update(overrides)
    torch.manual_seed(seed)
    ref_cfg = ref_pkg.ParlerTTSDecoderConfig(**kw)
    ref = ref_pkg.ParlerTTSForCausalLM(ref_cfg).eval()

    cfg = DecoderConfig(
        **{k: v for k, v in kw.items()},
    )
    model = ParlerForCausalLM(cfg)
    params = convert_decoder_params(torch_state_dict_to_numpy(ref.state_dict()), cfg)
    return ref, model, params, cfg


def run_ours(model, params, cfg, ids, enc=None, enc_mask=None):
    b, k, t = ids.shape
    variables = {"params": params}
    embeds = model.apply(variables, jnp.asarray(ids), method="embed_ids")
    self_bias = dense_self_attention_bias(jnp.ones((b, t), jnp.int32))
    cross_bias = padding_cross_attention_bias(
        jnp.asarray(enc_mask) if enc_mask is not None else None, t
    )
    logits, _ = model.apply(
        variables,
        embeds,
        jnp.broadcast_to(jnp.arange(t), (b, t)),
        self_attn_bias=self_bias,
        encoder_hidden_states=jnp.asarray(enc) if enc is not None else None,
        cross_attn_bias=cross_bias,
    )
    return np.asarray(logits)


@pytest.mark.parametrize("kv_heads,rope", [(4, False), (2, False), (1, False), (4, True), (2, True)])
def test_forward_parity_no_cross(kv_heads, rope):
    ref, model, params, cfg = make_pair(num_key_value_heads=kv_heads, rope_embeddings=rope)
    rng = np.random.default_rng(0)
    b, k, t = 2, cfg.num_codebooks, 7
    ids = rng.integers(0, 88, size=(b, k, t))
    with torch.no_grad():
        ref_logits = ref(input_ids=torch.tensor(ids.reshape(b * k, t))).logits.numpy()
    ours = run_ours(model, params, cfg, ids).reshape(b * k, t, -1)
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("cross_kv_heads,rope", [(4, False), (2, False), (2, True)])
def test_forward_parity_with_cross_attention(cross_kv_heads, rope):
    ref, model, params, cfg = make_pair(
        num_cross_attention_key_value_heads=cross_kv_heads, rope_embeddings=rope, seed=1
    )
    rng = np.random.default_rng(1)
    b, k, t, s_enc = 2, cfg.num_codebooks, 5, 9
    ids = rng.integers(0, 88, size=(b, k, t))
    enc = rng.normal(size=(b, s_enc, cfg.hidden_size)).astype(np.float32)
    enc_mask = np.ones((b, s_enc), dtype=np.int64)
    enc_mask[1, 6:] = 0

    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.tensor(ids.reshape(b * k, t)),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).logits.numpy()
    ours = run_ours(model, params, cfg, ids, enc, enc_mask).reshape(b * k, t, -1)
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4, rtol=1e-3)


def test_fused_lm_heads_checkpoint_layout():
    """A fused-head checkpoint must load into the same (K, D, V) param."""
    ref, model, params, cfg = make_pair(use_fused_lm_heads=True, seed=2)
    sd = torch_state_dict_to_numpy(ref.state_dict())
    assert "lm_heads.weight" in sd
    params2 = convert_decoder_params(sd, cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 88, size=(1, cfg.num_codebooks, 4))
    with torch.no_grad():
        ref_logits = ref(input_ids=torch.tensor(ids.reshape(cfg.num_codebooks, 4))).logits.numpy()
    ours = run_ours(model, params2, cfg, ids).reshape(cfg.num_codebooks, 4, -1)
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("rope", [False, True])
def test_incremental_decode_matches_full_forward(rope):
    """prefill + per-token steps through the static cache == full dense forward."""
    _, model, params, cfg = make_pair(rope_embeddings=rope, seed=3)
    rng = np.random.default_rng(3)
    b, k, t, s_enc, s_max = 2, cfg.num_codebooks, 9, 6, 16
    prefill_len = 4
    ids = rng.integers(0, 88, size=(b, k, t))
    enc = rng.normal(size=(b, s_enc, cfg.hidden_size)).astype(np.float32)
    enc_mask = np.ones((b, s_enc), dtype=np.int64)
    enc_mask[0, 4:] = 0

    variables = {"params": params}

    # full forward
    full = run_ours(model, params, cfg, ids, enc, enc_mask)  # (B, K, T, V)

    # cached: prefill then single steps
    cross_k, cross_v = model.apply(variables, jnp.asarray(enc), method="precompute_cross_kv")
    cache = DecoderCache.zeros(cfg, b, s_max, s_enc)
    cache = cache.replace(cross_k=cross_k, cross_v=cross_v)
    kv_valid = jnp.ones((b, s_max), dtype=bool)

    def step(cache, ids_chunk, pos0):
        tt = ids_chunk.shape[-1]
        embeds = model.apply(variables, jnp.asarray(ids_chunk), method="embed_ids")
        positions = pos0 + jnp.arange(tt)[None, :] + jnp.zeros((b, 1), jnp.int32)
        bias = causal_self_attention_bias(positions, kv_valid)
        cross_bias = padding_cross_attention_bias(jnp.asarray(enc_mask), tt)
        logits, cache = model.apply(
            variables, embeds, positions,
            self_attn_bias=bias, cross_attn_bias=cross_bias, cache=cache,
        )
        return cache, np.asarray(logits)

    outs = []
    cache, lg = step(cache, ids[:, :, :prefill_len], 0)
    outs.append(lg)
    for i in range(prefill_len, t):
        cache, lg = step(cache, ids[:, :, i : i + 1], i)
        outs.append(lg)
    cached = np.concatenate(outs, axis=2)

    np.testing.assert_allclose(cached, full, atol=3e-4, rtol=1e-3)
    assert int(cache.index) == t

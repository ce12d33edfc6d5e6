"""Config-surface parity: sliding-window attention option and LayerDrop
(reference configuration_parler_tts.py:81,97 + modeling:1587-1589,3269-3270)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.config import DecoderConfig, GenerationConfig
from parler_tts_tpu.models.decoder import ParlerDecoder
from parler_tts_tpu.ops.masks import causal_self_attention_bias

PAD, BOS = 88, 89


def test_sliding_window_bias():
    q_pos = jnp.array([[5]])
    kv_valid = jnp.ones((1, 8), bool)
    full = causal_self_attention_bias(q_pos, kv_valid)
    win = causal_self_attention_bias(q_pos, kv_valid, sliding_window=3)
    # full causal: 0..5 visible
    assert (np.asarray(full[0, 0, 0, :6]) == 0).all()
    assert (np.asarray(full[0, 0, 0, 6:]) < -1e30).all()
    # window 3: only positions 3,4,5 visible
    assert (np.asarray(win[0, 0, 0, 3:6]) == 0).all()
    assert (np.asarray(win[0, 0, 0, :3]) < -1e30).all()
    assert (np.asarray(win[0, 0, 0, 6:]) < -1e30).all()


def test_sliding_window_generation_changes_tokens():
    """With a tiny window the decode attends to less context, so greedy tokens
    diverge from the full-attention run (and the path compiles + runs)."""
    from parler_tts_tpu.runtime.generate import generate_tokens
    from test_training_step import tiny_config

    from parler_tts_tpu.models.parler import ParlerTTS

    cfg = tiny_config()
    gen = GenerationConfig(max_length=24, min_new_tokens=20, do_sample=False,
                           bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD)
    gen_sw = dataclasses.replace(gen, cache_implementation="sliding_window")
    cfg_sw = dataclasses.replace(cfg, decoder=dataclasses.replace(cfg.decoder, sliding_window=4))

    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    desc = jnp.asarray(rng.integers(0, 120, (1, 8)), jnp.int32)
    dm = jnp.ones((1, 8), jnp.int32)
    prompt = jnp.asarray(rng.integers(0, 256, (1, 4)), jnp.int32)
    pm = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), desc, dm, prompt, pm,
                        jnp.zeros((1, 2, 4), jnp.int32))["params"]

    full = generate_tokens(model, gen, params, desc, dm, prompt, pm, jax.random.key(1))
    model_sw = ParlerTTS(cfg_sw)
    sw = generate_tokens(model_sw, gen_sw, params, desc, dm, prompt, pm, jax.random.key(1))
    assert np.isfinite(np.asarray(sw.delayed_ids)).all()
    assert not np.array_equal(np.asarray(full.delayed_ids), np.asarray(sw.delayed_ids))


def test_fused_qkv_serving_parity():
    """ParlerTTS(fused_qkv=True) + fuse_qkv_params must generate EXACTLY the
    same tokens as the separate q/k/v layout (bias-free concat is exact)."""
    import jax.numpy as jnp

    from parler_tts_tpu.models.parler import ParlerTTS, fuse_qkv_params
    from parler_tts_tpu.runtime.generate import generate_tokens
    from test_training_step import tiny_config

    cfg = tiny_config()
    gen = GenerationConfig(max_length=20, min_new_tokens=8, do_sample=False,
                           bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD)
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(2)
    desc = jnp.asarray(rng.integers(0, 120, (2, 7)), jnp.int32)
    dm = jnp.ones((2, 7), jnp.int32)
    prompt = jnp.asarray(rng.integers(0, 256, (2, 5)), jnp.int32)
    pm = jnp.ones((2, 5), jnp.int32)
    labels = jnp.asarray(rng.integers(0, PAD, (2, 6, 4)), jnp.int32)
    params = model.init(jax.random.key(0), desc, dm, prompt, pm, labels)["params"]

    base = generate_tokens(model, gen, params, desc, dm, prompt, pm, jax.random.key(3))
    fused_model = ParlerTTS(cfg, fused_qkv=True)
    fused_params = fuse_qkv_params(params)
    fused = generate_tokens(fused_model, gen, fused_params, desc, dm, prompt, pm,
                            jax.random.key(3))
    np.testing.assert_array_equal(
        np.asarray(base.delayed_ids), np.asarray(fused.delayed_ids)
    )

    # teacher-forced logits parity too (training-style forward)
    l1, _ = model.apply({"params": params}, desc, dm, prompt, pm, labels)
    l2, _ = fused_model.apply({"params": fused_params}, desc, dm, prompt, pm, labels)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_layerdrop_skips_layers():
    """layerdrop=1.0 must make the training forward independent of the layer
    params (every layer skipped); layerdrop=0.0 must not."""
    cfg = DecoderConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        ffn_dim=64, num_codebooks=2, max_position_embeddings=64,
        pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD,
        dropout=0.0, layerdrop=1.0,
    )
    dec = ParlerDecoder(cfg)
    x = jnp.ones((1, 5, 32), jnp.float32)
    pos = jnp.arange(5)[None]
    bias = causal_self_attention_bias(pos, jnp.ones((1, 5), bool))
    params = dec.init(jax.random.key(0), x, pos, self_attn_bias=bias)["params"]

    def run(p, layerdrop, deterministic):
        d = ParlerDecoder(dataclasses.replace(cfg, layerdrop=layerdrop))
        out, _ = d.apply(
            {"params": p}, x, pos, self_attn_bias=bias,
            deterministic=deterministic,
            rngs={} if deterministic else {"dropout": jax.random.key(7)},
        )
        return np.asarray(out)

    scrambled = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 100.0 if "layers_" in "/".join(str(getattr(k, "key", k)) for k in path) else v,
        params,
    )
    # all layers dropped -> layer params are irrelevant
    np.testing.assert_allclose(run(params, 1.0, False), run(scrambled, 1.0, False))
    # no drop -> layer params matter
    assert not np.allclose(run(params, 0.0, True), run(scrambled, 0.0, True))


def test_decoder_only_generate():
    """Decoder-only generation (reference ParlerTTSForCausalLM.generate,
    modeling:2071-2298): no text encoder, optional cross-attention states and
    audio-prompt codes; output shapes/lengths must be sane and the voice
    prompt must be preserved in the undelayed codes."""
    import jax.numpy as jnp

    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.runtime import generate_tokens_decoder_only
    from test_training_step import tiny_config

    cfg = tiny_config()
    k = cfg.decoder.num_codebooks
    gen = GenerationConfig(max_length=20, min_new_tokens=8, do_sample=False,
                           bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD)
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(4)
    desc = jnp.asarray(rng.integers(0, 120, (2, 7)), jnp.int32)
    dm = jnp.ones((2, 7), jnp.int32)
    prompt = jnp.asarray(rng.integers(0, 256, (2, 5)), jnp.int32)
    pm = jnp.ones((2, 5), jnp.int32)
    labels = jnp.asarray(rng.integers(0, PAD, (2, 6, k)), jnp.int32)
    params = model.init(jax.random.key(0), desc, dm, prompt, pm, labels)["params"]

    # unconditional (no encoder states at all)
    out = generate_tokens_decoder_only(model, gen, params, jax.random.key(1),
                                       batch_size=2)
    assert out.codes.shape[:2] == (2, k)
    assert np.asarray(out.lengths).min() >= 0

    # with cross-attention states + an audio prompt: the undelayed codes must
    # START with the prompt codes (continuation semantics, modeling:3136-3194)
    enc = jnp.asarray(rng.normal(size=(2, 3, cfg.decoder.hidden_size)), jnp.float32)
    voice = jnp.asarray(rng.integers(0, PAD, (2, k, 3)), jnp.int32)
    out2 = generate_tokens_decoder_only(
        model, gen, params, jax.random.key(2), batch_size=2,
        encoder_hidden_states=enc, encoder_mask=jnp.ones((2, 3), jnp.int32),
        decoder_prompt_codes=voice,
    )
    np.testing.assert_array_equal(np.asarray(out2.codes)[:, :, :3], np.asarray(voice))

    # position-table guard fires for oversized max_length
    import pytest as _pytest
    bad = GenerationConfig(max_length=4096, do_sample=False, bos_token_id=BOS,
                           pad_token_id=PAD, eos_token_id=PAD)
    with _pytest.raises(ValueError, match="max_position_embeddings"):
        generate_tokens_decoder_only(model, bad, params, jax.random.key(3),
                                     batch_size=1)

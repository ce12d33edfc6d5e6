"""Integrated fused-megakernel generation loop vs the XLA bf16 path.

The per-step kernel parity (logits/new-kv tolerances) is covered in
test_fused_decode_step.py; here the WHOLE generate loop runs with the kernel
as its decode step (interpret mode off-TPU) and must reproduce the bf16
path's greedy tokens — int8 weight rounding almost never flips an argmax,
and on these seeds it doesn't at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
)
from parler_tts_tpu.models.parler import ParlerTTS
from parler_tts_tpu.ops.pallas.fused_decode_step import prepare_fused_params
from parler_tts_tpu.runtime.generate import make_generate, make_generate_fused

PAD, BOS = 88, 89

CFG = ParlerTTSConfig(
    text_encoder=T5Config(
        vocab_size=120, d_model=48, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        dropout_rate=0.0,
    ),
    audio_encoder=DACConfig(num_codebooks=4, codebook_size=PAD),
    decoder=DecoderConfig(
        vocab_size=100, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=512, num_codebooks=4,
        max_position_embeddings=256, pad_token_id=PAD, bos_token_id=BOS,
        eos_token_id=PAD, dropout=0.0,
    ),
    vocab_size=256,
    pad_token_id=PAD,
    decoder_start_token_id=BOS,
)

GEN = GenerationConfig(
    max_length=20, min_new_tokens=6, do_sample=False,
    bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
)


@pytest.fixture(scope="module")
def setup():
    model = ParlerTTS(CFG)
    params = model.init(
        jax.random.key(1),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, 4), jnp.int32),
    )["params"]
    fused = prepare_fused_params(params["decoder"]["decoder"], CFG.decoder)
    return model, params, fused


def _inputs(seed):
    r = np.random.default_rng(seed)
    return (
        jnp.asarray(r.integers(0, 120, size=(1, 9))), jnp.ones((1, 9), jnp.int32),
        jnp.asarray(r.integers(0, 256, size=(1, 5))), jnp.ones((1, 5), jnp.int32),
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_loop_matches_bf16_greedy(setup, seed):
    model, params, fused = setup
    fn = make_generate(model, GEN)
    fn_f = make_generate_fused(model, GEN, block_s=64, interpret=True)
    desc, dm, prompt, pm = _inputs(seed)
    a = fn(params, desc, dm, prompt, pm, jax.random.key(0))
    b = fn_f(params, fused, desc, dm, prompt, pm, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(a.delayed_ids), np.asarray(b.delayed_ids))
    assert int(a.steps) == int(b.steps)
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(b.lengths))


def test_fused_loop_sampling_deterministic(setup):
    model, params, fused = setup
    gen = GenerationConfig(
        max_length=16, min_new_tokens=4, do_sample=True, temperature=0.9,
        top_k=20, bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    fn_f = make_generate_fused(model, gen, block_s=64, interpret=True)
    desc, dm, prompt, pm = _inputs(6)
    o1 = fn_f(params, fused, desc, dm, prompt, pm, jax.random.key(7))
    o2 = fn_f(params, fused, desc, dm, prompt, pm, jax.random.key(7))
    o3 = fn_f(params, fused, desc, dm, prompt, pm, jax.random.key(8))
    np.testing.assert_array_equal(np.asarray(o1.codes), np.asarray(o2.codes))
    assert not np.array_equal(np.asarray(o1.codes), np.asarray(o3.codes))
    delayed = np.asarray(o1.delayed_ids)
    for k in range(4):
        assert np.all(delayed[:, k, : k + 1] == BOS)


def test_fused_loop_voice_steering(setup):
    """Voice-prompt codes flow through the fused path's shared prefill."""
    model, params, fused = setup
    fn_f = make_generate_fused(model, GEN, block_s=64, interpret=True)
    desc, dm, prompt, pm = _inputs(9)
    voice = jnp.asarray(np.random.default_rng(1).integers(0, PAD, size=(1, 4, 3)))
    out = fn_f(params, fused, desc, dm, prompt, pm, jax.random.key(0),
               decoder_prompt_codes=voice)
    codes = np.asarray(out.codes)
    np.testing.assert_array_equal(codes[:, :, :3], np.asarray(voice))
    assert int(out.steps) > 4

"""End-to-end pipeline: ids -> codes -> waveform, and streaming equivalence."""

import numpy as np
import pytest

from parler_tts_tpu.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
)
from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline

PAD, BOS = 88, 89

CFG = ParlerTTSConfig(
    text_encoder=T5Config(
        vocab_size=120, d_model=48, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        dropout_rate=0.0,
    ),
    audio_encoder=DACConfig(
        num_codebooks=4, codebook_size=PAD, codebook_dim=4, latent_dim=64,
        encoder_dim=4, encoder_rates=(2, 4, 4), decoder_dim=96, decoder_rates=(4, 4, 2),
        sampling_rate=16000, frame_rate=500,
    ),
    decoder=DecoderConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        ffn_dim=128, num_codebooks=4, max_position_embeddings=128,
        pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD, dropout=0.0,
    ),
    vocab_size=256,
    pad_token_id=PAD,
    decoder_start_token_id=BOS,
)

GEN = GenerationConfig(
    max_length=24, min_new_tokens=8, do_sample=False,
    bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
)


@pytest.fixture(scope="module")
def pipe():
    return ParlerTTSPipeline.from_random(CFG, seed=0, generation_config=GEN, frame_bucket=8)


def _ids(seed=0, b=2):
    rng = np.random.default_rng(seed)
    desc = rng.integers(0, 120, size=(b, 9)).astype(np.int32)
    desc_mask = np.ones((b, 9), np.int32)
    prompt = rng.integers(0, 256, size=(b, 5)).astype(np.int32)
    prompt_mask = np.ones((b, 5), np.int32)
    return desc, desc_mask, prompt, prompt_mask


def test_generate_waveform(pipe):
    desc, dm, prompt, pm = _ids()
    audio, lengths = pipe.generate(desc, prompt, desc_mask=dm, prompt_mask=pm, seed=0)
    hop = CFG.audio_encoder.hop_length
    assert audio.ndim == 2 and audio.shape[0] == 2
    assert audio.shape[1] % hop == 0
    assert (lengths % hop == 0).all()
    assert (lengths <= audio.shape[1]).all()
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0  # tanh output


def test_stream_tokens_match_offline(pipe):
    """The streaming step path must generate the SAME token sequence as the
    fused while_loop path (greedy => deterministic). Audio equality is
    approximate by design (chunked codec decode, reference streamer.py:53-57),
    so tokens are the invariant."""
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.runtime.generate import make_stream_functions

    desc, dm, prompt, pm = _ids(seed=3, b=1)
    off = pipe.generate_codes(desc, dm, prompt, pm, seed=11)

    prefill_fn, step_fn = make_stream_functions(pipe.model, pipe.generation_config)
    state = prefill_fn(
        pipe.params, jnp.asarray(desc), jnp.asarray(dm),
        jnp.asarray(prompt), jnp.asarray(pm), jax.random.key(11),
    )
    while int(state.t) < GEN.max_length and not bool(jnp.all(state.eos.eos_seen)):
        state = step_fn(pipe.params, state, 6)

    np.testing.assert_array_equal(
        np.asarray(state.out_ids), np.asarray(off.delayed_ids)
    )


def test_stream_voice_steering_matches_offline(pipe):
    """Streaming prefill accepts decoder_prompt_codes (voice steering): tokens
    must match the offline while_loop path given the same audio prompt."""
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.runtime.generate import make_stream_functions

    desc, dm, prompt, pm = _ids(seed=5, b=1)
    rng = np.random.default_rng(9)
    voice = rng.integers(0, PAD, size=(1, 4, 3)).astype(np.int32)

    off = pipe.generate_codes(desc, dm, prompt, pm, seed=13,
                              decoder_prompt_codes=voice)

    prefill_fn, step_fn = make_stream_functions(pipe.model, pipe.generation_config)
    state = prefill_fn(
        pipe.params, jnp.asarray(desc), jnp.asarray(dm),
        jnp.asarray(prompt), jnp.asarray(pm), jax.random.key(13),
        jnp.asarray(voice),
    )
    assert int(state.t) == 1 + voice.shape[-1] + 1  # BOS + prompt cols + 1 sampled
    while int(state.t) < GEN.max_length and not bool(jnp.all(state.eos.eos_seen)):
        state = step_fn(pipe.params, state, 6)

    np.testing.assert_array_equal(
        np.asarray(state.out_ids), np.asarray(off.delayed_ids)
    )


def test_stream_min_new_tokens_voice_steering_adversarial(pipe):
    """Regression: the streaming step must count min_new_tokens from the full
    decoder-prompt column count (s0 = 1 + voice-prompt cols), exactly like the
    offline path (`generate_tokens` passes prompt_cols=s0). Params are doctored
    so greedy ALWAYS favors EOS — final LN scale=0 makes the hidden state a
    constant one-hot, and lm_heads put all mass on EOS — so any
    suppression-window mismatch changes tokens deterministically (no seed
    luck): with the old prompt_cols=1 default, streaming would emit EOS at
    t = min_new_tokens + 1 while offline waits until t = min_new_tokens + s0.
    """
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.runtime.generate import generate_tokens, make_stream_functions

    params = jax.tree.map(np.asarray, jax.device_get(pipe.params))
    dec = params["decoder"]
    ln = dec["decoder"]["layer_norm"]
    d = ln["scale"].shape[0]
    ln["scale"] = np.zeros_like(np.asarray(ln["scale"]))
    bias = np.zeros(d, np.float32)
    bias[0] = 1.0
    ln["bias"] = bias
    lm = np.zeros_like(np.asarray(dec["lm_heads"]))  # (K, D, V)
    lm[:, 0, GEN.eos_token_id] = 5.0
    dec["lm_heads"] = lm

    desc, dm, prompt, pm = _ids(seed=21, b=1)
    rng = np.random.default_rng(22)
    voice = rng.integers(0, PAD, size=(1, 4, 3)).astype(np.int32)  # s0 = 4

    off = generate_tokens(
        pipe.model, GEN, params, jnp.asarray(desc), jnp.asarray(dm),
        jnp.asarray(prompt), jnp.asarray(pm), jax.random.key(23),
        decoder_prompt_codes=jnp.asarray(voice),
    )
    # EOS must be suppressed until t >= min_new_tokens + s0: codebook 0's first
    # EOS lands at exactly that column in the delayed ids.
    s0 = 1 + voice.shape[-1]
    delayed = np.asarray(off.delayed_ids)
    eos_cols = np.nonzero(delayed[0, 0] == GEN.eos_token_id)[0]
    assert eos_cols.size and eos_cols[0] == GEN.min_new_tokens + s0

    prefill_fn, step_fn = make_stream_functions(pipe.model, GEN)
    state = prefill_fn(
        params, jnp.asarray(desc), jnp.asarray(dm),
        jnp.asarray(prompt), jnp.asarray(pm), jax.random.key(23),
        jnp.asarray(voice),
    )
    while int(state.t) < GEN.max_length and not bool(jnp.all(state.eos.eos_seen)):
        state = step_fn(params, state, 3)

    np.testing.assert_array_equal(np.asarray(state.out_ids), delayed)


def test_stream_chunks_smoke(pipe):
    desc, dm, prompt, pm = _ids(seed=3, b=1)
    chunks = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=11))
    assert len(chunks) >= 1
    streamed = np.concatenate(chunks, axis=1)
    assert streamed.shape[0] == 1 and streamed.shape[1] > 0
    assert np.isfinite(streamed).all()
    assert np.abs(streamed).max() <= 1.0


def test_stream_incremental_matches_full_decode(pipe):
    """Incremental (windowed) streaming decode must emit the same samples as
    the full-prefix re-decode once the context window covers the conv stack's
    receptive field — and exactly the same chunk boundaries either way."""
    desc, dm, prompt, pm = _ids(seed=3, b=1)
    full = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=11,
                            incremental=False))
    # context >= utterance: w0 always 0 -> bit-identical
    inc_big = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=11,
                               incremental=True, context_frames=1000))
    assert [c.shape for c in inc_big] == [c.shape for c in full]
    np.testing.assert_array_equal(
        np.concatenate(inc_big, axis=1), np.concatenate(full, axis=1)
    )

    # longer utterance so the window actually slides (w0 > 0): with context
    # covering the decoder's receptive field (~31 frames for this geometry:
    # conv_in +-3 frames, then 6*(1+3+9) dilated-conv samples per stage at
    # 4x/16x/32x upsampling), windowed decode matches full decode
    from parler_tts_tpu.config import GenerationConfig as GC

    gen96 = GC(max_length=96, min_new_tokens=90, do_sample=True, temperature=1.0,
               bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
               codebook_guard=PAD)
    pipe96 = ParlerTTSPipeline(pipe.model, pipe.params, pipe.dac, pipe.dac_params,
                               generation_config=gen96, frame_bucket=8)
    full96 = np.concatenate(
        list(pipe96.stream(desc, dm, prompt, pm, play_steps=12, seed=5,
                           incremental=False)), axis=1)
    inc96 = np.concatenate(
        list(pipe96.stream(desc, dm, prompt, pm, play_steps=12, seed=5,
                           incremental=True, context_frames=40)), axis=1)
    assert inc96.shape == full96.shape and full96.shape[1] >= 80 * CFG.audio_encoder.hop_length
    np.testing.assert_allclose(inc96, full96, atol=1e-4)


def test_stream_batch_matches_single_stream(pipe):
    """Batched streaming (beyond the reference's B=1 streamer): a batch of two
    IDENTICAL rows under greedy decoding must yield chunk-for-chunk exactly
    what the (already-tested) B=1 `stream` path yields, in both rows."""
    desc, dm, prompt, pm = _ids(seed=6, b=1)
    single = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=21))

    d2, m2 = np.tile(desc, (2, 1)), np.tile(dm, (2, 1))
    p2, q2 = np.tile(prompt, (2, 1)), np.tile(pm, (2, 1))
    batched = list(pipe.stream_batch(d2, m2, p2, q2, play_steps=6, seed=21))
    assert len(batched) == len(single)
    for (chunk, valid), ref_chunk in zip(batched, single):
        assert chunk.shape == (2, ref_chunk.shape[1])
        np.testing.assert_array_equal(valid[0], valid[1])
        for i in range(2):
            # B=2 vs B=1 compile to different fusions — tiny fp drift only
            np.testing.assert_allclose(chunk[i], ref_chunk[0], atol=1e-3)


def test_stream_batch_per_stream_accounting(pipe):
    """Heterogeneous batch: per-stream valid sample counts must total exactly
    the offline per-stream audio lengths (streams that finish early go quiet
    while the longest stream keeps flowing)."""
    desc, dm, prompt, pm = _ids(seed=6, b=2)
    _, lengths = pipe.generate(desc, prompt, desc_mask=dm, prompt_mask=pm,
                               seed=21)
    hop = CFG.audio_encoder.hop_length

    got = np.zeros(2, np.int64)
    for chunk, valid in pipe.stream_batch(desc, dm, prompt, pm, play_steps=6,
                                          seed=21):
        assert chunk.shape[0] == 2 and valid.shape == (2,)
        assert (valid >= 0).all() and (valid <= chunk.shape[1]).all()
        got += valid
    np.testing.assert_array_equal(got, np.asarray(lengths, np.int64))  # samples
    assert got.sum() > 0


def test_decode_codes_bucketing(pipe):
    desc, dm, prompt, pm = _ids(seed=4)
    out = pipe.generate_codes(desc, dm, prompt, pm, seed=2)
    audio, lengths = pipe.decode_codes(out.codes, out.lengths)
    # bucket rounds decode length up to frame_bucket frames
    assert audio.shape[1] % (pipe.frame_bucket * CFG.audio_encoder.hop_length) == 0 or \
        audio.shape[1] == out.codes.shape[-1] * CFG.audio_encoder.hop_length


def test_voice_steering_prefix_respected(pipe):
    """Audio-prompt codes become the decoder prompt: the un-delayed output's
    leading frames equal the provided codes, and generation continues past them
    (reference voice-steering path, modeling:3136-3194)."""
    import jax.numpy as jnp

    desc, dm, prompt, pm = _ids(seed=7, b=2)
    rng = np.random.default_rng(8)
    t0 = 4
    voice_codes = rng.integers(0, PAD, size=(2, 4, t0)).astype(np.int32)

    out = pipe.generate_codes(desc, dm, prompt, pm, seed=3,
                              decoder_prompt_codes=voice_codes)
    codes = np.asarray(out.codes)
    np.testing.assert_array_equal(codes[:, :, :t0], voice_codes)
    assert int(out.steps) > t0 + 1
    # encode_voice_prompt produces codes of the right shape from raw audio
    hop = CFG.audio_encoder.hop_length
    audio = rng.normal(size=(2, 6 * hop)).astype(np.float32) * 0.1
    enc = pipe.encode_voice_prompt(audio)
    assert enc.shape == (2, CFG.audio_encoder.num_codebooks, 6)


def test_streamer_pcm_stream(pipe):
    """PCM streaming through the native ring buffer matches stream() audio."""
    from parler_tts_tpu.runtime.streamer import ParlerTTSStreamer

    desc, dm, prompt, pm = _ids(seed=5, b=1)
    chunks = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=7))
    want = np.concatenate(chunks, axis=1)[0]
    want_pcm = (np.clip(want, -1, 1) * 32767.0).astype(np.int16)

    streamer = ParlerTTSStreamer(pipe, play_steps=6)
    got = b"".join(streamer.pcm_stream(desc, dm, prompt, pm, seed=7))
    got_pcm = np.frombuffer(got, dtype=np.int16)
    np.testing.assert_array_equal(got_pcm, want_pcm)


def test_empty_prompt_generation(pipe):
    """Zero-length prompts (unconditional speech) run through the same program."""
    desc, dm, _, _ = _ids(seed=8)
    prompt = np.zeros((2, 0), np.int32)
    pm = np.zeros((2, 0), np.int32)
    out = pipe.generate_codes(desc, dm, prompt, pm, seed=1)
    assert out.codes.shape == (2, 4, GEN.max_length - 4)
    assert int(out.steps) >= 2


def test_encodec_composite_pipeline(tmp_path):
    """Codec registry: a composite with an Encodec audio encoder works through
    the full pipeline — generate, stream, native save/load roundtrip (reference
    supports this pairing via init_dummy_model_with_encodec.py)."""
    from parler_tts_tpu.codec.encodec_model import EncodecCodecConfig

    enc_cfg = EncodecCodecConfig(
        sampling_rate=16000, audio_channels=1, num_filters=8, hidden_size=16,
        num_residual_layers=1, upsampling_ratios=(4, 4), codebook_size=PAD,
        codebook_dim=16, num_codebooks=4, num_lstm_layers=1,
    )
    cfg = CFG.__class__(
        text_encoder=CFG.text_encoder, audio_encoder=enc_cfg, decoder=CFG.decoder,
        vocab_size=CFG.vocab_size, pad_token_id=PAD, decoder_start_token_id=BOS,
    )
    pipe = ParlerTTSPipeline.from_random(cfg, seed=0, generation_config=GEN, frame_bucket=8)
    desc, dm, prompt, pm = _ids(seed=8, b=1)

    audio, lengths = pipe.generate(desc, prompt, desc_mask=dm, prompt_mask=pm, seed=1)
    hop = enc_cfg.hop_length
    assert audio.shape[0] == 1 and audio.shape[1] % hop == 0
    assert np.isfinite(audio).all() and (lengths % hop == 0).all()

    chunks = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=1))
    assert len(chunks) >= 1 and np.isfinite(np.concatenate(chunks, axis=1)).all()

    # voice steering through the Encodec encode path
    codes = pipe.encode_voice_prompt(np.zeros(hop * 3, np.float32))
    assert codes.shape == (1, 4, 3)

    # native checkpoint roundtrip exercises config from_json's codec_type branch
    pipe.save_pretrained(str(tmp_path))
    pipe2 = ParlerTTSPipeline.from_pretrained(str(tmp_path), generation_config=GEN,
                                              frame_bucket=8)
    assert type(pipe2.config.audio_encoder).__name__ == "EncodecCodecConfig"
    audio2, _ = pipe2.generate(desc, prompt, desc_mask=dm, prompt_mask=pm, seed=1)
    np.testing.assert_allclose(audio2, audio, atol=1e-5)


def test_load_hf_config_encodec_branch(tmp_path):
    """HF config.json with audio_encoder.model_type == 'encodec' parses into an
    EncodecCodecConfig, deriving the quantizer count from target_bandwidths
    like transformers EncodecConfig.num_quantizers."""
    import json

    from parler_tts_tpu.runtime.pipeline import load_hf_config

    raw = {
        "text_encoder": {"vocab_size": 120, "d_model": 48, "d_kv": 12, "d_ff": 96,
                         "num_layers": 2, "num_heads": 4},
        "audio_encoder": {"model_type": "encodec", "sampling_rate": 32000,
                          "upsampling_ratios": [8, 5, 4, 4],
                          "target_bandwidths": [2.2], "codebook_size": 1024},
        "decoder": {"vocab_size": 1088, "hidden_size": 64, "num_hidden_layers": 2,
                    "num_attention_heads": 4, "ffn_dim": 128, "num_codebooks": 9},
        "vocab_size": 120,
    }
    (tmp_path / "config.json").write_text(json.dumps(raw))
    cfg = load_hf_config(str(tmp_path))
    ae = cfg.audio_encoder
    assert type(ae).__name__ == "EncodecCodecConfig"
    assert ae.hop_length == 8 * 5 * 4 * 4
    assert ae.frame_rate == 50  # ceil(32000/640)
    assert ae.num_codebooks == 4  # 1000*2.2 // (50*10)
    assert ae.codebook_size == 1024


def test_num_return_sequences(pipe):
    """num_return_sequences expands rows at the pipeline boundary; sampled
    sequences per input differ; greedy raises (reference/HF semantics)."""
    from parler_tts_tpu.config import GenerationConfig

    desc, dm, prompt, pm = _ids(seed=10, b=2)
    gen = GenerationConfig(
        max_length=16, min_new_tokens=4, do_sample=True, temperature=1.0,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
        num_return_sequences=2,
    )
    pipe_n = ParlerTTSPipeline(pipe.model, pipe.params, pipe.dac, pipe.dac_params,
                               generation_config=gen, frame_bucket=8)
    out = pipe_n.generate_codes(desc, dm, prompt, pm, seed=4)
    codes = np.asarray(out.codes)
    assert codes.shape[0] == 4  # 2 inputs x 2 return sequences
    # the two samples of the same input row must differ
    assert not np.array_equal(codes[0], codes[1])
    assert not np.array_equal(codes[2], codes[3])

    greedy = GenerationConfig(
        max_length=16, do_sample=False, bos_token_id=BOS, pad_token_id=PAD,
        eos_token_id=PAD, num_return_sequences=2,
    )
    pipe_g = ParlerTTSPipeline(pipe.model, pipe.params, pipe.dac, pipe.dac_params,
                               generation_config=greedy, frame_bucket=8)
    with pytest.raises(ValueError, match="num_return_sequences"):
        pipe_g.generate_codes(desc, dm, prompt, pm, seed=4)


def test_stream_batch_voice_steering_matches_single_stream(pipe):
    """Voice steering in BATCHED streaming (round-3 gap close): per-stream
    decoder_prompt_codes must produce chunk-for-chunk the same audio as the
    steered B=1 `stream` path."""
    desc, dm, prompt, pm = _ids(seed=8, b=1)
    rng = np.random.default_rng(17)
    voice = rng.integers(0, PAD, size=(1, 4, 3)).astype(np.int32)

    single = list(pipe.stream(desc, dm, prompt, pm, play_steps=6, seed=31,
                              decoder_prompt_codes=voice))

    d2, m2 = np.tile(desc, (2, 1)), np.tile(dm, (2, 1))
    p2, q2 = np.tile(prompt, (2, 1)), np.tile(pm, (2, 1))
    v2 = np.tile(voice, (2, 1, 1))
    batched = list(pipe.stream_batch(d2, m2, p2, q2, play_steps=6, seed=31,
                                     decoder_prompt_codes=v2))
    assert len(batched) == len(single) and len(batched) > 0
    for (chunk, valid), ref_chunk in zip(batched, single):
        assert chunk.shape == (2, ref_chunk.shape[1])
        for i in range(2):
            np.testing.assert_allclose(chunk[i], ref_chunk[0], atol=1e-3)


def test_stream_batch_per_row_speculative(pipe):
    """Per-row speculative batched streaming: flushes gate on the slowest
    active stream, faster rows buffer finalized columns, unverified candidate
    tails are masked before un-delaying. Tokens are the streaming invariant
    (waveform values near moving decode-window edges are approximate by
    design): per-row total valid samples must equal the offline lengths
    exactly, and a single-flush run must match plain batched streaming
    bit-for-bit (identical decode windows)."""
    desc, dm, prompt, pm = _ids(seed=6, b=2)
    _, lengths = pipe.generate(desc, prompt, desc_mask=dm, prompt_mask=pm,
                               seed=21)
    spec = ParlerTTSPipeline(
        pipe.model, pipe.params, pipe.dac, pipe.dac_params, GEN,
        frame_bucket=8, speculative_window=3, speculative_per_row=True,
    )

    # chunked: exact per-row sample accounting against the offline lengths
    got = np.zeros(2, np.int64)
    for chunk, valid in spec.stream_batch(desc, dm, prompt, pm, play_steps=6,
                                          seed=21):
        assert chunk.shape[0] == 2 and valid.shape == (2,)
        assert (valid >= 0).all() and (valid <= chunk.shape[1]).all()
        got += valid
    np.testing.assert_array_equal(got, np.asarray(lengths, np.int64))
    assert got.sum() > 0

    # single flush (play_steps >= max_length): the one decode window is
    # identical to plain batched streaming, so audio must match exactly
    ref = list(pipe.stream_batch(desc, dm, prompt, pm, play_steps=32, seed=21))
    pr = list(spec.stream_batch(desc, dm, prompt, pm, play_steps=32, seed=21))
    assert len(ref) == len(pr) == 1
    np.testing.assert_array_equal(ref[0][1], pr[0][1])
    np.testing.assert_array_equal(ref[0][0], pr[0][0])

    # voice steering threads through per-row speculative streaming: exact
    # per-row sample accounting vs the steered offline lengths
    rng = np.random.default_rng(23)
    voice = rng.integers(0, PAD, size=(2, 4, 3)).astype(np.int32)
    _, vlen = pipe.generate(desc, prompt, desc_mask=dm, prompt_mask=pm,
                            seed=21, decoder_prompt_codes=voice)
    got_v = np.zeros(2, np.int64)
    for chunk, valid in spec.stream_batch(desc, dm, prompt, pm, play_steps=6,
                                          seed=21, decoder_prompt_codes=voice):
        got_v += valid
    np.testing.assert_array_equal(got_v, np.asarray(vlen, np.int64))


def test_per_row_config_guards(pipe):
    """speculative_per_row without a window and stream() at B>1 with a
    per-row pipeline both fail loudly (the latter would otherwise emit a
    lagging row's unverified window candidates as audio)."""
    with pytest.raises(ValueError, match="requires speculative_window"):
        ParlerTTSPipeline(
            pipe.model, pipe.params, pipe.dac, pipe.dac_params, GEN,
            speculative_per_row=True,
        )
    spec = ParlerTTSPipeline(
        pipe.model, pipe.params, pipe.dac, pipe.dac_params, GEN,
        frame_bucket=8, speculative_window=3, speculative_per_row=True,
    )
    desc, dm, prompt, pm = _ids(seed=3, b=2)
    with pytest.raises(ValueError, match="stream_batch"):
        next(spec.stream(desc, dm, prompt, pm, play_steps=6))


def test_codec_dtype_bf16_pipeline(pipe):
    """`codec_dtype=bf16` serving mode: same wiring, audio close to the fp32
    pipeline's output (greedy: identical codes, only the codec decode dtype
    differs)."""
    import jax.numpy as jnp

    desc, dm, prompt, pm = _ids(seed=7)
    pipe16 = ParlerTTSPipeline(
        pipe.model, pipe.params, pipe.dac, pipe.dac_params,
        GEN, frame_bucket=8, codec_dtype=jnp.bfloat16,
    )
    a32, l32 = pipe.generate(desc, prompt, desc_mask=dm, prompt_mask=pm, seed=0)
    a16, l16 = pipe16.generate(desc, prompt, desc_mask=dm, prompt_mask=pm, seed=0)
    np.testing.assert_array_equal(l32, l16)
    assert a16.dtype == np.float32
    scale = np.sqrt(np.mean(a32**2)) + 1e-9
    # random-weight decoders are a worst case for reduced precision (chaotic
    # unnormalized filters, near-saturated output); trained DAC weights are
    # weight-normed and far better conditioned. Bound the worst case.
    assert np.sqrt(np.mean((a16 - a32) ** 2)) / scale < 0.12


def test_warmup_stream_async_success_and_failure(pipe, monkeypatch):
    """warmup_stream_async compiles the stream programs on a thread; join()
    must re-raise a warmup failure instead of returning normally (a server
    would otherwise serve believing the programs are warm)."""
    desc, desc_mask, prompt, prompt_mask = _ids(seed=3, b=1)
    t = pipe.warmup_stream_async(desc, desc_mask, prompt, prompt_mask,
                                 play_steps=16)
    t.join()  # success path: returns, nothing raised

    def boom(*a, **kw):
        raise RuntimeError("compile exploded")
        yield  # pragma: no cover — keep it a generator like stream()

    monkeypatch.setattr(pipe, "stream", boom)
    t = pipe.warmup_stream_async(desc, desc_mask, prompt, prompt_mask,
                                 play_steps=16)
    with pytest.raises(RuntimeError, match="stream warmup failed"):
        t.join()

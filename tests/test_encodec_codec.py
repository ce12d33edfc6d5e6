"""Encodec codec parity vs HF transformers EncodecModel (torch oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import EncodecConfig as HFEncodecConfig
from transformers import EncodecModel as HFEncodecModel

from parler_tts_tpu.codec.encodec_model import (
    EncodecCodec,
    EncodecCodecConfig,
    convert_encodec_params,
)
from parler_tts_tpu.utils.hf_bridge import torch_state_dict_to_numpy


def build_pair(seed=0, causal=True, num_lstm=2, n_res=1):
    torch.manual_seed(seed)
    hf = HFEncodecModel(
        HFEncodecConfig(
            target_bandwidths=[24.0],
            sampling_rate=16000,
            audio_channels=1,
            num_filters=8,
            hidden_size=16,
            num_residual_layers=n_res,
            upsampling_ratios=[4, 4],
            codebook_size=64,
            codebook_dim=16,
            num_lstm_layers=num_lstm,
            norm_type="weight_norm",
            use_causal_conv=causal,
        )
    ).eval()
    cfg = EncodecCodecConfig(
        sampling_rate=16000,
        audio_channels=1,
        num_filters=8,
        hidden_size=16,
        num_residual_layers=n_res,
        upsampling_ratios=(4, 4),
        codebook_size=64,
        codebook_dim=16,
        num_codebooks=4,
        num_lstm_layers=num_lstm,
        use_causal_conv=causal,
    )
    params = convert_encodec_params(torch_state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, EncodecCodec(cfg), params, cfg


@pytest.mark.parametrize("causal", [True, False])
def test_encoder_latents_parity(causal):
    hf, model, params, cfg = build_pair(causal=causal)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, 1, 16 * 37)) * 0.2).astype(np.float32)  # odd length
    with torch.no_grad():
        want = hf.encoder(torch.tensor(audio)).numpy()  # (B, hidden, T')
    got = model.apply(
        {"params": params}, jnp.asarray(audio.transpose(0, 2, 1)),
        method=lambda m, x: m.encoder(x),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=1e-4, rtol=1e-3
    )


def test_encode_codes_parity():
    hf, model, params, cfg = build_pair(seed=1)
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=(1, 1, 16 * 32)) * 0.2).astype(np.float32)
    with torch.no_grad():
        latents = hf.encoder(torch.tensor(audio))
        want = hf.quantizer.encode(latents, bandwidth=24.0).numpy()  # (K, B, T')
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(audio.transpose(0, 2, 1)), method="encode")
    )
    np.testing.assert_array_equal(got, want.transpose(1, 0, 2))


def test_decode_parity():
    hf, model, params, cfg = build_pair(seed=2)
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 64, size=(1, 4, 13))
    with torch.no_grad():
        emb = hf.quantizer.decode(torch.tensor(codes.transpose(1, 0, 2)))
        want = hf.decoder(emb).numpy()  # (B, 1, T)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(codes), method="decode")
    )
    np.testing.assert_allclose(got[:, :, 0], want[:, 0, :], atol=1e-4, rtol=1e-3)


def test_hf_end_to_end_decode_equivalence():
    """Full HF decode() call == our decode on the same codes."""
    hf, model, params, cfg = build_pair(seed=3)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 64, size=(1, 4, 9))
    with torch.no_grad():
        # HF decode takes (frames=1, B, K, T) audio codes
        want = hf.decode(
            torch.tensor(codes)[None], audio_scales=[None]
        ).audio_values.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(codes), method="decode"))
    n = min(got.shape[1], want.shape[-1])
    np.testing.assert_allclose(got[:, :n, 0], want[:, 0, :n], atol=1e-4, rtol=1e-3)


def build_pair_normalized(seed=7):
    """normalize=True pair (scale-normalized Encodec checkpoints)."""
    torch.manual_seed(seed)
    hf = HFEncodecModel(
        HFEncodecConfig(
            target_bandwidths=[24.0], sampling_rate=16000, audio_channels=1,
            num_filters=8, hidden_size=16, num_residual_layers=1,
            upsampling_ratios=[4, 4], codebook_size=64, codebook_dim=16,
            num_lstm_layers=2, norm_type="weight_norm", use_causal_conv=True,
            normalize=True, chunk_length_s=None,
        )
    ).eval()
    cfg = EncodecCodecConfig(
        sampling_rate=16000, audio_channels=1, num_filters=8, hidden_size=16,
        num_residual_layers=1, upsampling_ratios=(4, 4), codebook_size=64,
        codebook_dim=16, num_codebooks=4, num_lstm_layers=2,
        use_causal_conv=True, normalize=True,
    )
    params = convert_encodec_params(torch_state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, EncodecCodec(cfg), params, cfg


def test_normalize_encode_scale_and_codes_parity():
    """normalize=True: codes computed on the RMS-normalized clip and the
    returned audio_scales match HF EncodecModel.encode
    (reference threads these scales, modeling_parler_tts.py:3174-3192)."""
    hf, model, params, cfg = build_pair_normalized()
    rng = np.random.default_rng(5)
    audio = (rng.normal(size=(2, 1, 16 * 24)) * 0.37).astype(np.float32)
    with torch.no_grad():
        enc = hf.encode(torch.tensor(audio), bandwidth=24.0)
    want_codes = enc.audio_codes[0].numpy()          # (B, K, T')
    want_scales = enc.audio_scales[0].numpy().reshape(-1)  # (B,)
    got_codes, got_scales = model.apply(
        {"params": params}, jnp.asarray(audio.transpose(0, 2, 1)),
        method="encode_with_scale",
    )
    np.testing.assert_allclose(np.asarray(got_scales), want_scales, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_codes), want_codes)


def test_normalize_decode_applies_scales_parity():
    hf, model, params, cfg = build_pair_normalized(seed=8)
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 64, size=(2, 4, 9))
    scales = np.asarray([0.31, 2.7], np.float32)
    with torch.no_grad():
        want = hf.decode(
            torch.tensor(codes)[None],
            audio_scales=[torch.tensor(scales).reshape(2, 1)],
        ).audio_values.numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(codes), jnp.asarray(scales),
        method="decode",
    ))
    n = min(got.shape[1], want.shape[-1])
    np.testing.assert_allclose(got[:, :n, 0], want[:, 0, :n], atol=1e-4, rtol=1e-3)


def test_normalize_pipeline_surfaces():
    """Pipeline threading: encode_voice_prompt demands return_scales for
    normalize checkpoints (loud failure instead of silently wrong amplitude)
    and decode_codes(audio_scales=...) rescales the waveform."""
    from parler_tts_tpu.config import (
        DecoderConfig, GenerationConfig, ParlerTTSConfig, T5Config)
    from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline

    cfg = ParlerTTSConfig(
        text_encoder=T5Config(
            vocab_size=60, d_model=32, d_kv=8, d_ff=64, num_layers=1,
            num_heads=4, dropout_rate=0.0),
        audio_encoder=EncodecCodecConfig(
            sampling_rate=16000, audio_channels=1, num_filters=8,
            hidden_size=16, num_residual_layers=1, upsampling_ratios=(4, 4),
            codebook_size=64, codebook_dim=16, num_codebooks=3,
            num_lstm_layers=1, normalize=True),
        decoder=DecoderConfig(
            vocab_size=66, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, ffn_dim=64, num_codebooks=3,
            max_position_embeddings=96, pad_token_id=64, bos_token_id=65,
            eos_token_id=64, dropout=0.0),
        vocab_size=96, pad_token_id=64, decoder_start_token_id=65,
    )
    gen = GenerationConfig(
        max_length=12, do_sample=False, bos_token_id=65, pad_token_id=64,
        eos_token_id=64,
    )
    pipe = ParlerTTSPipeline.from_random(cfg, generation_config=gen)
    clip = np.random.default_rng(0).normal(size=(2, 64)).astype(np.float32) * 0.4

    with pytest.raises(ValueError, match="scale-normalized"):
        pipe.encode_voice_prompt(clip)
    codes, scales = pipe.encode_voice_prompt(clip, return_scales=True)
    assert codes.shape[0] == 2 and scales.shape == (2,)
    # the per-clip scale is the RMS of the clip (mono), + 1e-8
    np.testing.assert_allclose(
        scales,
        np.sqrt((np.pad(clip, ((0, 0), (0, 0)))**2).mean(axis=1)) + 1e-8,
        rtol=1e-5,
    )

    lengths = jnp.asarray([4, 4])
    a1, n1 = pipe.decode_codes(jnp.asarray(codes)[:, :, :4], lengths)
    a2, n2 = pipe.decode_codes(
        jnp.asarray(codes)[:, :, :4], lengths, audio_scales=scales)
    np.testing.assert_allclose(
        a2, a1 * scales[:, None], rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(n1, n2)


def test_load_hf_config_reads_normalize(tmp_path):
    import json as _json

    from parler_tts_tpu.runtime.pipeline import load_hf_config

    raw = {
        "text_encoder": {"vocab_size": 60, "d_model": 32, "d_kv": 8,
                         "d_ff": 64, "num_layers": 1, "num_heads": 4},
        "audio_encoder": {"model_type": "encodec", "sampling_rate": 16000,
                          "upsampling_ratios": [4, 4], "codebook_size": 64,
                          "num_codebooks": 3, "normalize": True},
        "decoder": {"vocab_size": 66, "hidden_size": 32,
                    "num_hidden_layers": 1, "num_attention_heads": 2,
                    "ffn_dim": 64, "num_codebooks": 3},
    }
    (tmp_path / "config.json").write_text(_json.dumps(raw))
    cfg = load_hf_config(str(tmp_path))
    assert cfg.audio_encoder.normalize is True

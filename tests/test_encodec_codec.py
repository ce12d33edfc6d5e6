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

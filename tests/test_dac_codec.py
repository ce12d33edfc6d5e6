"""DAC codec: parity vs a torch oracle of the published descript architecture.

The external `dac` package is not installed here, so the oracle below rebuilds
the 44.1 kHz DAC module tree in torch with the *same state-dict key structure*
(encoder.block.N / decoder.model.N / quantizer.quantizers.K, weight-normed
convs). This validates, end to end: conv/transposed-conv semantics, Snake,
residual wiring, RVQ decode/encode, weight-norm folding, and the name mapping
used for real checkpoints.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from parler_tts_tpu.codec.convert import convert_dac_params
from parler_tts_tpu.codec.dac_model import DACModel
from parler_tts_tpu.config import DACConfig
from parler_tts_tpu.utils.hf_bridge import torch_state_dict_to_numpy


# ---------------------------------------------------------------- torch oracle
def WNConv1d(*a, **k):
    return tnn.utils.parametrizations.weight_norm(tnn.Conv1d(*a, **k))


def WNConvTranspose1d(*a, **k):
    return tnn.utils.parametrizations.weight_norm(tnn.ConvTranspose1d(*a, **k))


class TSnake1d(tnn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = tnn.Parameter(torch.rand(1, channels, 1) + 0.5)

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class TResidualUnit(tnn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = tnn.Sequential(
            TSnake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=pad),
            TSnake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        return x + self.block(x)


class TEncoderBlock(tnn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            TResidualUnit(dim // 2, 1),
            TResidualUnit(dim // 2, 3),
            TResidualUnit(dim // 2, 9),
            TSnake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class TDecoderBlock(tnn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            TSnake1d(in_dim),
            WNConvTranspose1d(in_dim, out_dim, kernel_size=2 * stride, stride=stride,
                              padding=math.ceil(stride / 2)),
            TResidualUnit(out_dim, 1),
            TResidualUnit(out_dim, 3),
            TResidualUnit(out_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


class TVectorQuantize(tnn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim):
        super().__init__()
        self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
        self.codebook = tnn.Embedding(codebook_size, codebook_dim)

    def decode_code(self, ids):
        return self.codebook(ids).transpose(1, 2)

    def quantize_residual(self, residual):
        import torch.nn.functional as F

        z_e = self.in_proj(residual)  # (B, d_cb, T)
        enc = z_e.permute(0, 2, 1).reshape(-1, z_e.shape[1])
        enc = F.normalize(enc)
        cb = F.normalize(self.codebook.weight)
        dist = (
            enc.pow(2).sum(1, keepdim=True)
            - 2 * enc @ cb.t()
            + cb.pow(2).sum(1, keepdim=True).t()
        )
        idx = (-dist).max(1)[1].reshape(z_e.shape[0], z_e.shape[2])
        z_q = self.out_proj(self.decode_code(idx))
        return idx, z_q


class TDAC(tnn.Module):
    """Oracle mirror of descript's DAC with identical state-dict keys."""

    def __init__(self, cfg: DACConfig):
        super().__init__()
        d = cfg.encoder_dim
        enc = [WNConv1d(1, d, kernel_size=7, padding=3)]
        for s in cfg.encoder_rates:
            d *= 2
            enc.append(TEncoderBlock(d, s))
        enc += [TSnake1d(d), WNConv1d(d, cfg.latent_dim, kernel_size=3, padding=1)]
        self.encoder = tnn.Module()
        self.encoder.block = tnn.Sequential(*enc)

        dec = [WNConv1d(cfg.latent_dim, cfg.decoder_dim, kernel_size=7, padding=3)]
        ch = cfg.decoder_dim
        for i, s in enumerate(cfg.decoder_rates):
            dec.append(TDecoderBlock(ch // (2**i), ch // (2 ** (i + 1)), s))
        last = ch // (2 ** len(cfg.decoder_rates))
        dec += [TSnake1d(last), WNConv1d(last, 1, kernel_size=7, padding=3), tnn.Tanh()]
        self.decoder = tnn.Module()
        self.decoder.model = tnn.Sequential(*dec)

        self.quantizer = tnn.Module()
        self.quantizer.quantizers = tnn.ModuleList(
            [
                TVectorQuantize(cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim)
                for _ in range(cfg.num_codebooks)
            ]
        )

    def encode(self, audio):  # (B, 1, T)
        z = self.encoder.block(audio)
        residual = z
        codes = []
        for q in self.quantizer.quantizers:
            idx, z_q = q.quantize_residual(residual)
            residual = residual - z_q
            codes.append(idx)
        return torch.stack(codes, dim=1)

    def from_codes(self, codes):  # (B, K, T')
        z_q = 0
        for k, q in enumerate(self.quantizer.quantizers):
            z_q = z_q + q.out_proj(q.decode_code(codes[:, k]))
        return z_q

    def decode(self, codes):
        return self.decoder.model(self.from_codes(codes))


# ------------------------------------------------------------------- fixtures
TINY = DACConfig(
    num_codebooks=4,
    codebook_size=32,
    codebook_dim=4,
    latent_dim=64,
    encoder_dim=4,
    encoder_rates=(2, 4, 4),
    decoder_dim=96,
    decoder_rates=(4, 4, 2),
    sampling_rate=16000,
    frame_rate=500,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = TDAC(TINY).eval()
    params = convert_dac_params(torch_state_dict_to_numpy(oracle.state_dict()), TINY, prefix="")
    return oracle, DACModel(TINY), params


def test_hop_length():
    assert TINY.hop_length == 32
    assert DACConfig().hop_length == 512


def test_decode_parity(pair):
    oracle, model, params = pair
    rng = np.random.default_rng(0)
    codes = rng.integers(0, TINY.codebook_size, size=(2, TINY.num_codebooks, 12))
    with torch.no_grad():
        ref = oracle.decode(torch.tensor(codes)).numpy()  # (B, 1, T)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(codes), method="decode"))
    assert ours.shape == (2, 12 * TINY.hop_length, 1)
    np.testing.assert_allclose(ours[:, :, 0], ref[:, 0, :], atol=1e-5, rtol=1e-4)


def test_encode_parity(pair):
    oracle, model, params = pair
    rng = np.random.default_rng(1)
    t = 8 * TINY.hop_length
    audio = (rng.normal(size=(2, 1, t)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_codes = oracle.encode(torch.tensor(audio)).numpy()
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(audio.transpose(0, 2, 1)), method="encode")
    )
    assert ours.shape == ref_codes.shape == (2, TINY.num_codebooks, 8)
    np.testing.assert_array_equal(ours, ref_codes)


def test_roundtrip_reconstruction_consistency(pair):
    """encode -> decode through both stacks gives the same waveform."""
    oracle, model, params = pair
    rng = np.random.default_rng(2)
    t = 4 * TINY.hop_length
    audio = (rng.normal(size=(1, 1, t)) * 0.05).astype(np.float32)
    with torch.no_grad():
        ref = oracle.decode(oracle.encode(torch.tensor(audio))).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(audio.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours[:, :, 0], ref[:, 0, :], atol=1e-5, rtol=1e-4)


def test_decode_bf16_close_to_fp32(pair):
    """The bf16 codec-decode serving mode (pipeline `codec_dtype`): waveform
    within bf16 tolerance of the fp32 decode, relative to the signal scale
    (common reference serving runs DAC in the model dtype the same way —
    `from_pretrained(torch_dtype=bfloat16)`)."""
    from parler_tts_tpu.utils.dtypes import cast_floating

    _, model, params = pair
    rng = np.random.default_rng(3)
    codes = rng.integers(0, TINY.codebook_size, size=(2, TINY.num_codebooks, 24))
    f32 = np.asarray(
        model.apply({"params": params}, jnp.asarray(codes), method="decode")
    )
    p16 = cast_floating(params, jnp.bfloat16)
    b16 = np.asarray(
        model.apply({"params": p16}, jnp.asarray(codes), method="decode")
    ).astype(np.float32)
    assert b16.shape == f32.shape
    scale = np.sqrt(np.mean(f32**2)) + 1e-9
    rel_rms = np.sqrt(np.mean((b16 - f32) ** 2)) / scale
    assert rel_rms < 3e-2, rel_rms

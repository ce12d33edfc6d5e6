"""Encodec neural codec natively in JAX — the second codec family the reference
supports (`helpers/model_init_scripts/init_dummy_model_with_encodec.py`,
stereo handling at `modeling_parler_tts.py:2839-2842`).

Re-implements the SEANet encoder/decoder with ELU activations, residual
blocks + shortcut convs, 2-layer residual LSTM, and the residual vector
quantizer, matching HF `transformers.EncodecModel` semantics:

  - causal conv padding: `padding_total = (k-1)*dilation + 1 - stride` all on
    the left, plus right `extra_padding` for frame alignment;
  - non-causal: asymmetric half/half split;
  - transposed conv trims `padding_total` from the ends, `trim_right_ratio`
    from the right in causal mode;
  - quantizer: plain L2 argmin against EMA codebooks (`embed`), decode is a
    stacked gather + sum.

Weight-norm parametrizations are folded at conversion (codec/convert.py logic).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncodecCodecConfig:
    """Mirrors the HF EncodecConfig fields that shape the network."""

    sampling_rate: int = 32000
    audio_channels: int = 1
    num_filters: int = 64
    hidden_size: int = 128
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 5, 4, 4)
    codebook_size: int = 2048
    codebook_dim: int = 128
    num_codebooks: int = 4          # derived from bandwidth in HF; explicit here
    num_lstm_layers: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    use_causal_conv: bool = True
    trim_right_ratio: float = 1.0
    pad_mode: str = "reflect"
    compress: int = 2
    # scale-normalized checkpoints (HF EncodecConfig.normalize): encode
    # divides each clip by its RMS and returns the scale; decode multiplies
    # it back (reference threads these as `audio_scales`,
    # modeling_parler_tts.py:3174-3192,3603-3607)
    normalize: bool = False
    codec_type: str = "encodec"  # registry discriminator (codec/registry.py)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sampling_rate / self.hop_length)


def _extra_padding(length: int, k_eff: int, stride: int, padding_total: int) -> int:
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    return max(ideal - length, 0)


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad (B, T, C) on the time axis; reflect falls back to replicate-safe
    behavior for tiny inputs like the HF implementation."""
    if mode == "reflect":
        max_pad = max(left, right)
        if x.shape[1] <= max_pad:
            extra = max_pad - x.shape[1] + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
            out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
            end = out.shape[1] - extra
            return out[:, :end]
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)))


class EncodecConv1d(nn.Module):
    """HF `EncodecConv1d`: conv with causal/asymmetric auto-padding."""

    config: EncodecCodecConfig
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        cfg = self.config
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        extra = _extra_padding(x.shape[1], k_eff, self.stride, padding_total)
        if cfg.use_causal_conv:
            x = _pad1d(x, padding_total, extra, cfg.pad_mode)
        else:
            half = padding_total // 2
            x = _pad1d(x, half, padding_total - half + extra, cfg.pad_mode)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride,), ((0, 0),),
            rhs_dilation=(self.dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(x.dtype)


class EncodecConvTranspose1d(nn.Module):
    """HF `EncodecConvTranspose1d`: transposed conv with end trimming."""

    config: EncodecCodecConfig
    features: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = self.kernel_size - 1
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel.astype(x.dtype), axis=0), (1,), ((pad, pad),),
            lhs_dilation=(self.stride,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y + bias.astype(x.dtype)
        padding_total = self.kernel_size - self.stride
        if cfg.use_causal_conv:
            trim_right = math.ceil(padding_total * cfg.trim_right_ratio)
            trim_left = padding_total - trim_right
        else:
            trim_right = padding_total // 2
            trim_left = padding_total - trim_right
        end = y.shape[1] - trim_right
        return y[:, trim_left:end]


class EncodecResnetBlock(nn.Module):
    config: EncodecCodecConfig
    dim: int
    dilations: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = x
        hidden = self.dim // cfg.compress
        kernel_sizes = (cfg.residual_kernel_size, 1)
        dims = (hidden, self.dim)
        for i, (k, d, feats) in enumerate(zip(kernel_sizes, self.dilations, dims)):
            h = jax.nn.elu(h)
            h = EncodecConv1d(cfg, feats, k, dilation=d, name=f"block_{i}")(h)
        shortcut = EncodecConv1d(cfg, self.dim, 1, name="shortcut")(x)
        return shortcut + h


class EncodecLSTM(nn.Module):
    """2-layer residual LSTM (HF `EncodecLSTM`), manual scan matching torch."""

    config: EncodecCodecConfig
    dim: int

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        cfg = self.config
        h = x
        for layer in range(cfg.num_lstm_layers):
            w_ih = self.param(f"w_ih_l{layer}", nn.initializers.lecun_normal(),
                              (4 * self.dim, self.dim), jnp.float32)
            w_hh = self.param(f"w_hh_l{layer}", nn.initializers.lecun_normal(),
                              (4 * self.dim, self.dim), jnp.float32)
            b_ih = self.param(f"b_ih_l{layer}", nn.initializers.zeros,
                              (4 * self.dim,), jnp.float32)
            b_hh = self.param(f"b_hh_l{layer}", nn.initializers.zeros,
                              (4 * self.dim,), jnp.float32)

            def step(carry, x_t, w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh):
                h_t, c_t = carry
                gates = (
                    x_t @ w_ih.T.astype(x_t.dtype)
                    + h_t @ w_hh.T.astype(x_t.dtype)
                    + (b_ih + b_hh).astype(x_t.dtype)
                )
                i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c_new = f * c_t + i * g
                h_new = o * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            b = h.shape[0]
            init = (jnp.zeros((b, self.dim), h.dtype), jnp.zeros((b, self.dim), h.dtype))
            _, hs = jax.lax.scan(step, init, h.swapaxes(0, 1))
            h = hs.swapaxes(0, 1)
        return x + h  # residual (HF EncodecLSTM)


class EncodecEncoder(nn.Module):
    config: EncodecCodecConfig

    @nn.compact
    def __call__(self, audio):  # (B, T, channels)
        cfg = self.config
        scaling = 1
        x = EncodecConv1d(cfg, cfg.num_filters, cfg.kernel_size, name="conv_in")(audio)
        for i, ratio in enumerate(cfg.upsampling_ratios[::-1]):
            dim = cfg.num_filters * (2 ** i)
            for j in range(cfg.num_residual_layers):
                x = EncodecResnetBlock(
                    cfg, dim, (cfg.dilation_growth_rate ** j, 1), name=f"res_{i}_{j}"
                )(x)
            x = jax.nn.elu(x)
            x = EncodecConv1d(cfg, dim * 2, 2 * ratio, stride=ratio, name=f"down_{i}")(x)
            scaling *= 2
        x = EncodecLSTM(cfg, cfg.num_filters * scaling, name="lstm")(x)
        x = jax.nn.elu(x)
        return EncodecConv1d(cfg, cfg.hidden_size, cfg.last_kernel_size, name="conv_out")(x)


class EncodecDecoder(nn.Module):
    config: EncodecCodecConfig

    @nn.compact
    def __call__(self, latents):  # (B, T', hidden)
        cfg = self.config
        scaling = 2 ** len(cfg.upsampling_ratios)
        x = EncodecConv1d(cfg, cfg.num_filters * scaling, cfg.kernel_size, name="conv_in")(latents)
        x = EncodecLSTM(cfg, cfg.num_filters * scaling, name="lstm")(x)
        for i, ratio in enumerate(cfg.upsampling_ratios):
            dim = cfg.num_filters * (2 ** (len(cfg.upsampling_ratios) - i))
            x = jax.nn.elu(x)
            x = EncodecConvTranspose1d(cfg, dim // 2, 2 * ratio, stride=ratio, name=f"up_{i}")(x)
            for j in range(cfg.num_residual_layers):
                x = EncodecResnetBlock(
                    cfg, dim // 2, (cfg.dilation_growth_rate ** j, 1), name=f"res_{i}_{j}"
                )(x)
        x = jax.nn.elu(x)
        return EncodecConv1d(cfg, cfg.audio_channels, cfg.last_kernel_size, name="conv_out")(x)


class EncodecRVQ(nn.Module):
    config: EncodecCodecConfig

    def setup(self):
        cfg = self.config
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (cfg.num_codebooks, cfg.codebook_size, cfg.codebook_dim), jnp.float32,
        )

    def from_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(B, K, T') -> (B, T', codebook_dim): sum of codebook vectors."""
        gathered = jax.vmap(lambda cb, ids: cb[ids], in_axes=(0, 1), out_axes=1)(
            self.codebooks, codes
        )
        return gathered.sum(axis=1)

    def encode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, T', D) -> (B, K, T'), greedy residual L2 argmin (HF
        EncodecResidualVectorQuantizer.encode — no normalization)."""
        residual = latents
        out = []
        for k in range(self.config.num_codebooks):
            cb = self.codebooks[k]
            dist = (
                jnp.sum(residual**2, axis=-1, keepdims=True)
                - 2.0 * residual @ cb.T
                + jnp.sum(cb**2, axis=-1)[None, None, :]
            )
            idx = jnp.argmin(dist, axis=-1)
            out.append(idx)
            residual = residual - cb[idx]
        return jnp.stack(out, axis=1).astype(jnp.int32)

    def __call__(self, codes):
        return self.from_codes(codes)


class EncodecCodec(nn.Module):
    """encode/decode API matching `DACModel` so the pipeline can swap codecs."""

    config: EncodecCodecConfig

    def setup(self):
        self.encoder = EncodecEncoder(self.config, name="encoder")
        self.quantizer = EncodecRVQ(self.config, name="quantizer")
        self.decoder = EncodecDecoder(self.config, name="decoder")

    def _scale(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Per-clip RMS scale of the channel-mean signal (HF EncodecModel
        `_encode_frame` normalize branch). audio (B, T, C) -> (B,)."""
        mono = audio.mean(axis=-1)                              # (B, T)
        return jnp.sqrt(jnp.mean(mono**2, axis=-1)) + 1e-8

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) -> (B, K, T') codes. With `normalize=True` checkpoints
        the clip is RMS-normalized first (codes match HF); the scale needed
        to reconstruct amplitude comes from `encode_with_scale`."""
        if self.config.normalize:
            audio = audio / self._scale(audio)[:, None, None]
        return self.quantizer.encode(self.encoder(audio))

    def encode_with_scale(
        self, audio: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(codes (B, K, T'), audio_scales (B,)) — the HF `.encode()` output
        pair for normalize checkpoints (scales are all-ones otherwise)."""
        if not self.config.normalize:
            return self.encode(audio), jnp.ones((audio.shape[0],), audio.dtype)
        scale = self._scale(audio)
        codes = self.quantizer.encode(self.encoder(audio / scale[:, None, None]))
        return codes, scale

    def decode(self, codes: jnp.ndarray, audio_scales=None) -> jnp.ndarray:
        """(B, K, T') -> (B, T, C); `audio_scales` (B,) re-applies the encode
        normalization (HF `_decode_frame`'s `outputs * scale`)."""
        audio = self.decoder(self.quantizer.from_codes(codes))
        if audio_scales is not None:
            audio = audio * jnp.asarray(audio_scales)[:, None, None]
        return audio

    def __call__(self, audio):
        codes, scale = self.encode_with_scale(audio)
        return self.decode(codes, scale if self.config.normalize else None)


# -------------------------------------------------------------------- convert
def convert_encodec_params(
    tensors: Mapping[str, np.ndarray], config: EncodecCodecConfig, prefix: str = ""
) -> Dict:
    """HF EncodecModel state dict -> `EncodecCodec` params (weight-norm folded)."""
    from .convert import _folded_weight

    def conv(name):
        w = _folded_weight(tensors, f"{prefix}{name}.conv")
        return {
            "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
            "bias": np.asarray(tensors[f"{prefix}{name}.conv.bias"]),
        }

    def conv_t(name):
        w = _folded_weight(tensors, f"{prefix}{name}.conv")  # (in, out, k)
        return {
            "kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
            "bias": np.asarray(tensors[f"{prefix}{name}.conv.bias"]),
        }

    def resnet(name):
        return {
            "block_0": conv(f"{name}.block.1"),
            "block_1": conv(f"{name}.block.3"),
            "shortcut": conv(f"{name}.shortcut"),
        }

    def lstm(name, dim):
        out = {}
        for layer in range(config.num_lstm_layers):
            for part in ("w_ih", "w_hh", "b_ih", "b_hh"):
                t = part.replace("w_", "weight_").replace("b_", "bias_")
                out[f"{part}_l{layer}"] = np.asarray(
                    tensors[f"{prefix}{name}.lstm.{t}_l{layer}"]
                )
        return out

    n_ratios = len(config.upsampling_ratios)
    n_res = config.num_residual_layers
    per_stage = n_res + 1  # resnet blocks (as single layers) + downsample conv

    enc: Dict = {"conv_in": conv("encoder.layers.0")}
    li = 1
    for i in range(n_ratios):
        for j in range(n_res):
            enc[f"res_{i}_{j}"] = resnet(f"encoder.layers.{li}")
            li += 1
        li += 1  # ELU module holds no params but owns a layer index
        enc[f"down_{i}"] = conv(f"encoder.layers.{li}")
        li += 1
    enc["lstm"] = lstm(f"encoder.layers.{li}", 0)
    li += 2  # lstm + final ELU
    enc["conv_out"] = conv(f"encoder.layers.{li}")

    dec: Dict = {"conv_in": conv("decoder.layers.0"), "lstm": lstm("decoder.layers.1", 0)}
    li = 3  # conv, lstm, elu
    for i in range(n_ratios):
        dec[f"up_{i}"] = conv_t(f"decoder.layers.{li}")
        li += 1
        for j in range(n_res):
            dec[f"res_{i}_{j}"] = resnet(f"decoder.layers.{li}")
            li += 1
        li += 1  # ELU
    dec["conv_out"] = conv(f"decoder.layers.{li}")

    cbs = np.stack(
        [
            np.asarray(tensors[f"{prefix}quantizer.layers.{k}.codebook.embed"])
            for k in range(config.num_codebooks)
        ]
    )
    return {"encoder": enc, "quantizer": {"codebooks": cbs}, "decoder": dec}

"""Descript Audio Codec (DAC) re-implemented natively in JAX.

The reference wraps the external torch `dac` package
(`/root/reference/parler_tts/dac_wrapper/modeling_dac.py:24-28`); the conv/VQ
stack executes as cuDNN kernels there. Here the full codec — Snake-activation
conv encoder, residual vector quantizer, transposed-conv decoder — is native
JAX/XLA (SURVEY.md §2.4 native-component item 2). Decode is the hot serving
path (reference `modeling_parler_tts.py:3621-3624`).

Layout is TPU-first: activations (B, T, C) with channels on the minor (lane)
axis, kernels (K, C_in, C_out); weight norm is FOLDED into dense kernels at
conversion time (reference re-applies torch weight-norm parametrizations at
load, dac_wrapper/modeling_dac.py:148-164 — a training-time construct with no
inference value).

Architecture constants follow the published 44.1 kHz DAC: encoder_dim 64 with
rates (2, 4, 8, 8), decoder_dim 1536 with rates (8, 8, 4, 2), 9 codebooks of
1024 entries, codebook_dim 8, latent_dim 1024, hop 512.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DACConfig


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation: x + (1/alpha) sin^2(alpha x), alpha per-channel.

    Matches descript's `x + (alpha + 1e-9)^-1 * sin(alpha x)^2`.
    """
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


class Snake1d(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1, 1, self.channels), jnp.float32)
        return snake(x, alpha.astype(x.dtype))


class Conv1d(nn.Module):
    """Plain 1-D conv in (B, T, C); weight-norm folded upstream.

    Torch-equivalent semantics: explicit symmetric zero padding `padding`,
    stride, dilation; kernel (K, C_in, C_out); bias (C_out,).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(x.dtype)


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d in (B, T, C).

    out_len = (T - 1) * stride - 2 * padding + kernel_size.
    Implemented as an input-dilated conv with a spatially flipped kernel —
    the exact XLA dual of torch's transposed conv.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        # stored like torch: (K, C_in, C_out) after conversion transposes
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel.astype(x.dtype), axis=0),
            window_strides=(1,),
            padding=((pad, pad),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(x.dtype)


class ResidualUnit(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, name="snake1")(x)
        y = Conv1d(self.dim, 7, padding=pad, dilation=self.dilation, name="conv1")(y)
        y = Snake1d(self.dim, name="snake2")(y)
        y = Conv1d(self.dim, 1, name="conv2")(y)
        return x + y


class EncoderBlock(nn.Module):
    dim: int  # output channels
    stride: int

    @nn.compact
    def __call__(self, x):
        h = self.dim // 2
        x = ResidualUnit(h, 1, name="res1")(x)
        x = ResidualUnit(h, 3, name="res2")(x)
        x = ResidualUnit(h, 9, name="res3")(x)
        x = Snake1d(h, name="snake")(x)
        return Conv1d(
            self.dim, 2 * self.stride, stride=self.stride,
            padding=math.ceil(self.stride / 2), name="down",
        )(x)


class DACEncoder(nn.Module):
    config: DACConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio (B, T, 1) -> latents (B, T / hop, latent_dim)."""
        cfg = self.config
        d = cfg.encoder_dim
        x = Conv1d(d, 7, padding=3, name="conv_in")(audio)
        for i, stride in enumerate(cfg.encoder_rates):
            d *= 2
            x = EncoderBlock(d, stride, name=f"block_{i}")(x)
        x = Snake1d(d, name="snake_out")(x)
        return Conv1d(cfg.latent_dim, 3, padding=1, name="conv_out")(x)


class DecoderBlock(nn.Module):
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake1d(x.shape[-1], name="snake")(x)
        x = ConvTranspose1d(
            self.output_dim, 2 * self.stride, stride=self.stride,
            padding=math.ceil(self.stride / 2), name="up",
        )(x)
        x = ResidualUnit(self.output_dim, 1, name="res1")(x)
        x = ResidualUnit(self.output_dim, 3, name="res2")(x)
        x = ResidualUnit(self.output_dim, 9, name="res3")(x)
        return x


class DACDecoder(nn.Module):
    config: DACConfig

    @nn.compact
    def __call__(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents (B, T', latent_dim) -> audio (B, T' * hop, 1) in [-1, 1]."""
        cfg = self.config
        x = Conv1d(cfg.decoder_dim, 7, padding=3, name="conv_in")(latents)
        for i, stride in enumerate(cfg.decoder_rates):
            out_dim = cfg.decoder_dim // (2 ** (i + 1))
            x = DecoderBlock(out_dim, stride, name=f"block_{i}")(x)
        x = Snake1d(x.shape[-1], name="snake_out")(x)
        x = Conv1d(1, 7, padding=3, name="conv_out")(x)
        return jnp.tanh(x)


class ResidualVQ(nn.Module):
    """Residual vector quantizer (decode from codes + encode-to-codes)."""

    config: DACConfig

    def setup(self):
        cfg = self.config
        # stacked across codebooks: codebooks (K, C, d_cb);
        # in/out projections are 1x1 convs == dense (weight-norm folded).
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (cfg.num_codebooks, cfg.codebook_size, cfg.codebook_dim), jnp.float32,
        )
        self.in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.lecun_normal(),
            (cfg.num_codebooks, cfg.latent_dim, cfg.codebook_dim), jnp.float32,
        )
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros,
            (cfg.num_codebooks, cfg.codebook_dim), jnp.float32,
        )
        self.out_proj_kernel = self.param(
            "out_proj_kernel", nn.initializers.lecun_normal(),
            (cfg.num_codebooks, cfg.codebook_dim, cfg.latent_dim), jnp.float32,
        )
        self.out_proj_bias = self.param(
            "out_proj_bias", nn.initializers.zeros,
            (cfg.num_codebooks, cfg.latent_dim), jnp.float32,
        )

    def from_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, K, T') -> continuous latents (B, T', latent_dim).

        z_q = sum_k out_proj_k(codebook_k[codes_k]) — one batched gather and one
        batched matmul instead of the reference's K-step Python loop
        (dac's `ResidualVectorQuantize.from_codes`).
        """
        z_p = jax.vmap(lambda cb, ids: cb[ids], in_axes=(0, 1), out_axes=1)(
            self.codebooks, codes
        )  # (B, K, T', d_cb)
        z_q = jnp.einsum(
            "bktc,kcd->btd", z_p, self.out_proj_kernel,
            preferred_element_type=jnp.float32,
        )
        return z_q + self.out_proj_bias.sum(axis=0)[None, None, :]

    def encode(self, latents: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy residual quantization: latents (B, T', D) -> (codes (B, K, T'), z_q).

        Distances use L2-normalized projections and codebook entries, matching
        dac's `decode_latents`.
        """
        cfg = self.config

        def body(residual, k):
            z_e = (
                jnp.einsum("btd,dc->btc", residual, self.in_proj_kernel[k])
                + self.in_proj_bias[k][None, None, :]
            )
            enc = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-12)
            cb = self.codebooks[k]
            cbn = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
            # squared euclidean distance between normalized vectors
            dist = (
                jnp.sum(enc**2, axis=-1, keepdims=True)
                - 2.0 * jnp.einsum("btc,nc->btn", enc, cbn)
                + jnp.sum(cbn**2, axis=-1)[None, None, :]
            )
            idx = jnp.argmin(dist, axis=-1)  # (B, T')
            z_q_k = (
                jnp.einsum("btc,cd->btd", cb[idx], self.out_proj_kernel[k])
                + self.out_proj_bias[k][None, None, :]
            )
            return residual - z_q_k, (idx, z_q_k)

        residual = latents
        codes, zqs = [], []
        for k in range(cfg.num_codebooks):
            residual, (idx, z_q_k) = body(residual, k)
            codes.append(idx)
            zqs.append(z_q_k)
        return jnp.stack(codes, axis=1).astype(jnp.int32), sum(zqs)

    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.from_codes(codes)


class DACModel(nn.Module):
    """Full codec: encode waveform -> codes; decode codes -> waveform.

    API parity with the reference wrapper (`dac_wrapper/modeling_dac.py:33-142`)
    at the array level: codes are (B, K, T') int32, audio is (B, T, 1) float.
    """

    config: DACConfig

    def setup(self):
        self.encoder = DACEncoder(self.config, name="encoder")
        self.quantizer = ResidualVQ(self.config, name="quantizer")
        self.decoder = DACDecoder(self.config, name="decoder")

    def pad_length(self, length: int) -> int:
        hop = self.config.hop_length
        return math.ceil(length / hop) * hop

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio (B, T, 1), T a multiple of hop_length -> codes (B, K, T/hop)."""
        latents = self.encoder(audio)
        codes, _ = self.quantizer.encode(latents)
        return codes

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, K, T') -> audio (B, T' * hop, 1)."""
        return self.decoder(self.quantizer.from_codes(codes))

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Round trip (for tests)."""
        return self.decode(self.encode(audio))

"""TPU-native Parler-TTS: a from-scratch JAX/XLA/Pallas re-design of the
huggingface/parler-tts text-to-speech system.

Compute path is pure JAX (jit/pjit over a device mesh, Pallas kernels for the
hot ops); the reference's capabilities — T5 description encoder, delay-pattern
AR codec-token decoder, DAC neural codec, generation runtime with streaming,
and the distributed training pipeline — are re-built TPU-first.
"""

__version__ = "0.1.0"

from . import config, ops
from .config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
    dummy_decoder_config,
    large_v1_decoder_config,
    mini_v1_decoder_config,
)

__all__ = [
    "config",
    "ops",
    "DACConfig",
    "DecoderConfig",
    "GenerationConfig",
    "ParlerTTSConfig",
    "T5Config",
    "dummy_decoder_config",
    "large_v1_decoder_config",
    "mini_v1_decoder_config",
]

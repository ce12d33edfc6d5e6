"""TPU-native Parler-TTS: a from-scratch JAX/XLA/Pallas re-design of the
huggingface/parler-tts text-to-speech system.

Compute path is pure JAX (jit/pjit over a device mesh, Pallas kernels for the
hot ops); the reference's capabilities — T5 description encoder, delay-pattern
AR codec-token decoder, DAC neural codec, generation runtime with streaming,
and the distributed training pipeline — are re-built TPU-first.

Public API parity with the reference package (`/root/reference/parler_tts/__init__.py`):
ParlerTTS* model classes, delay-pattern helpers, the streamer, and configs.
"""

__version__ = "0.1.0"

from . import codec, config, models, ops, parallel, runtime
from .codec.dac_model import DACModel
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
from .models.decoder import DecoderCache, ParlerDecoder, ParlerForCausalLM
from .models.parler import ParlerTTS
from .models.t5_encoder import T5Encoder
from .ops.delay_pattern import (
    apply_delay_pattern_mask,
    build_delay_pattern_mask,
    undelay_pattern,
)
from .runtime.generate import generate_tokens, make_generate, make_stream_functions
from .runtime.pipeline import ParlerTTSPipeline
from .runtime.streamer import ParlerTTSStreamer

__all__ = [
    "codec",
    "config",
    "models",
    "ops",
    "parallel",
    "runtime",
    "DACModel",
    "DACConfig",
    "DecoderConfig",
    "GenerationConfig",
    "ParlerTTSConfig",
    "T5Config",
    "dummy_decoder_config",
    "large_v1_decoder_config",
    "mini_v1_decoder_config",
    "DecoderCache",
    "ParlerDecoder",
    "ParlerForCausalLM",
    "ParlerTTS",
    "T5Encoder",
    "apply_delay_pattern_mask",
    "build_delay_pattern_mask",
    "undelay_pattern",
    "generate_tokens",
    "make_generate",
    "make_stream_functions",
    "ParlerTTSPipeline",
    "ParlerTTSStreamer",
]

"""Codec registry: pick the codec family from the composite config.

The reference dispatches on the audio encoder's HF `model_type`
(`dac_on_the_hub` wrapper vs `encodec`, see
`/root/reference/parler_tts/modeling_parler_tts.py:2820-2860` and
`helpers/model_init_scripts/init_dummy_model_with_encodec.py`). Here the
discriminator is the `codec_type` field on the audio-encoder config, so both
the pipeline and the training driver stay codec-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .convert import convert_dac_params
from .dac_model import DACModel
from .encodec_model import EncodecCodec, convert_encodec_params


def codec_kind(audio_cfg: Any) -> str:
    return getattr(audio_cfg, "codec_type", "dac")


def codec_channels(audio_cfg: Any) -> int:
    return getattr(audio_cfg, "audio_channels", 1)


def build_codec(audio_cfg: Any):
    """Config -> flax codec module with the shared encode/decode contract:
    encode: (B, T, C) float -> (B, K, T/hop) int32; decode: the inverse."""
    if codec_kind(audio_cfg) == "encodec":
        return EncodecCodec(audio_cfg)
    return DACModel(audio_cfg)


def init_codec_params(codec, audio_cfg: Any, key) -> Dict:
    """Random codec params via a full encode+decode roundtrip on one hop."""
    x = jnp.zeros((1, audio_cfg.hop_length, codec_channels(audio_cfg)), jnp.float32)
    return codec.init(key, x)["params"]


def convert_codec_params(
    tensors: Mapping[str, np.ndarray], audio_cfg: Any, prefix: str = "audio_encoder."
) -> Dict:
    """Composite HF state dict -> codec params. The DAC wrapper nests the real
    model under `.model.` (dac_wrapper/modeling_dac.py); Encodec tensors sit
    directly under `audio_encoder.`."""
    if codec_kind(audio_cfg) == "encodec":
        return convert_encodec_params(tensors, audio_cfg, prefix=prefix)
    return convert_dac_params(tensors, audio_cfg, prefix=prefix + "model.")

"""Build a tiny smoke-test checkpoint wired to the Encodec codec (8 codebooks).

Equivalent of `/root/reference/helpers/model_init_scripts/init_dummy_model_with_encodec.py:24-67`.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.codec.encodec_model import EncodecCodec, EncodecCodecConfig
from parler_tts_tpu.config import DACConfig, ParlerTTSConfig, T5Config, dummy_decoder_config
from parler_tts_tpu.models.parler import ParlerTTS


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("save_directory", type=str)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    codec_cfg = EncodecCodecConfig(
        sampling_rate=32000, num_codebooks=8, codebook_size=2048,
        codebook_dim=128, hidden_size=128,
    )
    decoder = dummy_decoder_config(
        vocab_size=2048 + 64, num_codebooks=8,
        pad_token_id=2048, eos_token_id=2048, bos_token_id=2049,
    )
    cfg = ParlerTTSConfig(
        text_encoder=T5Config(vocab_size=32128, d_model=256, d_kv=64, d_ff=512,
                              num_layers=2, num_heads=4),
        # token-id geometry mirrored for the composite config; the codec itself
        # is the EncodecCodec saved alongside
        audio_encoder=DACConfig(
            num_codebooks=8, codebook_size=2048,
            sampling_rate=codec_cfg.sampling_rate,
            frame_rate=codec_cfg.frame_rate,
        ),
        decoder=decoder,
        vocab_size=32128,
        pad_token_id=2048,
        decoder_start_token_id=2049,
    )
    model = ParlerTTS(cfg)
    k1, k2 = jax.random.split(jax.random.key(args.seed))
    params = jax.jit(model.init)(
        k1,
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, 8), jnp.int32),
    )["params"]
    codec = EncodecCodec(codec_cfg)
    codec_params = codec.init(
        k2, jnp.zeros((1, codec_cfg.hop_length, 1), jnp.float32)
    )["params"]

    os.makedirs(args.save_directory, exist_ok=True)
    with open(os.path.join(args.save_directory, "config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(args.save_directory, "params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    with open(os.path.join(args.save_directory, "encodec_params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, codec_params), f)
    print(f"saved dummy-with-encodec model to {args.save_directory}")


if __name__ == "__main__":
    main()

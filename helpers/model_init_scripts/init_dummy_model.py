"""Build the canonical tiny (4L/512h) smoke-test checkpoint.

Equivalent of `/root/reference/helpers/model_init_scripts/init_dummy_model.py:27-69`.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.config import DACConfig, ParlerTTSConfig, T5Config, dummy_decoder_config
from parler_tts_tpu.models.parler import ParlerTTS


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("save_directory", type=str)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    dac = DACConfig()
    cfg = ParlerTTSConfig(
        text_encoder=T5Config(vocab_size=32128, d_model=256, d_kv=64, d_ff=512,
                              num_layers=2, num_heads=4),
        audio_encoder=dac,
        decoder=dummy_decoder_config(),
        vocab_size=32128,
        pad_token_id=dac.codebook_size,
        decoder_start_token_id=dac.codebook_size + 1,
    )
    model = ParlerTTS(cfg)
    params = jax.jit(model.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, cfg.decoder.num_codebooks), jnp.int32),
    )["params"]
    os.makedirs(args.save_directory, exist_ok=True)
    with open(os.path.join(args.save_directory, "config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(args.save_directory, "params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"saved dummy model to {args.save_directory}")


if __name__ == "__main__":
    main()

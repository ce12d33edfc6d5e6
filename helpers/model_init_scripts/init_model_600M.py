"""Build an untrained mini-v1 (600M-decoder) checkpoint from scratch.

Equivalent of `/root/reference/helpers/model_init_scripts/init_model_600M.py`:
decoder vocab rounded to a multiple of 64 above the codec codebook size,
pad = eos = codebook_size, bos = decoder_start = codebook_size + 1,
generation max_length = 30 s * frame_rate.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from parler_tts_tpu.config import (
    DACConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
    mini_v1_decoder_config,
)
from parler_tts_tpu.models.parler import ParlerTTS


def flan_t5_base() -> T5Config:
    return T5Config(vocab_size=32128, d_model=768, d_kv=64, d_ff=2048,
                    num_layers=12, num_heads=12)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("save_directory", type=str)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    dac = DACConfig()
    decoder = mini_v1_decoder_config()
    cfg = ParlerTTSConfig(
        text_encoder=flan_t5_base(),
        audio_encoder=dac,
        decoder=decoder,
        vocab_size=32128,
        pad_token_id=dac.codebook_size,
        decoder_start_token_id=dac.codebook_size + 1,
    )
    gen = GenerationConfig(
        max_length=int(30 * dac.frame_rate),
        do_sample=True,
        bos_token_id=decoder.bos_token_id,
        pad_token_id=decoder.pad_token_id,
        eos_token_id=decoder.eos_token_id,
    )

    model = ParlerTTS(cfg)
    k = decoder.num_codebooks
    params = jax.jit(model.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, k), jnp.int32),
    )["params"]

    os.makedirs(args.save_directory, exist_ok=True)
    with open(os.path.join(args.save_directory, "config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(args.save_directory, "generation_config.json"), "w") as f:
        import dataclasses, json

        json.dump(dataclasses.asdict(gen), f, indent=2)
    import numpy as np

    host = jax.tree.map(np.asarray, params)
    with open(os.path.join(args.save_directory, "params.pkl"), "wb") as f:
        pickle.dump(host, f)
    print(f"saved untrained mini-v1 to {args.save_directory}")


if __name__ == "__main__":
    main()

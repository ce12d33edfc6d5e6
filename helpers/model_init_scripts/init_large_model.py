"""Build an untrained large-v1 (2.3B) checkpoint.

Equivalent of `/root/reference/helpers/model_init_scripts/init_large_model.py:25-43`
(30L / 1536h / 24H / 6144 ffn decoder, flan-t5-large encoder).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.config import (
    DACConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
    large_v1_decoder_config,
)
from parler_tts_tpu.models.parler import ParlerTTS


def flan_t5_large() -> T5Config:
    return T5Config(vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816,
                    num_layers=24, num_heads=16)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("save_directory", type=str)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    dac = DACConfig()
    decoder = large_v1_decoder_config()
    cfg = ParlerTTSConfig(
        text_encoder=flan_t5_large(),
        audio_encoder=dac,
        decoder=decoder,
        vocab_size=32128,
        pad_token_id=dac.codebook_size,
        decoder_start_token_id=dac.codebook_size + 1,
    )
    model = ParlerTTS(cfg)
    params = jax.jit(model.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, decoder.num_codebooks), jnp.int32),
    )["params"]
    os.makedirs(args.save_directory, exist_ok=True)
    with open(os.path.join(args.save_directory, "config.json"), "w") as f:
        f.write(cfg.to_json())
    import dataclasses, json

    gen = GenerationConfig(
        max_length=int(30 * dac.frame_rate), do_sample=True,
        bos_token_id=decoder.bos_token_id, pad_token_id=decoder.pad_token_id,
        eos_token_id=decoder.eos_token_id,
    )
    with open(os.path.join(args.save_directory, "generation_config.json"), "w") as f:
        json.dump(dataclasses.asdict(gen), f, indent=2)
    with open(os.path.join(args.save_directory, "params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"saved untrained large-v1 to {args.save_directory}")


if __name__ == "__main__":
    main()

"""Per-mode B=1 decode-step latency on the flagship (mini-v1) architecture.

Usage: python benchmarks/decode_step.py [plain|fq|wq|xq|mega] [max_length]

Modes map to the serving options documented in INFERENCE.md:
  plain — bf16 XLA while_loop (the default pipeline)
  fq    — fused_qkv=True (one q|k|v matmul per layer)
  fd    — use_flash_decode=True (Pallas prefix-bounded cache attention)
  wq    — weight_quant=True (Pallas int8 dequant-matmul kernel)
  xq    — weight_quant="xla" (int8 weights, convert fused into the dot)
  mega  — fused_decode=True (whole layer stack as one Pallas megakernel)

Prints token-loop wall time, steps/s, and ms/step over 3 timed runs (median).
Run ONE mode per process on the shared chip; let it exit cleanly.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from parler_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship_config
    from parler_tts_tpu.codec.dac_model import DACModel
    from parler_tts_tpu.config import GenerationConfig
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline
    from parler_tts_tpu.utils.dtypes import cast_floating

    mode = sys.argv[1] if len(sys.argv) > 1 else "plain"
    max_length = int(sys.argv[2]) if len(sys.argv) > 2 else 860

    cfg = _flagship_config()
    gen = GenerationConfig(
        max_length=max_length, min_new_tokens=max_length, do_sample=True,
        temperature=1.0, bos_token_id=cfg.decoder.bos_token_id,
        pad_token_id=cfg.decoder.pad_token_id,
        eos_token_id=cfg.decoder.eos_token_id,
        codebook_guard=cfg.audio_encoder.codebook_size,
    )
    model = ParlerTTS(cfg, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.key(0))
    params = jax.jit(model.init)(
        k1,
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, cfg.decoder.num_codebooks), jnp.int32),
    )["params"]
    dac = DACModel(cfg.audio_encoder)
    dac_params = jax.jit(
        lambda k: dac.init(
            k, jnp.zeros((1, cfg.audio_encoder.num_codebooks, 2), jnp.int32),
            method="decode",
        )
    )(k2)["params"]
    params = cast_floating(params, jnp.bfloat16)

    kw = {}
    if mode == "fq":
        kw["fused_qkv"] = True
    elif mode == "fd":
        model = ParlerTTS(cfg, dtype=jnp.bfloat16, use_flash_decode=True)
    elif mode == "mega":
        kw["fused_decode"] = True
    elif mode in ("wq", "xq"):
        from parler_tts_tpu.utils.quantize import quantize_decoder_params

        model = ParlerTTS(cfg, dtype=jnp.bfloat16,
                          weight_quant=(True if mode == "wq" else "xla"))
        params = quantize_decoder_params(params)

    pipe = ParlerTTSPipeline(model, params, dac, dac_params, gen, **kw)

    rng = np.random.default_rng(0)
    desc = rng.integers(0, 32000, size=(1, 16)).astype(np.int32)
    dm = np.ones((1, 16), np.int32)
    prompt = rng.integers(0, 32000, size=(1, 8)).astype(np.int32)
    pm = np.ones((1, 8), np.int32)

    out = pipe.generate_codes(desc, dm, prompt, pm, seed=0)
    np.asarray(out.codes)  # compile + sync
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = pipe.generate_codes(desc, dm, prompt, pm, seed=i + 1)
        np.asarray(out.codes)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(
        f"[{mode}] token-loop {med:.3f}s "
        f"({max_length / med:.0f} steps/s, {med / max_length * 1e3:.2f} ms/step)",
        flush=True,
    )


if __name__ == "__main__":
    main()

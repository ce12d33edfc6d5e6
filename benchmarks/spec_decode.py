"""Speculative-decode A/B on the real chip: full-length mini-v1 generations
through the plain AR loop vs speculative windows, with accepted-columns
accounting.

Honesty note: bench weights are random (no network in this environment), and
speculation throughput is checkpoint-dependent — the accepted-columns/forward
printed here characterizes the RANDOM-weight logit landscape, not a trained
checkpoint. The mechanism is exact either way (greedy token-identical /
sampling distribution-preserving, tests/test_speculative.py); only the
SPEEDUP transfers approximately. Run with a real checkpoint directory to
measure deployment acceptance:  python benchmarks/spec_decode.py /path/to/ckpt
"""

import sys
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, ".")
    from parler_tts_tpu.config import GenerationConfig
    from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline
    from parler_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    max_length = 860
    windows = [int(w) for w in (sys.argv[2].split(",") if len(sys.argv) > 2
                                else ("4", "8", "16"))]

    if len(sys.argv) > 1 and sys.argv[1] == "large":
        # large-v1 (2.3B-class decoder) with random bf16 weights: quantifies
        # how speculation moves the BIG-model B=1 latency story
        import jax.numpy as jnp

        from parler_tts_tpu.codec.dac_model import DACModel
        from parler_tts_tpu.config import (
            GenerationConfig, ParlerTTSConfig, large_v1_decoder_config,
        )
        from parler_tts_tpu.models.parler import ParlerTTS
        from parler_tts_tpu.utils.dtypes import cast_floating

        cfg = ParlerTTSConfig(decoder=large_v1_decoder_config())
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
        params = cast_floating(params, jnp.bfloat16)
        dac = DACModel(cfg.audio_encoder)
        dac_params = jax.jit(
            lambda k: dac.init(
                k, jnp.zeros((1, cfg.audio_encoder.num_codebooks, 2), jnp.int32),
                method="decode",
            )
        )(k2)["params"]
        base = ParlerTTSPipeline(model, params, dac, dac_params, gen)
    elif len(sys.argv) > 1 and not sys.argv[1].isdigit():
        base = ParlerTTSPipeline.from_pretrained(sys.argv[1])
        cfg = base.config
        gen = base.generation_config
    else:
        import os

        # the A/B baseline must be the PLAIN AR loop — bench.py's BENCH_MODE
        # default is "spec", which would silently make t_plain a speculative
        # measurement and every "speedup vs plain" line ~1.0x
        os.environ["BENCH_MODE"] = "plain"
        from bench import build_pipeline

        base = build_pipeline(max_length, 10.0)
        cfg = base.config
        gen = base.generation_config

    rng = np.random.default_rng(0)
    d = rng.integers(0, 30000, size=(1, 16)).astype(np.int32)
    dm = np.ones_like(d)
    p = rng.integers(0, 30000, size=(1, 8)).astype(np.int32)
    pm = np.ones_like(p)

    def timed(pipe, tag):
        t0 = time.perf_counter()
        out = pipe.generate_codes(d, dm, p, pm, seed=0)
        np.asarray(out.codes)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = pipe.generate_codes(d, dm, p, pm, seed=i + 1)
            np.asarray(out.codes)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        stats = pipe.last_spec_stats
        extra = ""
        if stats is not None:
            cpf = int(stats.columns) / max(1, int(stats.forwards))
            extra = (f" forwards={int(stats.forwards)} "
                     f"cols/fwd={cpf:.2f}")
        print(f"{tag}: compile={compile_s:.1f}s med={med:.3f}s "
              f"steps={int(out.steps)}{extra}", flush=True)
        return med

    t_plain = timed(base, "plain AR")
    for w in windows:
        pipe = ParlerTTSPipeline(
            base.model, base.params, base.dac, base.dac_params, gen,
            speculative_window=w,
        )
        t = timed(pipe, f"spec W={w}")
        print(f"  -> speedup vs plain: {t_plain / t:.2f}x", flush=True)


if __name__ == "__main__":
    main()

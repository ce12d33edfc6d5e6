"""Large-v1 (2.3B) serving frontier on one v5e chip.

Two parts (VERDICT r4 Next #8 — the 2.3B model is where serving economics
matter most, INFERENCE.md:33-34):

A. FULL large-v1 geometry (30L/1536h/24H/6144ffn), random bf16 weights —
   acceptance-independent numbers: flash-decode plain loop at B in
   {1, 8, 16}, plus per-row speculative x flash at B=8 (random-weights
   acceptance pole).

B. TRIMMED large (10 of 30 layers, SAME 1536h/24H/6144ffn layout — chip-time
   bound; acceptance is a property of trained logit sharpness, measured at
   the large head/ffn layout) — overfit on the period-16 corpus like
   benchmarks/spec_trained.py, then composed spec W=16 at B=1 and per-row
   B=8: the trained-acceptance point at large geometry.

  python benchmarks/large_frontier.py [--part A|B|AB] [--steps 150]

Results merge into benchmarks/ckpt_overfit/results.json under "large_v1"
(part A) and "large_v1_trimmed_trained" (part B). Run ONE process at a time
on the shared chip.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_large(n_layers=None):
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.config import (
        GenerationConfig, ParlerTTSConfig, large_v1_decoder_config,
    )
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.utils.dtypes import cast_floating
    import dataclasses

    dec = large_v1_decoder_config()
    if n_layers is not None:
        dec = dataclasses.replace(dec, num_hidden_layers=n_layers)
    cfg = ParlerTTSConfig(decoder=dec)
    max_length = 860
    gen = GenerationConfig(
        max_length=max_length, min_new_tokens=max_length, do_sample=True,
        temperature=1.0, bos_token_id=dec.bos_token_id,
        pad_token_id=dec.pad_token_id, eos_token_id=dec.eos_token_id,
        codebook_guard=cfg.audio_encoder.codebook_size,
    )
    greedy = dataclasses.replace(gen, do_sample=False)

    def init_params(model):
        p = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
            jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
            jnp.zeros((1, 2, dec.num_codebooks), jnp.int32),
        )["params"]
        return cast_floating(p, jnp.bfloat16)

    return cfg, gen, greedy, init_params, max_length


def timed_gen(fn, params, b, seed, spec):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = jnp.asarray(np.tile(rng.integers(0, 30000, (1, 16)), (b, 1)), jnp.int32)
    p = jnp.asarray(np.tile(rng.integers(0, 30000, (1, 8)), (b, 1)), jnp.int32)
    dm, pm = jnp.ones_like(d), jnp.ones_like(p)
    out = fn(params, d, dm, p, pm, jax.random.key(seed))
    stats = None
    if spec:
        out, stats = out
    np.asarray(out.codes)
    t0 = time.perf_counter()
    out = fn(params, d, dm, p, pm, jax.random.key(seed + 1))
    if spec:
        out, stats = out
    np.asarray(out.codes)
    return time.perf_counter() - t0, stats


def part_a(results):
    import jax.numpy as jnp

    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.runtime.generate import make_generate
    from parler_tts_tpu.runtime.speculative import make_generate_speculative

    cfg, gen, _greedy, init_params, max_length = build_large()
    audio_s = (max_length - cfg.decoder.num_codebooks) / 86
    model_fd = ParlerTTS(cfg, dtype=jnp.bfloat16, use_flash_decode=True)
    params = init_params(model_fd)

    for b in (1, 8, 16):
        fn = make_generate(model_fd, gen)
        wall, _ = timed_gen(fn, params, b, 0, False)
        row = {
            "aggregate_rtfx": round(audio_s * b / wall, 2),
            "ms_per_step": round(wall / max_length * 1e3, 2),
        }
        results[f"fd_plain_b{b}"] = row
        print(f"[large fd plain B={b}] {wall:.3f}s -> {row}", flush=True)

    fn = make_generate_speculative(model_fd, gen, window=16, per_row=True)
    wall, stats = timed_gen(fn, params, 8, 0, True)
    cpf = float(stats.columns) / max(1, float(stats.forwards))
    results["specfd_perrow_b8_w16_random"] = {
        "aggregate_rtfx": round(audio_s * 8 / wall, 2),
        "cols_per_fwd_x_rows": round(cpf, 2),
    }
    print(f"[large specfd B=8 W=16 random] {wall:.3f}s -> "
          f"{results['specfd_perrow_b8_w16_random']}", flush=True)


def part_b(results, steps):
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.runtime.speculative import make_generate_speculative
    from parler_tts_tpu.runtime.generate import make_generate
    from parler_tts_tpu.training import TrainState, make_optimizer, make_train_step
    from parler_tts_tpu.utils.dtypes import cast_floating
    from spec_trained import synthetic_batch

    n_layers = 10
    cfg, gen, greedy, init_params, max_length = build_large(n_layers)
    audio_s = (max_length - cfg.decoder.num_codebooks) / 86
    results["trim_layers"] = n_layers

    train_model = ParlerTTS(
        cfg, dtype=jnp.bfloat16, use_chunked_attention=True, remat_layers=True,
    )
    params = jax.jit(train_model.init)(
        jax.random.key(0),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, cfg.decoder.num_codebooks), jnp.int32),
    )["params"]
    tx = make_optimizer(learning_rate=3e-4, warmup_steps=20,
                        freeze_text_encoder=True)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(train_model, tx)
    batch, desc, prompt = synthetic_batch(cfg, b=2, t_len=max_length)
    print(f"training trimmed large ({n_layers}L) {steps} steps", flush=True)
    t0 = time.perf_counter()
    rng = jax.random.key(1)
    for i in range(steps):
        rng, r = jax.random.split(rng)
        state, m = step_fn(state, batch, r)
        if i % 50 == 0 or i == steps - 1:
            print(f"  step {i}: loss={float(m['loss']):.4f}", flush=True)
    print(f"train wall {time.perf_counter() - t0:.1f}s "
          f"final loss {float(m['loss']):.4f}", flush=True)
    params_bf16 = cast_floating(state.params, jnp.bfloat16)
    del state, params

    model_fd = ParlerTTS(cfg, dtype=jnp.bfloat16, use_flash_decode=True)
    d, dm = jnp.asarray(desc[:1]), jnp.ones((1, 16), jnp.int32)
    p, pm = jnp.asarray(prompt[:1]), jnp.ones((1, 8), jnp.int32)

    plain = make_generate(model_fd, greedy)
    plain(params_bf16, d, dm, p, pm, jax.random.key(7)).codes.block_until_ready()
    t0 = time.perf_counter()
    out = plain(params_bf16, d, dm, p, pm, jax.random.key(7))
    np.asarray(out.codes)
    t_plain = time.perf_counter() - t0
    results["trained_plain_rtfx"] = round(audio_s / t_plain, 2)
    print(f"[trim-large plain greedy] {t_plain:.3f}s "
          f"rtfx={results['trained_plain_rtfx']}", flush=True)

    spec = make_generate_speculative(model_fd, greedy, window=16)
    out, stats = spec(params_bf16, d, dm, p, pm, jax.random.key(7))
    np.asarray(out.codes)
    t0 = time.perf_counter()
    out, stats = spec(params_bf16, d, dm, p, pm, jax.random.key(7))
    np.asarray(out.codes)
    t = time.perf_counter() - t0
    cpf = int(stats.columns) / max(1, int(stats.forwards))
    results["trained_specfd_w16"] = {
        "rtfx": round(audio_s / t, 2), "cols_per_fwd": round(cpf, 2),
        "speedup_vs_plain": round(t_plain / t, 2),
    }
    print(f"[trim-large specfd W=16] {t:.3f}s -> "
          f"{results['trained_specfd_w16']}", flush=True)

    spec8 = make_generate_speculative(model_fd, greedy, window=16, per_row=True)
    d8 = jnp.asarray(np.tile(desc[:1], (8, 1)))
    p8 = jnp.asarray(np.tile(prompt[:1], (8, 1)))
    dm8, pm8 = jnp.ones_like(d8), jnp.ones_like(p8)
    out, stats = spec8(params_bf16, d8, dm8, p8, pm8, jax.random.key(7))
    np.asarray(out.codes)
    t0 = time.perf_counter()
    out, stats = spec8(params_bf16, d8, dm8, p8, pm8, jax.random.key(7))
    np.asarray(out.codes)
    t = time.perf_counter() - t0
    cpf = float(stats.columns) / max(1, float(stats.forwards))
    results["trained_specfd_perrow_b8_w16"] = {
        "aggregate_rtfx": round(audio_s * 8 / t, 2),
        "cols_per_fwd_x_rows": round(cpf, 2),
    }
    print(f"[trim-large specfd B=8 W=16] {t:.3f}s -> "
          f"{results['trained_specfd_perrow_b8_w16']}", flush=True)


def main():
    from parler_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="AB", choices=["A", "B", "AB"])
    def _positive_int(s):
        v = int(s)
        if v < 1:
            raise argparse.ArgumentTypeError("--steps must be >= 1")
        return v

    ap.add_argument("--steps", type=_positive_int, default=150)
    args = ap.parse_args()

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ckpt_overfit")
    os.makedirs(out_dir, exist_ok=True)
    results_path = os.path.join(out_dir, "results.json")
    merged = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            merged = json.load(f)

    if "A" in args.part:
        a = {}
        part_a(a)
        merged["large_v1"] = a
    if "B" in args.part:
        b = {}
        part_b(b, args.steps)
        merged["large_v1_trimmed_trained"] = b

    with open(results_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {results_path}", flush=True)


if __name__ == "__main__":
    main()

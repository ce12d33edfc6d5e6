"""Batched-serving throughput frontier: aggregate RTFx over B x decode-mode.

The reference treats batching as a first-class serving recipe
(`/root/reference/INFERENCE.md:163-207`); this sweep measures where the
single-chip aggregate-throughput frontier actually is for this framework:

  python benchmarks/serving_frontier.py [--mode plain|spec] [--batches 1,8,32]
                                        [--max-length 860] [--profile B]
                                        [--window-map 8:16,16:8,32:4]

plain   — the bf16 XLA while_loop, batch rows advance in lockstep.
fd      — plain loop with the Pallas flash-decode kernel + flat cache.
spec    — per-row speculative decoding (runtime/speculative.py); each row
          keeps the B=1 acceptance rate. Window auto-shrinks with B via
          --window-map (verifying B*W columns per forward goes compute-bound
          as B grows — the two throughput levers trade against each other).
spec_fd — speculation COMPOSED with the flash-decode kernel: the W-column
          window forward runs the Pallas kernel (W*H block-diagonal query
          columns over one cache stream, per-column causal limits) instead
          of dense-XLA attention over all S_cache slots.

Per B: token-loop wall (median of 3), ms/step, per-stream and aggregate RTFx,
plus decode-loop achieved weight-stream GB/s (decoder bytes / step time — the
number to compare against the chip's HBM bandwidth to see how far from
speed-of-light the step is).

--profile B writes a jax.profiler trace of ~40 decode steps at that batch size
to /tmp/parler_profile_b{B} for inspecting fusion/copy behavior (e.g. whether
the KV-cache dynamic_update_slice aliases in place).

Run one process at a time on the shared chip.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build(max_length, mode):
    from __graft_entry__ import _flagship_config
    from parler_tts_tpu.config import GenerationConfig
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.utils.dtypes import cast_floating

    cfg = _flagship_config()
    gen = GenerationConfig(
        max_length=max_length, min_new_tokens=max_length, do_sample=True,
        temperature=1.0, bos_token_id=cfg.decoder.bos_token_id,
        pad_token_id=cfg.decoder.pad_token_id,
        eos_token_id=cfg.decoder.eos_token_id,
        codebook_guard=cfg.audio_encoder.codebook_size,
    )
    model = ParlerTTS(
        cfg, dtype=jnp.bfloat16,
        use_flash_decode=mode in ("fd", "spec_fd"),
    )
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, cfg.decoder.num_codebooks), jnp.int32),
    )["params"]
    params = cast_floating(params, jnp.bfloat16)
    return model, params, gen


def decoder_param_bytes(params):
    """Bytes streamed from HBM per decode step (decoder + lm_heads; the
    text-encoder params are out of the loop)."""
    leaves = jax.tree.leaves(params["decoder"])
    return sum(x.size * x.dtype.itemsize for x in leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="plain",
                    choices=["plain", "fd", "spec", "spec_fd"])
    ap.add_argument("--batches", default="1,2,4,8,16,32")
    ap.add_argument("--max-length", type=int, default=860)
    ap.add_argument("--profile", type=int, default=0,
                    help="capture a trace at this batch size")
    ap.add_argument("--window-map", default="1:24,2:24,4:16,8:16,16:8,32:4,64:4")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from parler_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    model, params, gen = build(args.max_length, args.mode)
    frame_rate = 86
    k_cb = model.config.decoder.num_codebooks
    audio_s = (args.max_length - k_cb) / frame_rate
    wmap = dict(
        (int(k), int(v))
        for k, v in (kv.split(":") for kv in args.window_map.split(","))
    )
    p_bytes = decoder_param_bytes(params)

    rng = np.random.default_rng(0)
    desc1 = rng.integers(0, 32000, size=(1, 16)).astype(np.int32)
    prompt1 = rng.integers(0, 32000, size=(1, 8)).astype(np.int32)

    results = []
    for b in (int(x) for x in args.batches.split(",")):
        desc = jnp.asarray(np.tile(desc1, (b, 1)))
        dm = jnp.ones((b, 16), jnp.int32)
        prompt = jnp.asarray(np.tile(prompt1, (b, 1)))
        pm = jnp.ones((b, 8), jnp.int32)

        if args.mode in ("spec", "spec_fd"):
            from parler_tts_tpu.runtime.speculative import (
                make_generate_speculative,
            )

            w = wmap.get(b, 8)
            fn = make_generate_speculative(model, gen, window=w, per_row=b > 1)
        else:
            from parler_tts_tpu.runtime.generate import make_generate

            w = None
            fn = make_generate(model, gen)

        def run(seed):
            out = fn(params, desc, dm, prompt, pm, jax.random.key(seed))
            stats = None
            if args.mode in ("spec", "spec_fd"):
                out, stats = out
            np.asarray(out.codes)  # host sync
            return out, stats

        t0 = time.perf_counter()
        run(0)
        compile_s = time.perf_counter() - t0
        ts, stats = [], None
        for i in range(args.runs):
            t0 = time.perf_counter()
            _, stats = run(i + 1)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        n_fwd = (
            int(stats.forwards) if stats is not None else args.max_length
        )
        row = {
            "mode": args.mode, "batch": b, "window": w,
            "wall_s": round(med, 3),
            "ms_per_step": round(med / args.max_length * 1e3, 3),
            "ms_per_fwd": round(med / max(n_fwd, 1) * 1e3, 3),
            "rtfx_per_stream": round(audio_s / med, 2),
            "rtfx_aggregate": round(audio_s * b / med, 2),
            "weight_stream_gb_s": round(
                p_bytes * n_fwd / med / 1e9, 1
            ),
            "compile_s": round(compile_s, 1),
        }
        if stats is not None:
            row["cols_per_fwd_row"] = round(
                int(stats.columns) / max(1, int(stats.forwards)) / b, 2
            )
        results.append(row)
        print(json.dumps(row), flush=True)

        if args.profile == b:
            path = f"/tmp/parler_profile_{args.mode}_b{b}"
            with jax.profiler.trace(path):
                run(99)
            print(f"# trace written to {path}", file=sys.stderr, flush=True)

    best = max(results, key=lambda r: r["rtfx_aggregate"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()

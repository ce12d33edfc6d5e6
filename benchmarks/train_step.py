"""Training-step latency at recipe scale vs remat policy (single chip).

Usage: python benchmarks/train_step.py [none|dots] [T] [B] [mu_dtype] [loss_chunk] [microbatch_G] [attn_chunk]

The long-T recipe requires per-layer remat + chunked attention (see
training/README.md: dense attention thrashes at 53.7 s/step, chunked runs
127 ms/step at B=2/T=1024). Full remat recomputes every layer forward in the
backward (~1/3 extra FLOPs); the "dots" policy
(jax.checkpoint_policies.dots_with_no_batch_dims_saveable) saves matmul
outputs and recomputes only elementwise work — more HBM, fewer FLOPs. This
benchmark measures which side of the trade wins at a given (T, B).

Run ONE policy per process on the shared chip; let it exit cleanly.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.config import ParlerTTSConfig
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.training import TrainState, make_optimizer, make_train_step
    from parler_tts_tpu.training.train_state import Batch
    from parler_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    policy = sys.argv[1] if len(sys.argv) > 1 else "none"
    t_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mu_dtype = sys.argv[4] if len(sys.argv) > 4 else None
    if mu_dtype in ("none", "None", ""):
        mu_dtype = None
    loss_chunk = (int(sys.argv[5])
                  if len(sys.argv) > 5 and sys.argv[5] not in ("none", "None", "0")
                  else None)
    micro_g = int(sys.argv[6]) if len(sys.argv) > 6 else None
    if micro_g is not None and micro_g <= 1:
        micro_g = None
    # arg 7: chunk size (int), "dense" for the dense-attention baseline
    # (WARNING: ~420x slower at recipe T), or omitted/"none" -> default 512.
    attn_chunk = True  # -> chunked_attention default (512)
    if len(sys.argv) > 7 and not sys.argv[7].startswith("-"):
        a = sys.argv[7]
        if a == "dense":
            attn_chunk = False
        elif a not in ("none", "None", "0", ""):
            try:
                attn_chunk = int(a)
            except ValueError:
                raise SystemExit(
                    f"attn_chunk arg {a!r}: expected an int chunk size, "
                    "'dense', or 'none' (default chunked-512)"
                )
            if attn_chunk < 1:
                raise SystemExit("attn_chunk must be >= 1 (or 'dense')")

    cfg = ParlerTTSConfig()  # mini-v1 geometry + flan-t5-large encoder
    model = ParlerTTS(
        cfg, dtype=jnp.bfloat16, use_chunked_attention=attn_chunk,
        remat_layers=True,
        remat_policy=None if policy == "none" else policy,
    )
    k = jax.random.key(0)
    params = jax.jit(model.init)(
        k,
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, cfg.decoder.num_codebooks), jnp.int32),
    )["params"]
    tx = make_optimizer(learning_rate=1e-4, warmup_steps=10, mu_dtype=mu_dtype)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(
        model, tx, loss_chunk_size=loss_chunk, microbatch_steps=micro_g
    )

    rng = np.random.default_rng(0)
    k_cb = cfg.decoder.num_codebooks
    batch = Batch(
        input_ids=jnp.asarray(rng.integers(1, 30000, (b, 48)), jnp.int32),
        attention_mask=jnp.ones((b, 48), jnp.int32),
        prompt_input_ids=jnp.asarray(rng.integers(1, 30000, (b, 24)), jnp.int32),
        prompt_attention_mask=jnp.ones((b, 24), jnp.int32),
        labels=jnp.asarray(
            rng.integers(0, cfg.audio_encoder.codebook_size, (b, t_len, k_cb)),
            jnp.int32,
        ),
    )
    print(f"policy={policy} T={t_len} B={b} mu={mu_dtype} "
          f"loss_chunk={loss_chunk} microbatch={micro_g} attn_chunk={attn_chunk}",
          flush=True)
    t0 = time.perf_counter()
    state, m = step_fn(state, batch, jax.random.key(1))
    print(f"compile+step0: {time.perf_counter()-t0:.1f}s loss={float(m['loss']):.3f}",
          flush=True)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch, jax.random.key(2 + i))
        float(m["loss"])  # sync
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"step median: {med*1000:.1f} ms "
          f"(runs: {[f'{x*1000:.0f}' for x in times]})", flush=True)

    if "--profile" in sys.argv:
        # 2 steps under jax.profiler for the MFU-attribution table
        # (training/README.md); summarize with benchmarks/trace_summary.py
        path = f"/tmp/parler_train_trace_{policy}_t{t_len}_b{b}"
        with jax.profiler.trace(path):
            for i in range(2):
                state, m = step_fn(state, batch, jax.random.key(50 + i))
            float(m["loss"])
        print(f"# trace written to {path}", flush=True)

    # ---- achieved TFLOP/s and MFU (model-FLOPs method, remat-adjusted).
    # Matmul-participating params only (embedding gathers excluded); fwd =
    # 2*P*tokens, bwd = 4*P*tokens, full remat re-runs the fwd (+2), the
    # 'dots' policy recomputes only elementwise work (+0 matmul FLOPs).
    # Self-attention adds 4*T^2*D per layer fwd (causal halves it -> 2),
    # x3 for bwd (x4 full remat); cross/encoder terms analogous.
    def _matmul_params(tree, skip=("embed", "shared")):
        import jax as _jax

        total = 0
        for path, leaf in _jax.tree_util.tree_leaves_with_path(tree):
            name = _jax.tree_util.keystr(path).lower()
            if any(s in name for s in skip) or leaf.ndim < 2:
                continue
            total += leaf.size
        return total

    d = cfg.decoder
    p_dec = _matmul_params(params["decoder"])
    p_enc = _matmul_params(params["text_encoder"])
    s_desc = int(batch.input_ids.shape[1])
    remat_mult = {"none": 8, "dots": 6}[policy]  # of fwd-equivalents x 2P
    flops = remat_mult * p_dec * b * t_len
    # decoder self-attention (causal): 2*T^2*D fwd per layer
    attn_fwd = 2 * d.num_hidden_layers * b * t_len * t_len * d.hidden_size
    flops += (remat_mult / 2) * attn_fwd
    # frozen text encoder still runs fwd+bwd through the graph
    flops += 6 * p_enc * b * s_desc
    if micro_g:
        pass  # same math; the scan re-runs per micro-batch over B/G rows
    tflops = flops / med / 1e12
    dev = jax.devices()[0]
    peak = 197.0 if "v5 lite" in str(dev.device_kind).lower() else None
    mfu = f" mfu={tflops / peak * 100:.1f}%" if peak else ""
    print(
        f"achieved: {tflops:.1f} TFLOP/s{mfu} "
        f"(P_dec={p_dec/1e6:.0f}M matmul-params, remat_mult={remat_mult})",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Tensor-parallel decode scaling artifact (virtual CPU mesh).

The B=1 decode step is weight-bandwidth-bound, so TP-N cuts the per-chip
weight bytes streamed per step ~N-fold (INFERENCE.md "Serving large models").
Real multi-chip hardware is not available in this environment; this benchmark
backs the claim with two machine-checked artifacts instead:

  1. per-chip WEIGHT BYTES under the TP partition rules (parallel/mesh.py) at
     n_model in {1, 2, 4} for mini-v1 and large-v1 — computed from abstract
     shapes (no 2.3B-param materialization) exactly as GSPMD shards them;
  2. a real partitioned EXECUTION: greedy TP decode on the virtual mesh is
     token-identical to single-device decode, and the addressable shard bytes
     per device match the analytic count.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/tp_decode.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analytic_weight_bytes(cfg, n_model, bytes_per_el=2):
    """Per-chip weight bytes STREAMED PER DECODE STEP under the TP rules at
    TP=n_model: the decoder stack + LM heads only (params["decoder"]). The
    frozen T5 encoder, prompt embeddings, and enc_to_dec projection run once
    at prefill and are excluded — including them would overstate bytes/chip
    and understate the TP scaling ratio."""
    import jax.numpy as jnp

    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.parallel.mesh import make_mesh, params_shardings

    model = ParlerTTS(cfg)
    abstract = jax.eval_shape(
        lambda k: model.init(
            k,
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
            jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
            jnp.zeros((1, 2, cfg.decoder.num_codebooks), jnp.int32),
        )["params"],
        jax.random.key(0),
    )
    mesh = make_mesh(n_data=1, n_model=n_model,
                     devices=jax.devices()[:n_model])
    shardings = params_shardings(abstract, mesh)

    total = 0
    for leaf, sh in zip(jax.tree.leaves(abstract["decoder"]),
                        jax.tree.leaves(shardings["decoder"])):
        spec = sh.spec
        denom = 1
        for i, axis in enumerate(spec):
            if axis is not None:
                denom *= mesh.shape[axis]
        total += leaf.size // denom * bytes_per_el
    return total


def main():
    from parler_tts_tpu.config import (
        ParlerTTSConfig, large_v1_decoder_config, mini_v1_decoder_config,
    )

    print("per-chip decoder+heads weight bytes/step (bf16) under TP:")
    print(f"{'config':>10} {'TP=1':>12} {'TP=2':>12} {'TP=4':>12}")
    for name, dcfg in [("mini-v1", mini_v1_decoder_config()),
                       ("large-v1", large_v1_decoder_config())]:
        cfg = ParlerTTSConfig(decoder=dcfg)
        row = [analytic_weight_bytes(cfg, n) for n in (1, 2, 4)]
        print(f"{name:>10} " + " ".join(f"{b/2**20:>10.1f}Mi" for b in row)
              + f"   (TP-4 = {row[0]/row[2]:.2f}x fewer bytes/chip)")

    # ---- real partitioned execution at test scale
    from parler_tts_tpu.config import (
        DACConfig, DecoderConfig, GenerationConfig, T5Config,
    )
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.parallel import make_mesh, shard_params
    from parler_tts_tpu.runtime.generate import make_generate

    PAD, BOS = 88, 89
    cfg = ParlerTTSConfig(
        text_encoder=T5Config(vocab_size=120, d_model=48, d_kv=12, d_ff=96,
                              num_layers=2, num_heads=4, dropout_rate=0.0),
        audio_encoder=DACConfig(num_codebooks=4, codebook_size=PAD),
        decoder=DecoderConfig(
            vocab_size=100, hidden_size=256, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=512, num_codebooks=4,
            max_position_embeddings=256, pad_token_id=PAD, bos_token_id=BOS,
            eos_token_id=PAD, dropout=0.0,
        ),
        vocab_size=256, pad_token_id=PAD, decoder_start_token_id=BOS,
    )
    model = ParlerTTS(cfg)
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    gen = GenerationConfig(max_length=16, min_new_tokens=4, do_sample=False,
                           bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD)
    rng = np.random.default_rng(0)
    d = rng.integers(0, 120, (2, 6)).astype(np.int32)
    p = rng.integers(0, 256, (2, 4)).astype(np.int32)
    dm, pm = np.ones_like(d), np.ones_like(p)

    ref = make_generate(model, gen)(params, d, dm, p, pm, jax.random.key(0))
    for n_model in (2, 4):
        mesh = make_mesh(n_data=1, n_model=n_model,
                         devices=jax.devices()[:n_model])
        sp = shard_params(params, mesh)
        out = make_generate(model, gen, mesh=mesh)(
            sp, d, dm, p, pm, jax.random.key(0)
        )
        assert np.array_equal(np.asarray(out.codes), np.asarray(ref.codes)), (
            f"TP={n_model} tokens diverged"
        )
        fc1 = sp["decoder"]["decoder"]["layers_0"]["fc1"]["kernel"]
        shard_elems = {int(np.prod(s.data.shape)) for s in fc1.addressable_shards}
        assert shard_elems == {fc1.size // n_model}, shard_elems
        print(f"TP={n_model}: token-identical decode; fc1 shard = "
              f"1/{n_model} of the full kernel on each chip")
    print("OK")


if __name__ == "__main__":
    main()

"""Mesh-sharded batched generation on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from parler_tts_tpu.config import GenerationConfig
from parler_tts_tpu.models.parler import ParlerTTS
from parler_tts_tpu.parallel import make_mesh, shard_params
from parler_tts_tpu.runtime.generate import make_generate
from parler_tts_tpu.training import make_optimizer

from test_training_step import init_state, tiny_config

PAD, BOS = 88, 89


def test_sharded_generation_matches_single_device():
    assert len(jax.devices()) == 8
    cfg = tiny_config()
    model = ParlerTTS(cfg)
    params = init_state(model, make_optimizer()).params
    gen = GenerationConfig(
        max_length=16, min_new_tokens=4, do_sample=False,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    rng = np.random.default_rng(0)
    b = 8  # one utterance per device
    desc = rng.integers(0, 120, (b, 9)).astype(np.int32)
    dm = np.ones((b, 9), np.int32)
    prompt = rng.integers(0, 256, (b, 5)).astype(np.int32)
    pm = np.ones((b, 5), np.int32)

    single = make_generate(model, gen)(
        params, desc, dm, prompt, pm, jax.random.key(0)
    )

    mesh = make_mesh(n_data=8, n_model=1)
    sharded_params = shard_params(params, mesh)
    out = make_generate(model, gen, mesh=mesh)(
        sharded_params, desc, dm, prompt, pm, jax.random.key(0)
    )
    # batch really sharded over 'data'
    assert len(out.codes.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out.delayed_ids), np.asarray(single.delayed_ids))


def test_sharded_generation_with_model_parallel():
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = tiny_config()
    model = ParlerTTS(cfg)
    params = shard_params(init_state(model, make_optimizer()).params, mesh)
    gen = GenerationConfig(
        max_length=12, do_sample=True, temperature=0.8,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    rng = np.random.default_rng(1)
    desc = rng.integers(0, 120, (4, 8)).astype(np.int32)
    prompt = rng.integers(0, 256, (4, 4)).astype(np.int32)
    out = make_generate(model, gen, mesh=mesh)(
        params, desc, np.ones((4, 8), np.int32), prompt, np.ones((4, 4), np.int32),
        jax.random.key(2),
    )
    assert out.codes.shape == (4, 4, 8)
    assert np.isfinite(np.asarray(out.lengths)).all()


def test_tensor_parallel_speculative_decode_matches_single_device():
    """TP x SPECULATIVE composition — the two large-model latency levers
    multiply (TP-N divides per-chip weight bytes per forward, the window
    divides the number of forwards). Greedy speculative TP decode must be
    token-identical to the single-device plain AR loop."""
    from parler_tts_tpu.runtime.speculative import make_generate_speculative

    cfg = tiny_config()
    model = ParlerTTS(cfg)
    params = init_state(model, make_optimizer()).params
    gen = GenerationConfig(
        max_length=16, min_new_tokens=6, do_sample=False,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    rng = np.random.default_rng(5)
    desc = rng.integers(0, 120, (1, 9)).astype(np.int32)
    dm = np.ones((1, 9), np.int32)
    prompt = rng.integers(0, 256, (1, 5)).astype(np.int32)
    pm = np.ones((1, 5), np.int32)

    single = make_generate(model, gen)(params, desc, dm, prompt, pm,
                                       jax.random.key(6))

    for n_model in (2, 4):
        mesh = make_mesh(n_data=1, n_model=n_model,
                         devices=jax.devices()[:n_model])
        sharded = shard_params(params, mesh)
        out, stats = make_generate_speculative(model, gen, window=4,
                                               mesh=mesh)(
            sharded, desc, dm, prompt, pm, jax.random.key(6)
        )
        np.testing.assert_array_equal(
            np.asarray(out.delayed_ids), np.asarray(single.delayed_ids),
            err_msg=f"n_model={n_model}",
        )
        # speculation actually engaged under TP: fewer forwards than columns
        assert int(stats.forwards) < int(stats.columns)


def test_tensor_parallel_per_row_speculative_matches_single_device():
    """Per-row speculation x TP: each batch row keeps its own column pointer
    and KV write offset (a vmapped DUS scatter) while attention heads are
    sharded over 'model' — the scatter must lower correctly on the sharded
    cache. Greedy per-row speculative TP decode must be token-identical to
    the single-device plain AR loop for every row."""
    from parler_tts_tpu.runtime.speculative import make_generate_speculative

    cfg = tiny_config()
    model = ParlerTTS(cfg)
    params = init_state(model, make_optimizer()).params
    gen = GenerationConfig(
        max_length=16, min_new_tokens=4, do_sample=False,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    rng = np.random.default_rng(7)
    b = 3
    desc = rng.integers(0, 120, (b, 9)).astype(np.int32)
    dm = np.ones((b, 9), np.int32)
    prompt = rng.integers(0, 256, (b, 5)).astype(np.int32)
    pm = np.ones((b, 5), np.int32)

    single = make_generate(model, gen)(params, desc, dm, prompt, pm,
                                       jax.random.key(8))

    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)
    out, stats = make_generate_speculative(
        model, gen, window=4, per_row=True, mesh=mesh
    )(sharded, desc, dm, prompt, pm, jax.random.key(8))
    np.testing.assert_array_equal(
        np.asarray(out.delayed_ids), np.asarray(single.delayed_ids)
    )
    assert int(stats.forwards) < int(stats.columns)


def test_tensor_parallel_b1_decode_matches_single_device():
    """Pure TP serving at B=1 — the large-model latency path (README: large-v1
    is 2.3B): decoder weights sharded over all 8 'model' devices, batch
    replicated. Greedy tokens must match the single-device program exactly;
    XLA inserts the TP collectives (psum on out/fc2 rows) automatically."""
    cfg = tiny_config()
    model = ParlerTTS(cfg)
    params = init_state(model, make_optimizer()).params
    gen = GenerationConfig(
        max_length=16, min_new_tokens=6, do_sample=False,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    rng = np.random.default_rng(3)
    desc = rng.integers(0, 120, (1, 9)).astype(np.int32)
    dm = np.ones((1, 9), np.int32)
    prompt = rng.integers(0, 256, (1, 5)).astype(np.int32)
    pm = np.ones((1, 5), np.int32)

    single = make_generate(model, gen)(params, desc, dm, prompt, pm, jax.random.key(4))

    for n_model in (2, 8):
        # pure TP: a (1, n_model) mesh — batch axis unsharded (B=1 can't split)
        mesh = make_mesh(n_data=1, n_model=n_model,
                         devices=jax.devices()[:n_model])
        sharded = shard_params(params, mesh)
        out = make_generate(model, gen, mesh=mesh)(
            sharded, desc, dm, prompt, pm, jax.random.key(4)
        )
        np.testing.assert_array_equal(
            np.asarray(out.delayed_ids), np.asarray(single.delayed_ids),
            err_msg=f"n_model={n_model}",
        )

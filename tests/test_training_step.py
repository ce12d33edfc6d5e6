"""Sharded train step on a virtual 8-device CPU mesh (SURVEY.md §4 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.config import (
    DACConfig,
    DecoderConfig,
    ParlerTTSConfig,
    T5Config,
)
from parler_tts_tpu.models.parler import ParlerTTS
from parler_tts_tpu.parallel import make_mesh, shard_params
from parler_tts_tpu.training import (
    Batch,
    TrainState,
    make_optimizer,
    make_train_step,
    shard_train_state,
)

PAD, BOS = 88, 89


def tiny_config(**kw):
    return ParlerTTSConfig(
        text_encoder=T5Config(
            vocab_size=120, d_model=48, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=20,
            dropout_rate=0.0,
        ),
        audio_encoder=DACConfig(num_codebooks=4, codebook_size=PAD),
        decoder=DecoderConfig(
            vocab_size=100, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=128, num_codebooks=4, max_position_embeddings=128,
            pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD, dropout=0.1,
        ),
        vocab_size=256,
        pad_token_id=PAD,
        decoder_start_token_id=BOS,
        **kw,
    )


def make_batch(b=8, s_desc=9, s_p=5, t=12, k=4, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, PAD, size=(b, t, k)).astype(np.int32)
    labels[:, -2:, :] = -100  # padded label tail
    return Batch(
        input_ids=jnp.asarray(rng.integers(0, 120, size=(b, s_desc)), jnp.int32),
        attention_mask=jnp.ones((b, s_desc), jnp.int32),
        prompt_input_ids=jnp.asarray(rng.integers(0, 256, size=(b, s_p)), jnp.int32),
        prompt_attention_mask=jnp.ones((b, s_p), jnp.int32),
        labels=jnp.asarray(labels),
    )


def init_state(model, tx, seed=0):
    params = model.init(
        jax.random.key(seed),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, model.config.decoder.num_codebooks), jnp.int32),
    )["params"]
    return TrainState.create(params, tx)


def test_train_step_runs_and_loss_decreases():
    model = ParlerTTS(tiny_config())
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2, freeze_text_encoder=True)
    state = init_state(model, tx)
    step = make_train_step(model, tx)
    batch = make_batch()
    rng = jax.random.key(0)

    losses = []
    for i in range(8):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, batch, r)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    assert metrics["per_codebook_loss"].shape == (4,)
    assert int(state.step) == 8


def test_frozen_text_encoder_unchanged():
    model = ParlerTTS(tiny_config())
    tx = make_optimizer(learning_rate=1e-2, warmup_steps=1, freeze_text_encoder=True)
    state = init_state(model, tx)
    before = jax.tree.map(np.asarray, state.params["text_encoder"])
    dec_before = np.asarray(
        state.params["decoder"]["decoder"]["layers_0"]["fc1"]["kernel"]
    )
    step = make_train_step(model, tx)
    # two steps: the first runs at lr=0 (warmup ramp starts at zero)
    state, _ = step(state, make_batch(), jax.random.key(1))
    state, _ = step(state, make_batch(seed=9), jax.random.key(2))
    after = state.params["text_encoder"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        before, after,
    )
    assert not np.array_equal(
        dec_before,
        np.asarray(state.params["decoder"]["decoder"]["layers_0"]["fc1"]["kernel"]),
    )


@pytest.mark.parametrize("n_model", [1, 2])
def test_sharded_train_step_matches_single_device(n_model):
    """DP(+TP) over the 8-CPU mesh must produce the same loss trajectory as the
    unsharded step — the psum'd global normalization is the invariant."""
    assert len(jax.devices()) == 8
    model = ParlerTTS(tiny_config())
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2, freeze_text_encoder=False)

    # single device
    state1 = init_state(model, tx, seed=3)
    step1 = make_train_step(model, tx)

    # sharded
    mesh = make_mesh(n_model=n_model)
    state2 = shard_train_state(init_state(model, tx, seed=3), mesh)
    step2 = make_train_step(model, tx, mesh=mesh)

    batch = make_batch(b=8, seed=4)
    rng = jax.random.key(5)
    for i in range(3):
        rng, r = jax.random.split(rng)
        state1, m1 = step1(state1, batch, r)
        state2, m2 = step2(state2, batch, r)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=2e-3
        )
    assert int(m2["num_items"]) == int(m1["num_items"])

    # params stay in sync
    p1 = jax.tree.leaves(state1.params)
    p2 = jax.tree.leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_sequence_parallel_train_step_matches_single_device():
    """DP x SP x TP (2x2x2 over the 8-CPU mesh): the label T axis is sharded
    over 'seq' and the loss trajectory must match the unsharded step — SPMD
    correctness of the sequence-parallel layout (the efficiency story is
    GSPMD-inserted attention collectives; the invariant here is exactness)."""
    assert len(jax.devices()) == 8
    model = ParlerTTS(tiny_config())
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2, freeze_text_encoder=False)

    state1 = init_state(model, tx, seed=3)
    step1 = make_train_step(model, tx)

    mesh = make_mesh(n_data=2, n_seq=2, n_model=2)
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    state2 = shard_train_state(init_state(model, tx, seed=3), mesh)
    step2 = make_train_step(model, tx, mesh=mesh)

    batch = make_batch(b=8, seed=4)
    # the input sharding actually splits T over 'seq'
    import jax.sharding as shd

    labels = jax.device_put(
        batch.labels, shd.NamedSharding(mesh, shd.PartitionSpec("data", "seq"))
    )
    t = batch.labels.shape[1]
    assert {s.data.shape[1] for s in labels.addressable_shards} == {t // 2}

    rng = jax.random.key(5)
    for i in range(3):
        rng, r = jax.random.split(rng)
        state1, m1 = step1(state1, batch, r)
        state2, m2 = step2(state2, batch, r)
        # loss + grad_norm per step are the exactness invariants: any SPMD bug
        # (missing psum, wrong normalization, mask misalignment) shows up here
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=2e-3
        )
    assert int(m2["num_items"]) == int(m1["num_items"])
    # Params tolerate Adam noise amplification: resharding the T axis changes
    # fp32 reduction order; on near-zero-second-moment elements the update
    # m/sqrt(v) is O(1)-sensitive to that noise, so divergence grows at
    # O(lr * steps) even when every per-step loss/grad agrees (observed up to
    # 1.5e-3 after 3 steps at lr=1e-3). Bound at the update scale.
    lr, steps = 1e-3, 3
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2 * lr * steps
        )


def test_param_sharding_actually_shards():
    mesh = make_mesh(n_model=2)
    model = ParlerTTS(tiny_config())
    tx = make_optimizer()
    state = init_state(model, tx)
    sharded = shard_params(state.params, mesh)
    fc1 = sharded["decoder"]["decoder"]["layers_0"]["fc1"]["kernel"]
    # fc1 (64, 128) sharded over model axis on dim 1 -> shard shape (64, 64)
    shard_shapes = {s.data.shape for s in fc1.addressable_shards}
    assert shard_shapes == {(64, 64)}


def test_fsdp_sharded_train_step_matches_single_device():
    """FSDP param+moment sharding over 'data' (ZeRO-3 via GSPMD) reproduces the
    unsharded loss trajectory and actually shards large params."""
    mesh = make_mesh(n_model=1)
    model = ParlerTTS(tiny_config())
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2, freeze_text_encoder=False)

    state1 = init_state(model, tx, seed=7)
    step1 = make_train_step(model, tx)

    state2 = shard_train_state(init_state(model, tx, seed=7), mesh, fsdp=True)
    step2 = make_train_step(model, tx, mesh=mesh)

    # fc1 kernel (64, 128): a free divisible dim sharded 8-way over data
    fc1 = state2.params["decoder"]["decoder"]["layers_0"]["fc1"]["kernel"]
    assert {s.data.shape for s in fc1.addressable_shards} == {(8, 128)}  # dim0 sharded 8-way

    batch = make_batch(b=8, seed=8)
    rng = jax.random.key(9)
    for i in range(2):
        rng, r = jax.random.split(rng)
        state1, m1 = step1(state1, batch, r)
        state2, m2 = step2(state2, batch, r)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def _dropout_free(cfg):
    import dataclasses

    return dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, dropout=0.0)
    )


def test_microbatch_accumulation_matches_full_batch():
    """make_train_step(microbatch_steps=G) reproduces the fused full-batch
    step exactly (dropout off, so the only difference is fp32 summation
    order): same loss/num_items/per-codebook metrics and same updated params.
    This is the reference's grad-accumulation-correct normalization
    (run_parler_tts_training.py:916-918, 1034-1046) — micro-batch gradient
    SUMS divide by the GLOBAL valid-token count, not per-micro-batch counts."""
    model = ParlerTTS(_dropout_free(tiny_config()))
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2, freeze_text_encoder=True)
    batch = make_batch(b=8, seed=11)
    rng = jax.random.key(13)

    state1 = init_state(model, tx, seed=5)
    state2 = init_state(model, tx, seed=5)
    full = make_train_step(model, tx)
    micro = make_train_step(model, tx, microbatch_steps=4)

    for i in range(3):
        rng, r = jax.random.split(rng)
        state1, m1 = full(state1, batch, r)
        state2, m2 = micro(state2, batch, r)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
        )
        assert int(m1["num_items"]) == int(m2["num_items"])
        np.testing.assert_allclose(
            np.asarray(m1["per_codebook_loss"]),
            np.asarray(m2["per_codebook_loss"]),
            rtol=1e-5,
        )
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    assert int(state2.step) == 3


def test_microbatch_accumulation_composes_with_chunked_loss_and_mesh():
    """microbatch_steps x loss_chunk_size x DP mesh: the scan's micro-batches
    stay 'data'-sharded and the psum'd global normalization still matches the
    single-device fused step."""
    assert len(jax.devices()) == 8
    model = ParlerTTS(_dropout_free(tiny_config()))
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2, freeze_text_encoder=False)

    state1 = init_state(model, tx, seed=6)
    step1 = make_train_step(model, tx)

    mesh = make_mesh(n_model=1)
    state2 = shard_train_state(init_state(model, tx, seed=6), mesh)
    step2 = make_train_step(
        model, tx, mesh=mesh, loss_chunk_size=5, microbatch_steps=2
    )

    batch = make_batch(b=16, seed=12)
    rng = jax.random.key(14)
    for i in range(2):
        rng, r = jax.random.split(rng)
        state1, m1 = step1(state1, batch, r)
        state2, m2 = step2(state2, batch, r)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
        assert int(m1["num_items"]) == int(m2["num_items"])
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_microbatch_dropout_draws_fresh_rng_per_microbatch():
    """With dropout ON, the G micro-batches must not reuse one dropout
    pattern: a micro step and a fused step diverge (different draws), but
    both stay finite and train."""
    model = ParlerTTS(tiny_config())  # decoder dropout 0.1
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=1, freeze_text_encoder=True)
    state = init_state(model, tx, seed=8)
    micro = make_train_step(model, tx, microbatch_steps=2)
    batch = make_batch(b=8, seed=15)
    state, m = micro(state, batch, jax.random.key(16))
    assert np.isfinite(float(m["loss"]))
    # not-divisible batch fails loudly at trace time
    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(model, tx, microbatch_steps=3)(
            state, batch, jax.random.key(17)
        )


@pytest.mark.parametrize("policy", [None, "dots"])
def test_remat_policy_preserves_training_math(policy):
    """Per-layer remat (any policy) only trades memory for recompute — the
    loss and updated params must match the un-rematted step exactly (fp32,
    dropout handled by identical rng threading through the recompute)."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, dropout=0.0)
    )
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2)

    base = ParlerTTS(cfg, use_chunked_attention=True)
    remat = ParlerTTS(
        cfg, use_chunked_attention=True, remat_layers=True, remat_policy=policy
    )
    state1 = init_state(base, tx, seed=3)
    state2 = init_state(remat, tx, seed=3)
    step1 = make_train_step(base, tx)
    step2 = make_train_step(remat, tx)

    batch = make_batch(b=4, seed=4)
    r = jax.random.key(5)
    state1, m1 = step1(state1, batch, r)
    state2, m2 = step2(state2, batch, r)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_chunked_loss_train_step_matches_unchunked():
    """make_train_step(loss_chunk_size=N) reproduces the unchunked step: same
    loss, metrics, and updated params (the chunked fused-head CE is a memory
    layout change, not a math change)."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, dropout=0.0)
    )
    model = ParlerTTS(cfg)
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2)
    batch = make_batch(b=4, t=12, seed=11)
    r = jax.random.key(6)

    state1 = init_state(model, tx, seed=2)
    state2 = init_state(model, tx, seed=2)
    s1, m1 = make_train_step(model, tx)(state1, batch, r)
    s2, m2 = make_train_step(model, tx, loss_chunk_size=5)(state2, batch, r)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m1["per_codebook_loss"]), np.asarray(m2["per_codebook_loss"]),
        rtol=1e-6,
    )
    assert int(m1["num_items"]) == int(m2["num_items"])
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

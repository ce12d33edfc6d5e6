"""Training pipeline pieces: collators, label building, checkpoints, and an
end-to-end smoke train run (the reference's dummy-config strategy, SURVEY §4)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from parler_tts_tpu.models.parler import ParlerTTS
from parler_tts_tpu.training.arguments import (
    DataTrainingArguments,
    ModelArguments,
    TrainingArguments,
    parse_args,
)
from parler_tts_tpu.training.checkpoints import (
    get_last_checkpoint,
    parse_checkpoint_name,
    rotate_checkpoints,
    sorted_checkpoints,
)
from parler_tts_tpu.training.data import (
    DataCollatorEncodecWithPadding,
    DataCollatorParlerTTSWithPadding,
    convert_dataset_str_to_list,
)
from parler_tts_tpu.training.run_training import build_labels_from_codes, run_training

from test_training_step import tiny_config

PAD, BOS = 88, 89


def test_parler_collator_buckets_and_pads():
    coll = DataCollatorParlerTTSWithPadding(
        prompt_padding_side="left", pad_token_id=0, prompt_pad_token_id=0,
        token_bucket=8, label_bucket=16,
    )
    feats = [
        {"labels": np.ones((10, 4)), "input_ids": [1, 2, 3], "prompt_input_ids": [4, 5]},
        {"labels": np.ones((13, 4)), "input_ids": [1] * 7, "prompt_input_ids": [6]},
    ]
    batch = coll(feats)
    assert batch.labels.shape == (2, 16, 4)
    assert (batch.labels[0, 10:] == -100).all()
    assert batch.input_ids.shape == (2, 8)
    assert batch.prompt_input_ids.shape == (2, 8)
    # prompts left-padded
    assert batch.prompt_attention_mask[0, :6].sum() == 0
    assert batch.prompt_attention_mask[0, 6:].sum() == 2
    # descriptions right-padded
    assert batch.attention_mask[0, :3].sum() == 3


def test_encodec_collator_hop_alignment():
    coll = DataCollatorEncodecWithPadding(
        sampling_rate=16000, hop_length=320, max_length_seconds=2.0, bucket_seconds=0.5
    )
    feats = [
        {"audio": {"array": np.ones(5000, np.float32)}},
        {"audio": {"array": np.ones(7000, np.float32)}},
    ]
    out = coll(feats)
    assert out["input_values"].shape[0] == 2
    t = out["input_values"].shape[-1]
    assert t % 320 == 0 and t >= 7000
    np.testing.assert_array_equal(out["len_audio"], [5000, 7000])


def test_dataset_spec_parsing():
    specs = convert_dataset_str_to_list(
        "a+b", "c1+c2", metadata_dataset_names="m1+m2",
        splits="train+test", dataset_samples="3+1",
    )
    assert len(specs) == 2
    assert specs[0]["name"] == "a" and specs[0]["split"] == "train"
    assert specs[0]["prob"] == 0.75 and specs[1]["prob"] == 0.25
    with pytest.raises(ValueError):
        convert_dataset_str_to_list("a+b", "c1")


def test_build_labels_from_codes():
    codes = np.arange(12).reshape(3, 4).astype(np.int32)  # (K=3, T=4)
    labels = build_labels_from_codes(codes, BOS, PAD, max_length=64)
    assert labels.shape == (4 + 1 + 3, 3)
    # BOS lower triangle, shifted codes, EOS tail
    assert (labels[0] == BOS).all()
    assert labels[1, 0] == codes[0, 0]
    assert labels[2, 1] == codes[1, 0]
    assert (labels[-1, :2] == PAD).all()


def test_checkpoint_rotation(tmp_path):
    for step, epoch in [(10, 0), (20, 0), (30, 1), (40, 1)]:
        os.makedirs(tmp_path / f"checkpoint-{step}-epoch-{epoch}")
    assert sorted_checkpoints(str(tmp_path))[0] == "checkpoint-10-epoch-0"
    assert parse_checkpoint_name(get_last_checkpoint(str(tmp_path))) == (40, 1)
    rotate_checkpoints(str(tmp_path), save_total_limit=2)
    assert sorted_checkpoints(str(tmp_path)) == [
        "checkpoint-30-epoch-1", "checkpoint-40-epoch-1",
    ]


def test_parse_args_json_and_cli(tmp_path):
    import json

    blob = {"learning_rate": 0.001, "train_dataset_name": "x", "freeze_text_encoder": False,
            "output_dir": str(tmp_path)}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(blob))
    m, d, t = parse_args([str(p)])
    assert t.learning_rate == 0.001 and d.train_dataset_name == "x"
    assert m.freeze_text_encoder is False

    m2, d2, t2 = parse_args(
        ["--learning_rate", "0.01", "--num_train_epochs", "2", "--freeze_text_encoder", "true"]
    )
    assert t2.learning_rate == 0.01 and t2.num_train_epochs == 2.0
    assert m2.freeze_text_encoder is True


def test_end_to_end_smoke_training(tmp_path):
    """Tiny full train run: features -> loop -> checkpoint on disk -> resumable.
    The reference's dummy-config integration strategy (SURVEY §4)."""
    cfg = tiny_config()
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    feats = [
        {
            "labels": rng.integers(0, PAD, size=(12, 4)),
            "input_ids": list(rng.integers(0, 120, size=7)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(16)
    ]
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]

    margs = ModelArguments(freeze_text_encoder=True, max_length=32)
    dargs = DataTrainingArguments()
    targs = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1,
        gradient_accumulation_steps=1, learning_rate=1e-3, warmup_steps=2,
        max_steps=4, logging_steps=2, save_steps=2, eval_steps=100,
        report_to="none", mesh_model=1,
    )
    state, step = run_training(margs, dargs, targs, model, params, feats)
    assert step == 4
    last = get_last_checkpoint(str(tmp_path))
    assert last is not None and parse_checkpoint_name(last)[0] == 4

    # resume continues from the saved step
    targs2 = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1,
        gradient_accumulation_steps=1, learning_rate=1e-3, warmup_steps=2,
        max_steps=6, logging_steps=2, save_steps=100, eval_steps=100,
        report_to="none", mesh_model=1,
    )
    state2, step2 = run_training(margs, dargs, targs2, model, params, feats)
    assert step2 == 6
    assert int(state2.step) == 6


def test_run_eval_remainder_batch_row_weighted(tmp_path):
    """A small eval set must still yield a loss (remainder batch instead of a
    silent skip), and the reported loss must weight each batch mean by its
    ROW COUNT — a 2-row tail must not count as much as an 8-row batch."""
    from parler_tts_tpu.training import TrainState, make_optimizer
    from parler_tts_tpu.training.run_training import run_eval

    cfg = tiny_config()
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(7)
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    state = TrainState.create(params, make_optimizer())
    coll = DataCollatorParlerTTSWithPadding(
        prompt_padding_side="left", pad_token_id=0, prompt_pad_token_id=0,
        token_bucket=8, label_bucket=16,
    )
    feats = [
        {
            "labels": rng.integers(0, PAD, size=(int(t), 4)),
            "input_ids": list(rng.integers(0, 120, size=6)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for t in rng.integers(8, 14, size=10)
    ]
    targs = TrainingArguments(
        output_dir=str(tmp_path), per_device_eval_batch_size=1,
        report_to="none",
    )
    bs = 1 * jax.device_count()  # 8 under the virtual CPU mesh
    assert bs == 8

    full = run_eval(model, state, coll, feats[:8], targs, None, 0, 0)
    tail = run_eval(model, state, coll, feats[8:], targs, None, 0, 0)
    assert full is not None and tail is not None  # remainder-only set works
    combined = run_eval(model, state, coll, feats, targs, None, 0, 0)
    expected = (8 * full + 2 * tail) / 10
    assert abs(combined - expected) < 1e-6, (combined, expected)


def test_eval_generation_smoke(tmp_path):
    """run_eval_generation produces audio + logs without optional metric deps."""
    import jax
    from parler_tts_tpu.codec.dac_model import DACModel
    from parler_tts_tpu.config import DACConfig
    from parler_tts_tpu.training import TrainState, make_optimizer
    from parler_tts_tpu.training.run_training import run_eval_generation

    # tiny codec geometry so decode is fast on CPU
    cfg = tiny_config()
    dac_cfg = DACConfig(
        num_codebooks=4, codebook_size=PAD, codebook_dim=4, latent_dim=32,
        encoder_dim=4, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        sampling_rate=8000, frame_rate=1000,
    )
    cfg = dataclasses.replace(cfg, audio_encoder=dac_cfg)
    from parler_tts_tpu.models.parler import ParlerTTS

    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    state = TrainState.create(params, make_optimizer())
    dac = DACModel(dac_cfg)
    dac_params = dac.init(
        jax.random.key(1), np.zeros((1, dac_cfg.num_codebooks, 2), np.int32),
        method="decode",
    )["params"]

    feats = [
        {
            "labels": rng.integers(0, PAD, size=(10, 4)),
            "input_ids": list(rng.integers(0, 120, size=6)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(2)
    ]
    margs = ModelArguments(max_length=24, do_sample=False)
    targs = TrainingArguments(
        output_dir=str(tmp_path), compute_clap_similarity_metric=False,
        compute_noise_level_metric=False, report_to="none",
    )
    metrics = run_eval_generation(
        model, state, dac, dac_params, feats, margs, targs,
        tracker=None, step=1, epoch=0, max_samples=2,
    )
    assert isinstance(metrics, dict)


def test_training_dtype_flag_is_load_bearing(tmp_path):
    """`TrainingArguments.dtype` must be consumed (VERDICT r2: it silently did
    nothing): a bogus value fails fast, bf16 runs a real step, and the bf16
    loss tracks the fp32 loss at tolerance on the tiny config."""
    import jax

    cfg = tiny_config()
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    feats = [
        {
            "labels": rng.integers(0, PAD, size=(12, 4)),
            "input_ids": list(rng.integers(0, 120, size=7)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(8)
    ]
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    # the train step donates its state; keep params on host so each run
    # uploads a fresh copy instead of reusing donated buffers
    params = jax.tree.map(np.asarray, params)
    margs = ModelArguments(freeze_text_encoder=True, max_length=32)

    def targs(dtype, out):
        return TrainingArguments(
            output_dir=str(tmp_path / out), per_device_train_batch_size=1,
            gradient_accumulation_steps=1, learning_rate=0.0, warmup_steps=1,
            max_steps=1, logging_steps=1, save_steps=100, eval_steps=100,
            report_to="none", mesh_model=1, dtype=dtype,
            adam_mu_dtype="bfloat16" if dtype == "bfloat16" else None,
        )

    with pytest.raises(ValueError, match="dtype"):
        run_training(margs, DataTrainingArguments(), targs("int7", "bad"),
                     model, params, feats)

    # lr=0: params unchanged -> eval the LOSS parity directly via a step each
    from parler_tts_tpu.training import make_optimizer, make_train_step
    from parler_tts_tpu.training.run_training import data_iterator
    from parler_tts_tpu.training.data import DataCollatorParlerTTSWithPadding

    coll = DataCollatorParlerTTSWithPadding(label_bucket=16)
    batch = next(data_iterator(feats, coll, 4, seed=0, epoch=0))
    tx = make_optimizer(learning_rate=0.0, warmup_steps=1)
    from parler_tts_tpu.training import TrainState

    losses = {}
    for dtype_name, dt in [("float32", np.float32), ("bfloat16", None)]:
        import jax.numpy as jnp

        m = model.clone(dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32)
        st = TrainState.create(params, tx)
        _, metrics = make_train_step(m, tx)(st, jax.tree.map(np.asarray, batch),
                                            jax.random.key(1))
        losses[dtype_name] = float(metrics["loss"])
        assert np.isfinite(losses[dtype_name])
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.02 * abs(losses["float32"])

    # and the CLI-level run consumes it end to end
    state, step = run_training(margs, DataTrainingArguments(),
                               targs("bfloat16", "bf16"), model, params, feats)
    assert step == 1


def test_group_by_length_orders_batches():
    """`group_by_length=True` must actually reorder the epoch: per-batch padded
    label lengths come out sorted (descending) within the mega-batch, so
    similar-length rows share a bucket (reference LengthGroupedSampler wiring,
    run_parler_tts_training.py:994-1002)."""
    from parler_tts_tpu.training.data import DataCollatorParlerTTSWithPadding
    from parler_tts_tpu.training.run_training import data_iterator

    rng = np.random.default_rng(0)
    lengths = [30, 29, 28, 27, 20, 19, 18, 17, 10, 9, 8, 7]
    rng.shuffle(lengths)
    feats = [
        {
            "labels": np.ones((L, 4)),
            "input_ids": [1, 2, 3],
            "prompt_input_ids": [4, 5],
        }
        for L in lengths
    ]
    coll = DataCollatorParlerTTSWithPadding(label_bucket=8)
    grouped = [
        b.labels.shape[1]
        for b in data_iterator(feats, coll, 4, seed=1, epoch=0, group_by_length=True)
    ]
    assert grouped == sorted(grouped, reverse=True) and len(set(grouped)) == 3, grouped
    plain = [
        b.labels.shape[1]
        for b in data_iterator(feats, coll, 4, seed=1, epoch=0)
    ]
    assert sum(plain) > sum(grouped)  # grouping strictly reduces padding waste


def test_fsdp_flag_shards_state(tmp_path):
    """`TrainingArguments.fsdp=True` must reach shard_train_state: returned
    params are sharded over the 'data' axis (VERDICT r2: the flag was
    implemented but unreachable)."""
    import jax

    cfg = tiny_config()
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    feats = [
        {
            "labels": rng.integers(0, PAD, size=(12, 4)),
            "input_ids": list(rng.integers(0, 120, size=7)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(16)
    ]
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    margs = ModelArguments(freeze_text_encoder=True, max_length=32)
    targs = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1,
        gradient_accumulation_steps=1, learning_rate=1e-3, warmup_steps=1,
        max_steps=1, logging_steps=1, save_steps=100, eval_steps=100,
        report_to="none", mesh_model=1, fsdp=True, dtype="float32",
    )
    state, step = run_training(margs, DataTrainingArguments(), targs,
                               model, params, feats)
    assert step == 1
    fc1 = state.params["decoder"]["decoder"]["layers_0"]["fc1"]["kernel"]
    shard_shapes = {s.data.shape for s in fc1.addressable_shards}
    assert all(int(np.prod(s)) < fc1.size for s in shard_shapes), shard_shapes


def test_remat_policy_flag_is_load_bearing(tmp_path):
    """`TrainingArguments.remat_policy` must be consumed: a bogus value fails
    fast, and 'dots' trains a long-T step (the auto-enabled remat path) end to
    end."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, max_position_embeddings=600)
    )
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    feats = [
        {
            # T=513 crosses the >=512 threshold that auto-enables remat
            "labels": rng.integers(0, PAD, size=(513, 4)),
            "input_ids": list(rng.integers(0, 120, size=7)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(8)
    ]
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    margs = ModelArguments(freeze_text_encoder=True, max_length=560)

    def targs(policy, out):
        return TrainingArguments(
            output_dir=str(tmp_path / out), per_device_train_batch_size=1,
            gradient_accumulation_steps=1, learning_rate=1e-3, warmup_steps=1,
            max_steps=1, logging_steps=1, save_steps=100, eval_steps=100,
            report_to="none", mesh_model=1, dtype="float32",
            remat_policy=policy,
        )

    with pytest.raises(ValueError, match="remat_policy"):
        run_training(margs, DataTrainingArguments(), targs("chekhov", "bad"),
                     model, params, feats)

    state, step = run_training(margs, DataTrainingArguments(),
                               targs("dots", "dots"), model, params, feats)
    assert step == 1


def test_attention_impl_flag_is_load_bearing(tmp_path, monkeypatch):
    """`TrainingArguments.attention_impl` must be consumed: a bogus value fails
    fast, and 'pallas_flash' actually routes self-attention through the Pallas
    kernel during the training step (counted via the module entry point)."""
    cfg = tiny_config()
    model = ParlerTTS(cfg, use_chunked_attention=True)  # exercises the re-clone path
    rng = np.random.default_rng(0)
    feats = [
        {
            "labels": rng.integers(0, PAD, size=(12, 4)),
            "input_ids": list(rng.integers(0, 120, size=7)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(8)
    ]
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    margs = ModelArguments(freeze_text_encoder=True, max_length=32)

    def targs(impl, out):
        return TrainingArguments(
            output_dir=str(tmp_path / out), per_device_train_batch_size=1,
            gradient_accumulation_steps=1, learning_rate=1e-3, warmup_steps=1,
            max_steps=1, logging_steps=1, save_steps=100, eval_steps=100,
            report_to="none", mesh_model=1, dtype="float32",
            attention_impl=impl,
        )

    with pytest.raises(ValueError, match="attention_impl"):
        run_training(margs, DataTrainingArguments(), targs("flish", "bad"),
                     model, params, feats)

    # 'chunked:N' needs a POSITIVE int — 0 would silently select dense
    # attention downstream (the ~420x-slower path at recipe T)
    for bogus in ("chunked:0", "chunked:-4", "chunked:abc"):
        with pytest.raises(ValueError, match="attention_impl"):
            run_training(margs, DataTrainingArguments(), targs(bogus, "bad"),
                         model, params, feats)

    import parler_tts_tpu.ops.pallas.flash_attention as fa

    calls = {"n": 0}
    real = fa.flash_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention", counting)
    state, step = run_training(margs, DataTrainingArguments(),
                               targs("pallas_flash", "pf"), model, params, feats)
    assert step == 1
    assert calls["n"] >= cfg.decoder.num_hidden_layers  # once per layer at trace

"""End-to-end CLI test for the training entry point: dataset loading (mocked,
no network), duration/token filters, stage-1 codec encode, stage-2 train loop,
eval loss + eval generation, checkpoint on disk, HF export — the dummy-config
integration strategy (reference librispeech_tts_r_300M_dummy.json, SURVEY §4),
covering reference run_parler_tts_training.py:247-295 (eval split), :574-638
(filters), :1088-1099 (export)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from parler_tts_tpu.config import DACConfig, GenerationConfig
from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline

from test_training_step import tiny_config

PAD, BOS = 88, 89
SR = 8000


class FakeTokenizer:
    """Tokenizes to one id per character (deterministic, offline)."""

    def __call__(self, text):
        if isinstance(text, str):
            return {"input_ids": [ord(c) % 120 for c in text]}
        return {"input_ids": [[ord(c) % 120 for c in t] for t in text]}


class FakeDataset:
    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.rows[i]

    def select(self, idx):
        return FakeDataset([self.rows[i] for i in idx])


def _rows():
    rng = np.random.default_rng(0)
    rows = []
    for i in range(20):  # valid rows: 0.02 s of audio
        rows.append(
            {
                "audio": {"array": rng.normal(size=160).astype(np.float32) * 0.1},
                "description": f"a calm voice number {i}",
                "text": f"hello world {i}",
            }
        )
    # too short: filtered by min_duration_in_seconds
    rows.append(
        {
            "audio": {"array": np.zeros(8, np.float32)},
            "description": "too short",
            "text": "x",
        }
    )
    # description too long: filtered by max_description_token_length
    rows.append(
        {
            "audio": {"array": rng.normal(size=160).astype(np.float32) * 0.1},
            "description": "y" * 200,
            "text": "hello",
        }
    )
    return rows


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, monkeypatch):
    import transformers

    import parler_tts_tpu.training.data as data_mod
    from parler_tts_tpu.training.run_training import main

    # tiny checkpoint on disk (native layout)
    cfg = tiny_config()
    dac_cfg = DACConfig(
        num_codebooks=4, codebook_size=PAD, codebook_dim=4, latent_dim=32,
        encoder_dim=4, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        sampling_rate=SR, frame_rate=1000,
    )
    cfg = dataclasses.replace(cfg, audio_encoder=dac_cfg)
    gen = GenerationConfig(
        max_length=16, do_sample=False, bos_token_id=BOS, pad_token_id=PAD,
        eos_token_id=PAD,
    )
    ckpt = tmp_path / "init_ckpt"
    ParlerTTSPipeline.from_random(cfg, seed=0, generation_config=gen).save_pretrained(str(ckpt))

    train_rows, eval_rows = _rows(), _rows()[:10]
    calls = {}

    def fake_load_multiple_datasets(specs, sampling_rate, **kw):
        calls.setdefault("specs", []).append(specs)
        assert sampling_rate == SR
        return FakeDataset(train_rows if specs[0]["split"] == "train" else eval_rows)

    monkeypatch.setattr(data_mod, "load_multiple_datasets", fake_load_multiple_datasets)
    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()),
    )

    out_dir = tmp_path / "out"
    cfg_json = {
        "model_name_or_path": str(ckpt),
        "train_dataset_name": "fake/train",
        "train_dataset_config_name": "default",
        "train_split_name": "train",
        "eval_dataset_name": "fake/eval",
        "eval_dataset_config_name": "default",
        "eval_split_name": "eval",
        "max_eval_samples": 8,
        "min_duration_in_seconds": 0.01,
        "max_duration_in_seconds": 0.05,
        "max_description_token_length": 50,
        "output_dir": str(out_dir),
        "per_device_train_batch_size": 1,
        "per_device_eval_batch_size": 1,
        # exercise the reference-memory-semantics accumulation path end to
        # end: 2 micro-batches per optimizer step via the lax.scan step
        "gradient_accumulation_steps": 2,
        "gradient_accumulation_mode": "microbatch",
        "learning_rate": 1e-3,
        "warmup_steps": 1,
        "max_steps": 2,
        "num_train_epochs": 4,
        "logging_steps": 1,
        "save_steps": 2,
        "eval_steps": 2,
        "eval_generation_steps": 2,
        "max_length": 24,
        "do_sample": False,
        "compute_clap_similarity_metric": False,
        "compute_noise_level_metric": False,
        "report_to": "none",
        "audio_encoder_per_device_batch_size": 4,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_json))

    main([str(cfg_path)])

    # train loop ran and checkpointed
    from parler_tts_tpu.training.checkpoints import get_last_checkpoint, parse_checkpoint_name

    last = get_last_checkpoint(str(out_dir))
    assert last is not None and parse_checkpoint_name(last)[0] == 2
    # eval split was loaded through the same pipeline
    splits = [s[0]["split"] for s in calls["specs"]]
    assert splits == ["train", "eval"]
    # HF export written next to the checkpoints
    final = out_dir / "final"
    assert (final / "config.json").exists()
    assert (final / "model.safetensors").exists() or (final / "model.npz").exists()


def test_filters_drop_bad_rows(tmp_path, monkeypatch):
    """prepare_split drops rows outside the duration window and over the token
    caps (reference :574-638) without running the train loop
    (preprocessing_only)."""
    import pickle

    import transformers

    import parler_tts_tpu.training.data as data_mod
    from parler_tts_tpu.training.run_training import main

    cfg = tiny_config()
    dac_cfg = DACConfig(
        num_codebooks=4, codebook_size=PAD, codebook_dim=4, latent_dim=32,
        encoder_dim=4, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        sampling_rate=SR, frame_rate=1000,
    )
    cfg = dataclasses.replace(cfg, audio_encoder=dac_cfg)
    ckpt = tmp_path / "init_ckpt"
    ParlerTTSPipeline.from_random(cfg, seed=0).save_pretrained(str(ckpt))

    monkeypatch.setattr(
        data_mod, "load_multiple_datasets",
        lambda specs, sampling_rate, **kw: FakeDataset(_rows()),
    )
    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()),
    )

    save_dir = tmp_path / "features"
    main([
        "--model_name_or_path", str(ckpt),
        "--train_dataset_name", "fake/train",
        "--train_dataset_config_name", "default",
        "--min_duration_in_seconds", "0.01",
        "--max_duration_in_seconds", "0.05",
        "--max_description_token_length", "50",
        "--preprocessing_only", "true",
        "--save_to_disk", str(save_dir),
        "--output_dir", str(tmp_path / "out"),
        "--do_eval", "false",
        "--max_length", "24",
        "--report_to", "none",
    ])
    with open(save_dir / "features.pkl", "rb") as f:
        blob = pickle.load(f)
    feats = blob["train"]
    assert len(feats) == 20  # 22 rows - 1 too-short - 1 over-long description
    assert all(len(f["input_ids"]) <= 50 for f in feats)
    assert all("description_text" in f and "prompt_text" in f for f in feats)

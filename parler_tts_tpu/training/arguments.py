"""Training argument system.

Mirrors the reference's three dataclasses parsed from CLI or a single JSON file
(`/root/reference/training/arguments.py:8-375`,
`run_parler_tts_training.py:78-84`), trimmed to the fields that drive behavior
in the TPU pipeline. Parsing accepts either `--flag value` pairs or one
positional path to a JSON file whose keys are the dataclass field names.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from dataclasses import dataclass, field, fields
from typing import List, Optional


@dataclass
class ModelArguments:
    """Reference `training/arguments.py:8-96`."""

    model_name_or_path: str = ""
    config_name: Optional[str] = None
    feature_extractor_name: Optional[str] = None
    description_tokenizer_name: Optional[str] = None
    prompt_tokenizer_name: Optional[str] = None
    use_fast_tokenizer: bool = True
    freeze_text_encoder: bool = True
    do_sample: bool = True
    temperature: float = 1.0
    max_length: int = 2580
    pad_token_id: Optional[int] = None
    decoder_start_token_id: Optional[int] = None
    asr_model_name_or_path: str = "distil-whisper/distil-large-v2"
    clap_model_name_or_path: str = "laion/larger_clap_music_and_speech"
    prompt_padding_side: str = "left"


@dataclass
class DataTrainingArguments:
    """Reference `training/arguments.py:100-316` ("+"-separated multi-dataset specs)."""

    train_dataset_name: str = ""
    train_dataset_config_name: str = ""
    train_split_name: str = "train"
    train_metadata_dataset_name: Optional[str] = None
    train_dataset_samples: Optional[str] = None
    eval_dataset_name: Optional[str] = None
    eval_dataset_config_name: Optional[str] = None
    eval_split_name: str = "test"
    eval_metadata_dataset_name: Optional[str] = None
    target_audio_column_name: str = "audio"
    description_column_name: str = "description"
    prompt_column_name: str = "text"
    id_column_name: Optional[str] = None
    max_duration_in_seconds: float = 35.0
    min_duration_in_seconds: float = 0.0
    max_text_length: int = 500
    max_prompt_token_length: Optional[int] = None
    max_description_token_length: Optional[int] = None
    max_train_samples: Optional[int] = None
    max_eval_samples: Optional[int] = None
    # lazy-load datasets (reference arguments.py `streaming` intent; its own
    # training script leaves it TODO at run_parler_tts_training.py:263). Here
    # the flag is live: splits load as IterableDatasets (probability-weighted
    # interleave across "+"-specs) and the first max_*_samples rows are drawn
    # without downloading/decoding the full corpus — so max_train_samples /
    # max_eval_samples are REQUIRED with streaming.
    streaming: bool = False
    preprocessing_num_workers: Optional[int] = None
    preprocessing_only: bool = False
    save_to_disk: Optional[str] = None
    temporary_save_to_disk: Optional[str] = None
    save_codec_steps: Optional[int] = 500
    pad_to_max_length: bool = False
    add_audio_samples_to_wandb: bool = False
    wandb_project: str = "parler-tts-tpu"
    wandb_run_name: Optional[str] = None


@dataclass
class TrainingArguments:
    """Reference `ParlerTTSTrainingArguments` (`training/arguments.py:320-375`)
    + the Seq2SeqTrainingArguments fields actually consumed by the loop."""

    output_dir: str = "./output"
    overwrite_output_dir: bool = False
    do_train: bool = True
    do_eval: bool = True
    per_device_train_batch_size: int = 6
    per_device_eval_batch_size: int = 6
    gradient_accumulation_steps: int = 4
    # "batch": the G accumulation micro-batches feed ONE fused pjit step
    #   (G multiplies the per-step batch; fastest whenever it fits — see the
    #   run_training module note). "microbatch": reference memory semantics
    #   (run_parler_tts_training.py:1039-1046) — a lax.scan runs G sequential
    #   forward+backward passes accumulating fp32 gradients, so peak
    #   activation memory is one micro-batch's. Gradients are identical
    #   either way (global valid-token normalization).
    gradient_accumulation_mode: str = "batch"
    learning_rate: float = 9.5e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    num_train_epochs: float = 4.0
    max_steps: int = -1
    lr_scheduler_type: str = "constant_with_warmup"
    warmup_steps: int = 20000
    logging_steps: int = 50
    save_steps: int = 5000
    eval_steps: int = 5000
    eval_generation_steps: Optional[int] = None
    save_total_limit: Optional[int] = 5
    seed: int = 42
    # compute dtype of the model's forward/backward (reference loads the whole
    # model in this dtype, run_parler_tts_training.py:90-95,116; the JAX mixed-
    # precision form keeps fp32 params + optimizer and casts activations):
    # "bfloat16" (recipe default, starting_point_v1.json) | "float32"
    dtype: str = "bfloat16"
    # store Adam's first moment in bf16 (halves optimizer HBM; JAX-native
    # analogue of the memory the reference recovers by keeping bf16 weights)
    adam_mu_dtype: Optional[str] = None
    # long-T training attention implementation: "chunked" (online-softmax
    # scan + jax.checkpoint, ops/chunked_attention.py) | "pallas_flash"
    # (flash-attention fwd+bwd kernels, ops/pallas/flash_attention.py — the
    # TPU-kernel analogue of the reference's flash_attn wheels,
    # modeling_parler_tts.py:600-814)
    attention_impl: str = "chunked"
    # per-layer remat policy once long-T auto-enables remat: "full" recomputes
    # every layer forward in the backward (min HBM); "dots" saves matmul
    # outputs and recomputes only elementwise work (measured ~4% faster at
    # mini-v1 scale when it fits — benchmarks/train_step.py)
    remat_policy: str = "full"
    # fuse LM heads + cross-entropy chunk-by-chunk over T (never materialize
    # the (B, K, T, V) logits — the largest single allocation of the long-T
    # step). None = off; 256 is a good chunk on v5e.
    loss_chunk_size: Optional[int] = None
    # batch rows by similar label length (reference wires transformers'
    # LengthGroupedSampler when group_by_length=True, :994-1002); on TPU this
    # also minimizes padding waste under the bucketing collator
    group_by_length: bool = False
    # shard params + optimizer state over the 'data' mesh axis (ZeRO-3-style;
    # TPU-native addition — the reference's DDP replicates the full state)
    fsdp: bool = False
    audio_encoder_per_device_batch_size: int = 8
    compute_clap_similarity_metric: bool = True
    compute_noise_level_metric: bool = True
    noise_level_to_compute_clean_wer: Optional[float] = 25.0
    codebook_weights: Optional[List[float]] = None
    resume_from_checkpoint: Optional[str] = None
    report_to: str = "wandb"
    push_to_hub: bool = False
    hub_model_id: Optional[str] = None
    # mesh layout (TPU-native addition; reference is DDP-only)
    mesh_data: Optional[int] = None
    mesh_model: int = 1


def parse_args(argv: Optional[List[str]] = None):
    """CLI flags OR one positional JSON file path (reference
    run_parler_tts_training.py:78-84)."""
    argv = list(sys.argv[1:] if argv is None else argv)
    classes = (ModelArguments, DataTrainingArguments, TrainingArguments)

    if len(argv) == 1 and argv[0].endswith(".json"):
        with open(argv[0]) as f:
            blob = json.load(f)
        out = []
        for cls in classes:
            names = {f.name for f in fields(cls)}
            out.append(cls(**{k: v for k, v in blob.items() if k in names}))
        return tuple(out)

    # --flag value parsing
    kv = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise ValueError(f"unexpected argument {tok}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            kv[key] = val
            i += 1
        else:
            kv[key] = argv[i + 1]
            i += 2

    def coerce(cls, raw):
        out = {}
        for f in fields(cls):
            if f.name not in raw:
                continue
            v = raw[f.name]
            t = f.type if isinstance(f.type, type) else None
            anno = str(f.type)
            if "bool" in anno:
                out[f.name] = str(v).lower() in ("1", "true", "yes")
            elif "int" in anno:
                out[f.name] = int(v)
            elif "float" in anno:
                out[f.name] = float(v)
            elif "List[float]" in anno:
                out[f.name] = [float(x) for x in str(v).split(",")]
            else:
                out[f.name] = v
        return cls(**out)

    return tuple(coerce(cls, kv) for cls in classes)


def dump_args(model_args, data_args, training_args, path: str):
    blob = {}
    for a in (model_args, data_args, training_args):
        blob.update(dataclasses.asdict(a))
    with open(path, "w") as f:
        json.dump(blob, f, indent=2)

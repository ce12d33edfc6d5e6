"""End-to-end training orchestrator.

TPU-native re-design of `/root/reference/training/run_parler_tts_training.py:73-1249`:

  stage 1 — offline DAC tokenization of the corpus (jitted codec encode over
            hop-aligned audio buckets, resumable shard checkpoints);
  stage 2 — pjit train loop over a ('data','model') mesh: AdamW + LR schedule,
            global token-count loss normalization via psum (≡ the reference's
            gathered `num_items_in_batch`), grad clipping, periodic logging,
            Orbax checkpoint save/rotate/resume, eval loss + generation metrics.

Grad accumulation note: the reference accumulates G micro-batches with
`no_sync` (run_parler_tts_training.py:1039-1046) because DDP steps are
latency-bound; on TPU the same global batch can simply feed one pjit step
(batch sharded over 'data'), which is faster whenever the fused step fits —
the default `gradient_accumulation_mode="batch"` multiplies the per-step
batch. When the G-fold batch does NOT fit (the reason accumulation exists),
`gradient_accumulation_mode="microbatch"` restores the reference's memory
semantics: a lax.scan of G sequential forward+backward passes accumulating
fp32 gradients (train_state.make_train_step(microbatch_steps=G)). The loss
normalization — and therefore the gradient — is identical either way because
it divides by the global valid-token count.
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Any, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.registry import build_codec
from ..config import GenerationConfig, ParlerTTSConfig
from ..models.parler import ParlerTTS
from ..ops.delay_pattern import build_delay_pattern_mask
from ..parallel.mesh import make_mesh
from ..runtime.pipeline import ParlerTTSPipeline
from ..utils.logging_utils import PhaseTimer, init_tracker, log_metric, log_pred
from .arguments import DataTrainingArguments, ModelArguments, TrainingArguments
from .checkpoints import (
    get_last_checkpoint,
    parse_checkpoint_name,
    restore_train_state,
    save_train_state,
)
from .data import DataCollatorParlerTTSWithPadding
from .train_state import Batch, TrainState, make_optimizer, make_train_step, shard_train_state

logger = logging.getLogger(__name__)


def build_labels_from_codes(
    codes: np.ndarray, bos_token_id: int, eos_token_id: int, max_length: int
) -> np.ndarray:
    """Codec codes (K, T) -> training labels (T', K) with BOS prepended, the
    delay pattern applied, and EOS filling the to-predict tail
    (reference run_parler_tts_training.py:458-486)."""
    k, t = codes.shape
    ids = np.concatenate([np.full((1, k, 1), bos_token_id), codes[None]], axis=-1)
    _, pattern = build_delay_pattern_mask(
        jnp.asarray(ids), bos_token_id, eos_token_id, min(t + 1 + k, max_length)
    )
    pattern = np.asarray(pattern)[0]  # (K, T'')
    labels = np.where(pattern == -1, eos_token_id, pattern)
    return labels.T  # (T'', K)


def encode_corpus_stage(
    dac: Any,
    dac_params,
    audio_batches: Iterator[dict],
    bos_token_id: int,
    eos_token_id: int,
    max_label_length: int,
    hop_length: int,
    save_dir: Optional[str] = None,
    save_steps: Optional[int] = 500,
) -> List[np.ndarray]:
    """Stage 1: jitted codec encode over hop-aligned buckets, resumable
    (reference run_parler_tts_training.py:413-564)."""
    from .checkpoints import (
        get_last_codec_checkpoint_step,
        load_all_codec_checkpoints,
        save_codec_checkpoint,
    )

    encode = jax.jit(
        lambda p, audio: dac.apply({"params": p}, audio, method="encode")
    )

    start_step = get_last_codec_checkpoint_step(save_dir) if save_dir else 0
    labels: List[np.ndarray] = load_all_codec_checkpoints(save_dir) if save_dir and start_step else []
    pending: List[np.ndarray] = []
    for step, batch in enumerate(audio_batches):
        if step < start_step:
            continue
        audio = jnp.asarray(batch["input_values"]).transpose(0, 2, 1)  # (B, T, 1)
        codes = np.asarray(encode(dac_params, audio))  # (B, K, T')
        lens = np.asarray(batch["len_audio"])
        for i in range(codes.shape[0]):
            n = int(math.ceil(lens[i] / hop_length))
            pending.append(
                build_labels_from_codes(
                    codes[i, :, :n], bos_token_id, eos_token_id, max_label_length
                )
            )
        if save_dir and save_steps and (step + 1) % save_steps == 0:
            save_codec_checkpoint(save_dir, pending, step + 1)
            labels.extend(pending)
            pending = []
    labels.extend(pending)
    return labels


def data_iterator(features: List[dict], collator, batch_size: int, seed: int, epoch: int,
                  process_index: int = 0, process_count: int = 1,
                  group_by_length: bool = False):
    """Deterministic epoch iterator over collated global batches.

    Multi-host: every process materializes the same global order and collated
    shapes (same seed -> same permutation -> same bucket lengths), then keeps
    only its row slice — the JAX analogue of Accelerate's per-process
    dataloader sharding (reference run_parler_tts_training.py:496, :1006).
    The caller reassembles global arrays via `host_local_to_global`.

    `group_by_length`: batch rows of similar label length (the reference's
    LengthGroupedSampler wiring, run_parler_tts_training.py:994-1002) —
    shuffle, then sort within mega-batches, so each collated batch pads to a
    tighter bucket."""
    if group_by_length:
        from .data import length_grouped_order

        order = length_grouped_order(
            [np.asarray(f["labels"]).shape[0] for f in features],
            batch_size, seed + epoch,
        )
    else:
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(len(features))
    if batch_size % process_count != 0:
        raise ValueError(
            f"global batch {batch_size} not divisible by {process_count} "
            "processes — rows would be silently dropped"
        )
    local = batch_size // process_count
    sl = slice(process_index * local, (process_index + 1) * local)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        # Every process collates the FULL global batch then slices its rows:
        # O(global batch) redundant host work per process, accepted
        # deliberately — the collator's padded shapes depend on the whole
        # batch (bucketing by the global max length), and all processes MUST
        # agree on them or host_local_to_global assembles ragged shards.
        # A per-process collate would need a shape-agreement broadcast; at
        # reference batch sizes (<= 64 rows) the redundant collate is
        # microseconds against a >100 ms train step.
        batch = collator([features[j] for j in order[i : i + batch_size]])
        if process_count > 1:
            batch = jax.tree.map(lambda x: x[sl], batch)
        yield batch


def run_training(
    model_args: ModelArguments,
    data_args: DataTrainingArguments,
    training_args: TrainingArguments,
    model: ParlerTTS,
    params,
    train_features: List[dict],
    eval_features: Optional[List[dict]] = None,
    dac: Optional[Any] = None,
    dac_params=None,
    tokenizers=None,
):
    """Stage-2 train loop over pre-tokenized features (each feature holds
    `input_ids`, `prompt_input_ids`, `labels` (T, K))."""
    cfg: ParlerTTSConfig = model.config

    # Long sequences MUST use chunked attention: dense (B,H,T,T) attention at
    # the real recipe scale measured 53.7 s/step vs 127 ms/step chunked on v5e
    # (HBM thrashing) — a 420x difference, not a tuning detail.
    max_t = max(np.asarray(f["labels"]).shape[0] for f in train_features)
    if training_args.remat_policy not in ("full", "dots"):
        raise ValueError(
            f"unknown remat_policy {training_args.remat_policy!r} "
            "(expected 'full' or 'dots')"
        )
    remat_policy = None if training_args.remat_policy == "full" else "dots"
    if training_args.gradient_accumulation_mode not in ("batch", "microbatch"):
        raise ValueError(
            "unknown gradient_accumulation_mode "
            f"{training_args.gradient_accumulation_mode!r} "
            "(expected 'batch' or 'microbatch')"
        )
    impl_s = training_args.attention_impl
    if impl_s == "pallas_flash":
        attn_impl = "pallas"
    elif impl_s == "chunked":
        attn_impl = True
    elif impl_s.startswith("chunked:"):
        # "chunked:1024" — online-softmax scan with an explicit chunk size
        # (the MFU lever measured in training/README.md)
        try:
            attn_impl = int(impl_s.split(":", 1)[1])
        except ValueError:
            attn_impl = 0
        if attn_impl < 1:
            raise ValueError(
                f"attention_impl {impl_s!r}: chunk size must be a positive "
                "integer (0 would silently select dense attention, which "
                "measures ~420x slower at recipe T — see training/README.md)"
            )
    else:
        raise ValueError(
            f"unknown attention_impl {impl_s!r} "
            "(expected 'chunked', 'chunked:N' or 'pallas_flash')"
        )
    # collect every reconciliation independently and clone once — a caller
    # model may need several at a time (e.g. different attention impl AND a
    # different remat_policy)
    clone_kwargs = {}
    if max_t >= 512 and not (model.use_chunked_attention and model.remat_layers):
        logger.info(
            "enabling %s attention + per-layer remat for T=%d",
            training_args.attention_impl, max_t,
        )
        clone_kwargs.update(
            use_chunked_attention=attn_impl, remat_layers=True,
            remat_policy=remat_policy,
        )
    else:
        if model.use_chunked_attention and model.use_chunked_attention != attn_impl:
            logger.info("applying attention_impl=%s", training_args.attention_impl)
            clone_kwargs["use_chunked_attention"] = attn_impl
        if model.remat_layers and model.remat_policy != remat_policy:
            # the caller passed a model that already remats — honor the CLI's
            # remat_policy rather than silently keeping the model's
            logger.info("applying remat_policy=%s", training_args.remat_policy)
            clone_kwargs["remat_policy"] = remat_policy
    if clone_kwargs:
        model = model.clone(**clone_kwargs)
    # mixed precision (reference recipe trains in bf16,
    # run_parler_tts_training.py:90-95,116 + starting_point_v1.json "dtype"):
    # params/optimizer stay fp32, the forward/backward computes in `dtype`
    compute_dtype = {
        "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
        "float16": jnp.float16, "fp16": jnp.float16,
        "float32": jnp.float32, "fp32": jnp.float32,
    }.get(training_args.dtype)
    if compute_dtype is None:
        raise ValueError(f"unknown training dtype {training_args.dtype!r}")
    if training_args.adam_mu_dtype not in (None, "bfloat16", "bf16"):
        raise ValueError(
            f"unknown adam_mu_dtype {training_args.adam_mu_dtype!r} "
            "(expected 'bfloat16' or unset; Adam's first moment is fp32 "
            "by default)"
        )
    if model.dtype != compute_dtype:
        logger.info("training compute dtype: %s", training_args.dtype)
        model = model.clone(dtype=compute_dtype)
    # multi-host: the mesh spans every process's devices (ICI within a host,
    # DCN across); each host feeds its local batch shard (SURVEY §2.4)
    pi, pc = jax.process_index(), jax.process_count()
    mesh = make_mesh(
        n_data=training_args.mesh_data, n_model=training_args.mesh_model
    ) if jax.device_count() > 1 else None

    n_devices = jax.device_count()
    global_bs = (
        training_args.per_device_train_batch_size
        * max(n_devices // training_args.mesh_model, 1)
        * training_args.gradient_accumulation_steps
    )
    steps_per_epoch = len(train_features) // global_bs
    total_steps = (
        training_args.max_steps
        if training_args.max_steps > 0
        else int(steps_per_epoch * training_args.num_train_epochs)
    )

    tx = make_optimizer(
        learning_rate=training_args.learning_rate,
        schedule=training_args.lr_scheduler_type,
        warmup_steps=training_args.warmup_steps,
        total_steps=total_steps,
        b1=training_args.adam_beta1,
        b2=training_args.adam_beta2,
        weight_decay=training_args.weight_decay,
        max_grad_norm=training_args.max_grad_norm,
        freeze_text_encoder=model_args.freeze_text_encoder,
        mu_dtype=(
            jnp.bfloat16 if training_args.adam_mu_dtype is not None else None
        ),
    )
    state = TrainState.create(params, tx)

    # checkpoint autodetect + resume (reference :144-157, :838-867)
    start_step, start_epoch = 0, 0
    resume = training_args.resume_from_checkpoint or get_last_checkpoint(training_args.output_dir)
    if resume:
        abstract = jax.eval_shape(lambda: state)
        state = restore_train_state(resume, abstract)
        start_step, start_epoch = parse_checkpoint_name(resume)
        logger.info("resumed from %s (step %d epoch %d)", resume, start_step, start_epoch)

    if mesh is not None:
        state = shard_train_state(state, mesh, fsdp=training_args.fsdp)
    step_fn = make_train_step(
        model, tx, mesh=mesh, loss_chunk_size=training_args.loss_chunk_size,
        microbatch_steps=(
            training_args.gradient_accumulation_steps
            if training_args.gradient_accumulation_mode == "microbatch"
            else None
        ),
    )

    collator = DataCollatorParlerTTSWithPadding(
        prompt_padding_side=model_args.prompt_padding_side,
        audio_max_length=model_args.max_length if data_args.pad_to_max_length else None,
        # keep padded prompt + frames within the decoder's position table
        # (prompt occupies decoder positions unless it rides cross-attention)
        max_total_length=(
            None if cfg.prompt_cross_attention
            else cfg.decoder.max_position_embeddings
        ),
    )

    tracker = init_tracker(
        data_args.wandb_project, data_args.wandb_run_name,
        {"total_steps": total_steps, "global_bs": global_bs},
        report_to=training_args.report_to,
    ) if pi == 0 else None
    timer = PhaseTimer()
    rng = jax.random.key(training_args.seed)
    eval_pipe_cache: dict = {}  # one jitted eval-generation pipeline per run

    step = start_step
    train_start = time.perf_counter()
    def save_state(state, step, epoch):
        if pc > 1:
            # multi-process: every process participates; Orbax coordinates the
            # sharded write through the jax.distributed service
            save_train_state(state, training_args.output_dir, step, epoch,
                             training_args.save_total_limit)
        else:
            host_state = jax.tree.map(np.asarray, state)
            save_train_state(host_state, training_args.output_dir, step, epoch,
                             training_args.save_total_limit)

    for epoch in range(start_epoch, int(math.ceil(training_args.num_train_epochs))):
        it = data_iterator(train_features, collator, global_bs, training_args.seed,
                           epoch, process_index=pi, process_count=pc,
                           group_by_length=training_args.group_by_length)
        if epoch == start_epoch and start_step > epoch * steps_per_epoch:
            # skip_first_batches equivalent (reference :1010-1015)
            for _ in range(start_step - epoch * steps_per_epoch):
                next(it, None)
        for batch in it:
            if step >= total_steps:
                break
            rng, r = jax.random.split(rng)
            if pc > 1:
                from ..parallel.distributed import host_local_to_global

                batch = host_local_to_global(batch, mesh)
            else:
                batch = jax.tree.map(jnp.asarray, batch)
            with timer.phase("train"):
                state, metrics = step_fn(state, batch, r)
            step += 1
            if step % training_args.logging_steps == 0 and pi == 0:
                log_metric(
                    tracker,
                    {k: v for k, v in metrics.items()},
                    train_time=time.perf_counter() - train_start,
                    step=step, epoch=epoch, prefix="train",
                )
            if step % training_args.save_steps == 0:
                save_state(state, step, epoch)
            if eval_features and step % training_args.eval_steps == 0:
                run_eval(model, state, collator, eval_features, training_args, tracker, step, epoch, mesh=mesh)
                gen_every = training_args.eval_generation_steps or training_args.eval_steps
                if dac is not None and dac_params is not None and step % gen_every == 0:
                    run_eval_generation(
                        model, state, dac, dac_params, eval_features,
                        model_args, training_args, tracker, step, epoch,
                        tokenizers=tokenizers, pipe_cache=eval_pipe_cache,
                        mesh=mesh,
                    )
        if step >= total_steps:
            break

    save_state(state, step, epoch)  # multi-process-aware (np.asarray would
    return state, step              # fail on non-addressable sharded leaves)


def main(argv=None):
    """CLI entry: `python -m parler_tts_tpu.training.run_training cfg.json`.

    End-to-end equivalent of `accelerate launch run_parler_tts_training.py`
    (reference :73-1249): load datasets, tokenize text, offline-encode audio to
    codec labels (stage 1), then run the pjit train loop (stage 2). Requires
    the `datasets` package and either network access or a local dataset cache.
    """
    import pickle

    logging.basicConfig(level=logging.INFO)
    from .arguments import parse_args
    from .data import (
        DataCollatorEncodecWithPadding,
        convert_dataset_str_to_list,
        load_multiple_datasets,
    )

    model_args, data_args, training_args = parse_args(argv)

    # multi-host: initialize BEFORE any backend use (reference boots DDP via
    # `accelerate launch`, run_parler_tts_training.py:112-120)
    from ..parallel.distributed import maybe_init_distributed

    maybe_init_distributed()

    # ---- model + codec
    from ..runtime.pipeline import ParlerTTSPipeline

    path = model_args.model_name_or_path
    pipe = ParlerTTSPipeline.from_pretrained(path)
    cfg, model, params = pipe.config, pipe.model, pipe.params

    from transformers import AutoTokenizer

    desc_tok = AutoTokenizer.from_pretrained(
        model_args.description_tokenizer_name or path
    )
    prompt_tok = AutoTokenizer.from_pretrained(
        model_args.prompt_tokenizer_name or path
    )

    # ---- codec (shared by both splits)
    dac = build_codec(cfg.audio_encoder)
    dac_params = pipe.dac_params if pipe is not None else None
    if dac_params is None:
        raise SystemExit("codec params required: load from a full checkpoint")
    sr = cfg.audio_encoder.sampling_rate
    frame_rate = cfg.audio_encoder.frame_rate

    def prepare_split(dataset_name, config_name, split_name, metadata_name,
                      dataset_samples, max_samples, save_tag):
        """Load one split, stage-1 encode, tokenize, and apply the reference's
        duration/token-length filters (run_parler_tts_training.py:574-638)."""
        specs = convert_dataset_str_to_list(
            dataset_name, config_name,
            metadata_dataset_names=metadata_name,
            splits=split_name,
            dataset_samples=dataset_samples,
        )
        ds = load_multiple_datasets(
            specs, sr, id_column_name=data_args.id_column_name,
            num_proc=data_args.preprocessing_num_workers,
            streaming=data_args.streaming, seed=training_args.seed,
        )
        if data_args.streaming:
            # IterableDatasets have no len/index; draw the requested sample
            # budget lazily (probability-weighted across "+"-specs) and
            # materialize just those rows for stage 1 + tokenization
            if not max_samples:
                raise SystemExit(
                    "streaming=True requires max_train_samples / "
                    "max_eval_samples to bound the draw"
                )
            import itertools

            ds = list(itertools.islice(iter(ds), max_samples))
        elif max_samples:
            ds = ds.select(range(min(max_samples, len(ds))))

        coll = DataCollatorEncodecWithPadding(
            sampling_rate=sr,
            hop_length=cfg.audio_encoder.hop_length,
            audio_column_name=data_args.target_audio_column_name,
            max_length_seconds=data_args.max_duration_in_seconds,
        )
        bs = training_args.audio_encoder_per_device_batch_size

        def audio_batches():
            for i in range(0, len(ds), bs):
                yield coll([ds[j] for j in range(i, min(i + bs, len(ds)))])

        save_dir = (
            os.path.join(data_args.temporary_save_to_disk, save_tag)
            if data_args.temporary_save_to_disk else None
        )
        labels = encode_corpus_stage(
            dac, dac_params, audio_batches(),
            bos_token_id=cfg.decoder.bos_token_id,
            eos_token_id=cfg.decoder.eos_token_id,
            max_label_length=model_args.max_length,
            hop_length=cfg.audio_encoder.hop_length,
            save_dir=save_dir,
            save_steps=data_args.save_codec_steps,
        )

        # duration filter on codec frames (reference filters target_length at
        # :574-600; frames/frame_rate is the same quantity audio-side)
        min_frames = data_args.min_duration_in_seconds * frame_rate
        max_frames = data_args.max_duration_in_seconds * frame_rate
        k_cb = cfg.decoder.num_codebooks
        features, n_dur, n_tok = [], 0, 0
        for i, lab in enumerate(labels):
            n_frames = lab.shape[0] - k_cb - 1  # undo BOS + delay tail
            if not (min_frames <= n_frames <= max_frames):
                n_dur += 1
                continue
            row = ds[i]
            desc_text = row[data_args.description_column_name]
            prompt_text = row[data_args.prompt_column_name]
            if len(str(desc_text)) > data_args.max_text_length:
                n_tok += 1
                continue
            desc_ids = desc_tok(desc_text)["input_ids"]
            prompt_ids = prompt_tok(prompt_text)["input_ids"]
            # token-length filters (reference :611-638)
            if (data_args.max_description_token_length
                    and len(desc_ids) > data_args.max_description_token_length):
                n_tok += 1
                continue
            if (data_args.max_prompt_token_length
                    and len(prompt_ids) > data_args.max_prompt_token_length):
                n_tok += 1
                continue
            features.append(
                {
                    "labels": lab,
                    "input_ids": desc_ids,
                    "prompt_input_ids": prompt_ids,
                    "description_text": str(desc_text),
                    "prompt_text": str(prompt_text),
                }
            )
        logger.info(
            "%s: %d features (%d filtered by duration, %d by text/token length)",
            save_tag, len(features), n_dur, n_tok,
        )
        return features

    features = prepare_split(
        data_args.train_dataset_name, data_args.train_dataset_config_name,
        data_args.train_split_name, data_args.train_metadata_dataset_name,
        data_args.train_dataset_samples, data_args.max_train_samples, "train",
    )
    eval_features = None
    if training_args.do_eval and data_args.eval_dataset_name:
        eval_features = prepare_split(
            data_args.eval_dataset_name,
            data_args.eval_dataset_config_name or data_args.train_dataset_config_name,
            data_args.eval_split_name, data_args.eval_metadata_dataset_name,
            None, data_args.max_eval_samples, "eval",
        )

    if data_args.save_to_disk:
        os.makedirs(data_args.save_to_disk, exist_ok=True)
        with open(os.path.join(data_args.save_to_disk, "features.pkl"), "wb") as f:
            pickle.dump({"train": features, "eval": eval_features}, f)
    if data_args.preprocessing_only:
        logger.info("preprocessing_only: wrote %d features, exiting", len(features))
        return

    # ---- stage 2 (eval loss + generation metrics wired when eval data exists)
    run_training(
        model_args, data_args, training_args, model, params, features,
        eval_features=eval_features, dac=dac, dac_params=dac_params,
        tokenizers=(desc_tok, prompt_tok),
    )

    # ---- final export + optional hub push (reference :1088-1099)
    if jax.process_index() == 0:
        export_dir = os.path.join(training_args.output_dir, "final")
        export_and_push(
            training_args.output_dir, export_dir, cfg, dac_params,
            hub_model_id=training_args.hub_model_id if training_args.push_to_hub else None,
        )


def export_and_push(output_dir: str, export_dir: str, cfg, dac_params,
                    hub_model_id: Optional[str] = None) -> Optional[str]:
    """Export the latest train-state checkpoint to HF-compatible safetensors
    (utils/hf_export bridge) and optionally push it (reference hub push on
    save, run_parler_tts_training.py:1093-1099). Returns the export dir."""
    import pickle

    from ..utils.hf_export import export_composite_to_hf_tensors

    last = get_last_checkpoint(output_dir)
    if last is None:
        logger.warning("no checkpoint found under %s; skipping export", output_dir)
        return None
    # StandardCheckpointer stores the TrainState pytree; pull params only
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(last))
    params = restored["params"] if isinstance(restored, dict) and "params" in restored else restored
    tensors = export_composite_to_hf_tensors(jax.tree.map(np.asarray, params), cfg)
    os.makedirs(export_dir, exist_ok=True)
    try:
        from safetensors.numpy import save_file

        save_file(tensors, os.path.join(export_dir, "model.safetensors"))
    except ImportError:
        np.savez(os.path.join(export_dir, "model.npz"), **tensors)
    with open(os.path.join(export_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(export_dir, "dac_params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, dac_params), f)
    if hub_model_id:
        try:
            from huggingface_hub import HfApi

            api = HfApi()
            api.create_repo(hub_model_id, exist_ok=True)
            api.upload_folder(folder_path=export_dir, repo_id=hub_model_id)
            logger.info("pushed %s to hub repo %s", export_dir, hub_model_id)
        except Exception as e:  # dep-gated like eval metrics
            logger.warning("hub push skipped: %s", e)
    return export_dir


def run_eval(model, state, collator, eval_features, training_args, tracker, step, epoch,
             mesh=None):
    """Eval loss loop (reference :1125-1135); generation metrics are wired via
    training.eval_metrics when their optional deps exist.

    Multi-host: every process collates the same deterministic global batch,
    keeps its row slice, and reassembles global arrays — params sharded over
    the multi-host mesh cannot be applied to host-local inputs."""
    from ..ops.losses import mean_loss_reference_style

    dcfg = model.config.decoder

    @jax.jit
    def eval_loss(params, batch: Batch):
        logits, dec_in = model.apply(
            {"params": params},
            batch.input_ids, batch.attention_mask,
            batch.prompt_input_ids, batch.prompt_attention_mask,
            batch.labels,
        )
        loss, per_cb = mean_loss_reference_style(
            logits, batch.labels, dec_in,
            bos_token_id=dcfg.bos_token_id, eos_token_id=dcfg.eos_token_id,
            codebook_weights=dcfg.codebook_weights,
        )
        return loss, per_cb

    pc = jax.process_count()
    losses = []  # (per-batch mean loss, rows in the batch)
    bs = training_args.per_device_eval_batch_size * max(jax.device_count(), 1)

    def run_one(feats, nbs):
        batch = collator(feats)
        if pc > 1:
            from ..parallel.distributed import host_local_to_global, local_batch_slice

            sl = local_batch_slice(nbs)
            batch = host_local_to_global(jax.tree.map(lambda x: x[sl], batch), mesh)
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        loss, _ = eval_loss(state.params, batch)
        losses.append((float(loss), len(feats)))

    n_full = (len(eval_features) // bs) * bs
    for i in range(0, n_full, bs):
        run_one(eval_features[i : i + bs], bs)
    # remainder: run the tail at its own size instead of silently skipping —
    # a small eval set must still yield a metric. The tail must stay
    # divisible by the data-mesh axis (global rows are sharded over it under
    # multi-host), not just by the process count.
    div = mesh.shape["data"] if (pc > 1 and mesh is not None) else pc
    rem = len(eval_features) - n_full
    dropped = rem % div
    rem -= dropped
    if dropped and rem == 0 and n_full == 0:
        logger.warning(
            "eval set (%d) smaller than the data-mesh axis (%d); no eval "
            "loss computed", len(eval_features), div,
        )
    if rem > 0:
        if n_full == 0:
            logger.warning(
                "eval set (%d) smaller than the global eval batch (%d); "
                "running one remainder batch (extra one-off compile)",
                len(eval_features), bs,
            )
        run_one(eval_features[n_full : n_full + rem], rem)
    if not losses:
        return None
    # weight each batch mean by its row count: the (smaller) remainder batch
    # must not carry the same weight as a full batch
    total_rows = sum(n for _, n in losses)
    avg = sum(l * n for l, n in losses) / total_rows
    log_metric(tracker, {"loss": avg}, 0.0, step, epoch, prefix="eval")
    return avg


def run_eval_generation(
    model, state, dac, dac_params, eval_features, model_args, training_args,
    tracker, step, epoch, tokenizers=None, max_samples: int = 8,
    pipe_cache: Optional[dict] = None, mesh=None,
):
    """Eval-time generation + functional metrics (reference generate_step +
    compute_metrics, run_parler_tts_training.py:1137-1206): synthesize a few
    eval samples, score WER/CLAP/SI-SDR when the optional deps exist, and log
    transcription tables + audio clips.

    Multi-host: params are replicated across the mesh by a jitted identity
    (XLA inserts the all-gathers; replicated leaves are free) and every
    process reads its now-complete local shard and generates the same
    deterministic samples, so metrics are rank-identical (the reference
    gathers the GENERATIONS across ranks instead, :1154-1206 — same result,
    params are the smaller transfer at 8-sample eval scale).

    `pipe_cache`: mutable dict holding the pipeline across eval steps — the
    jitted generate program compiles once; later calls only swap params.
    """
    from ..runtime.pipeline import ParlerTTSPipeline
    from .eval_metrics import clap_similarity, si_sdr, wer

    cfg = model.config
    if jax.process_count() > 1:
        if mesh is None:
            raise ValueError("multi-host eval generation requires the mesh")
        from ..parallel.mesh import replicated

        reps = jax.jit(lambda t: t, out_shardings=replicated(mesh))(state.params)
        host_params = jax.tree.map(
            lambda a: np.asarray(a.addressable_data(0)), reps
        )
    else:
        host_params = state.params
    if pipe_cache is not None and "pipe" in pipe_cache:
        pipe = pipe_cache["pipe"]
        pipe.params = jax.device_put(host_params)
    else:
        gen = GenerationConfig(
            max_length=min(model_args.max_length, 860),
            do_sample=model_args.do_sample,
            temperature=model_args.temperature,
            bos_token_id=cfg.decoder.bos_token_id,
            pad_token_id=cfg.decoder.pad_token_id,
            eos_token_id=cfg.decoder.eos_token_id,
            codebook_guard=cfg.audio_encoder.codebook_size,
        )
        pipe = ParlerTTSPipeline(model, host_params, dac, dac_params, gen)
        if pipe_cache is not None:
            pipe_cache["pipe"] = pipe

    feats = eval_features[:max_samples]
    desc_tok, prompt_tok = tokenizers if tokenizers else (None, None)
    from .data import DataCollatorParlerTTSWithPadding

    coll = DataCollatorParlerTTSWithPadding(
        prompt_padding_side=model_args.prompt_padding_side,
        max_total_length=(
            None if cfg.prompt_cross_attention
            else cfg.decoder.max_position_embeddings
        ),
    )
    batch = coll(feats)
    audios, lengths = pipe.generate(
        batch.input_ids, batch.prompt_input_ids,
        desc_mask=batch.attention_mask, prompt_mask=batch.prompt_attention_mask,
        seed=step,
    )
    clips = [np.asarray(audios[i, : lengths[i]]) for i in range(len(feats))]
    sr = cfg.audio_encoder.sampling_rate

    metrics = {}
    descriptions = [f.get("description_text", "") for f in feats]
    prompts = [f.get("prompt_text", "") for f in feats]
    if any(descriptions) and training_args.compute_clap_similarity_metric:
        clap = clap_similarity(model_args.clap_model_name_or_path, descriptions, clips, sr)
        if clap is not None:
            metrics["clap"] = clap
    sdr = si_sdr(clips, sr) if training_args.compute_noise_level_metric else None
    if sdr is not None:
        metrics["si_sdr"] = float(np.mean(sdr))
    transcriptions = []
    if any(prompts):
        wer_out = wer(
            model_args.asr_model_name_or_path, prompts, clips, sr,
            training_args.per_device_eval_batch_size,
            training_args.noise_level_to_compute_clean_wer, sdr,
        )
        if wer_out is not None:
            metrics["wer"], clean, transcriptions = wer_out
            if clean is not None:
                metrics["clean_wer"] = clean
    if metrics:
        log_metric(tracker, metrics, 0.0, step, epoch, prefix="eval")
    log_pred(tracker, descriptions, prompts, transcriptions, clips, sr, step)
    return metrics


if __name__ == "__main__":
    main()

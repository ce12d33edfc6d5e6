"""Data assembly and collation for training.

Re-implements the reference collators and multi-dataset assembly
(`/root/reference/training/data.py:14-311`) with one TPU-critical change:
**static shape bucketing**. The reference pads each batch to its longest
element (fine on GPU, a recompile storm on TPU); here every padded length is
rounded up to a bucket boundary so the train step compiles a handful of times.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

from .train_state import Batch


def round_to_bucket(n: int, bucket: int, max_len: Optional[int] = None) -> int:
    out = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    return min(out, max_len) if max_len is not None else out


@dataclass
class DataCollatorEncodecWithPadding:
    """Raw audio -> padded float arrays + lengths for offline codec encoding
    (reference data.py:14-42). Audio padded to a hop-multiple bucket."""

    sampling_rate: int
    hop_length: int = 512
    audio_column_name: str = "audio"
    max_length_seconds: float = 35.0
    bucket_seconds: float = 5.0

    def __call__(self, features: Sequence[Dict[str, Any]]):
        audios = [np.asarray(f[self.audio_column_name]["array"], np.float32) for f in features]
        len_audio = np.asarray([len(a) for a in audios], np.int32)
        max_samples = int(self.max_length_seconds * self.sampling_rate)
        bucket = int(self.bucket_seconds * self.sampling_rate)
        target = round_to_bucket(int(len_audio.max()), bucket, max_samples)
        target = ((target + self.hop_length - 1) // self.hop_length) * self.hop_length
        batch = np.zeros((len(audios), target), np.float32)
        for i, a in enumerate(audios):
            a = a[:target]
            batch[i, : len(a)] = a
        return {"input_values": batch[:, None, :], "len_audio": np.minimum(len_audio, target)}


@dataclass
class DataCollatorParlerTTSWithPadding:
    """Tokenized features -> a `Batch` (reference data.py:45-114).

    - labels (B, T, K) padded with -100 (optionally to a fixed audio_max_length)
    - description ids padded RIGHT, prompt ids padded LEFT
      (reference `prompt_padding_side`, arguments.py:91-96)
    - all lengths bucketed for shape stability.
    """

    prompt_padding_side: str = "left"
    pad_token_id: int = 0
    prompt_pad_token_id: int = 0
    audio_max_length: Optional[int] = None
    token_bucket: int = 16
    label_bucket: int = 128
    # hard cap on padded_prompt_len + padded_frames: the decoder's position
    # table (max_position_embeddings) covers the prompt prefix plus the audio
    # frames, and over-long padded batches would index past it (the model
    # raises at trace time). Wired from the model config by the training CLI.
    max_total_length: Optional[int] = None

    def _pad_tokens(self, seqs: List[np.ndarray], side: str, pad_id: int):
        target = round_to_bucket(max(len(s) for s in seqs), self.token_bucket)
        ids = np.full((len(seqs), target), pad_id, np.int32)
        mask = np.zeros((len(seqs), target), np.int32)
        for i, s in enumerate(seqs):
            if side == "left":
                ids[i, target - len(s):] = s
                mask[i, target - len(s):] = 1
            else:
                ids[i, : len(s)] = s
                mask[i, : len(s)] = 1
        return ids, mask

    def __call__(self, features: Sequence[Dict[str, Any]]) -> Batch:
        desc = [np.asarray(f["input_ids"], np.int64) for f in features]
        desc_ids, desc_mask = self._pad_tokens(desc, "right", self.pad_token_id)
        prompt = [np.asarray(f["prompt_input_ids"], np.int64) for f in features]
        p_ids, p_mask = self._pad_tokens(
            prompt, self.prompt_padding_side, self.prompt_pad_token_id
        )

        labels = [np.asarray(f["labels"], np.int64) for f in features]  # (T, K)
        t_max = max(l.shape[0] for l in labels)
        t_pad = self.audio_max_length or round_to_bucket(t_max, self.label_bucket)
        if self.max_total_length is not None:
            capped = min(t_pad, self.max_total_length - p_ids.shape[1])
            if capped <= 0:
                raise ValueError(
                    f"padded prompt ({p_ids.shape[1]}) leaves no room for audio "
                    f"frames under max_total_length={self.max_total_length}"
                )
            if capped < t_max:
                # truncation cuts the delay-pattern tail (and its EOS
                # supervision) from over-long rows — a safety net, not a
                # filter; configure the duration/token-length filters so rows
                # fit (reference run_parler_tts_training.py:574-638)
                logger.warning(
                    "truncating labels %d -> %d frames to fit max_total_length=%d "
                    "(prompt %d); over-long rows lose EOS supervision — prefer "
                    "duration filtering",
                    t_max, capped, self.max_total_length, p_ids.shape[1],
                )
            t_pad = capped
        k = labels[0].shape[1]
        lab = np.full((len(labels), t_pad, k), -100, np.int64)
        for i, l in enumerate(labels):
            l = l[:t_pad]
            lab[i, : l.shape[0]] = l
        return Batch(
            input_ids=desc_ids,
            attention_mask=desc_mask,
            prompt_input_ids=p_ids,
            prompt_attention_mask=p_mask,
            labels=lab.astype(np.int32),
        )


def length_grouped_order(
    lengths: Sequence[int], batch_size: int, seed: int, mega_batch_mult: int = 50
) -> np.ndarray:
    """Length-grouped shuffling (`group_by_length` parity — the reference uses
    transformers' LengthGroupedSampler, run_parler_tts_training.py:994-996):
    shuffle globally, then sort within mega-batches of `mega_batch_mult *
    batch_size` so co-batched samples have similar lengths (less padding waste,
    fewer shape buckets)."""
    rng = np.random.default_rng(seed)
    lengths = np.asarray(lengths)
    indices = rng.permutation(len(lengths))
    mb = batch_size * mega_batch_mult
    out = []
    for i in range(0, len(indices), mb):
        chunk = indices[i : i + mb]
        out.append(chunk[np.argsort(lengths[chunk])[::-1]])
    return np.concatenate(out)


def convert_dataset_str_to_list(
    dataset_names: str,
    dataset_config_names: str,
    metadata_dataset_names: Optional[str] = None,
    splits: Optional[str] = None,
    dataset_samples: Optional[str] = None,
    default_split: str = "train",
) -> List[Dict[str, Any]]:
    """Parse "+"-separated name/config/split/samples/metadata 5-tuples
    (reference data.py:117-172)."""
    names = dataset_names.split("+")
    configs = dataset_config_names.split("+")
    splits_l = splits.split("+") if splits else [default_split] * len(names)
    meta = metadata_dataset_names.split("+") if metadata_dataset_names else [None] * len(names)
    samples = dataset_samples.split("+") if dataset_samples else [None] * len(names)

    if len(configs) != len(names):
        raise ValueError(
            f"Ensure one config per dataset: got {len(names)} datasets, {len(configs)} configs."
        )
    if len(splits_l) != len(names):
        raise ValueError("Ensure one split per dataset.")
    if len(meta) != len(names):
        raise ValueError("Ensure one metadata dataset per dataset.")

    if dataset_samples is not None:
        samples = [float(s) for s in samples]
        total = sum(samples)
        probs = [s / total for s in samples]
    else:
        probs = None

    out = []
    for i, name in enumerate(names):
        out.append(
            {
                "name": name,
                "config": configs[i] or None,
                "split": splits_l[i],
                "metadata_dataset_name": meta[i],
                "samples": samples[i] if probs else None,
                "prob": probs[i] if probs else None,
            }
        )
    return out


def load_multiple_datasets(
    dataset_specs: List[Dict[str, Any]],
    sampling_rate: int,
    columns_to_keep: Optional[set] = None,
    id_column_name: Optional[str] = None,
    num_proc: Optional[int] = None,
    streaming: bool = False,
    stopping_strategy: str = "first_exhausted",
    seed: Optional[int] = None,
):
    """Load, resample, metadata-join, and combine datasets
    (reference data.py:175-311). Requires the `datasets` package and
    (network or cached) data — host-side only.

    Non-streaming: parts are concatenated (reference :303-308). Streaming:
    parts are mixed by `interleave_datasets` with the per-spec sampling
    probabilities computed by `convert_dataset_str_to_list` (reference
    :296-302)."""
    from datasets import Audio, concatenate_datasets, load_dataset

    parts = []
    for spec in dataset_specs:
        kw = {} if streaming else {"num_proc": num_proc}
        ds = load_dataset(
            spec["name"], spec["config"], split=spec["split"], streaming=streaming, **kw
        )
        # streaming IterableDatasets may expose features=None until resolved
        audio_cols = [c for c, f in (ds.features or {}).items()
                      if getattr(f, "sampling_rate", None)]
        for c in audio_cols:
            ds = ds.cast_column(c, Audio(sampling_rate=sampling_rate))
        if spec.get("metadata_dataset_name"):
            if streaming:
                # `datasets` cannot axis=1-concatenate IterableDatasets, and
                # the full-corpus id check below needs a materialized join
                # (the reference has the same constraint — its len(filter(...))
                # at data.py:279-284 also requires a map-style dataset)
                raise ValueError(
                    "metadata_dataset joins require streaming=False; "
                    "pre-join the metadata or disable streaming"
                )
            meta = load_dataset(
                spec["metadata_dataset_name"], spec["config"], split=spec["split"],
                streaming=streaming, **kw,
            )
            if id_column_name is not None:
                meta = meta.rename_column(id_column_name, f"metadata_{id_column_name}")
            dup = [c for c in meta.column_names if c in ds.column_names]
            meta = meta.remove_columns(dup)
            ds = concatenate_datasets([ds, meta], axis=1)
            # FULL-corpus id-consistency verification (reference data.py:273-288
            # filters the whole joined dataset for id != metadata_id); the
            # streaming+metadata combination is rejected above.
            if id_column_name is not None:
                mism = ds.filter(
                    lambda a, b: a != b,
                    input_columns=[id_column_name, f"metadata_{id_column_name}"],
                    num_proc=num_proc,
                )
                if len(mism) != 0:
                    raise ValueError(
                        f"metadata join misaligned: {len(mism)} rows of "
                        f"{spec['name']} have ids that differ from "
                        f"{spec['metadata_dataset_name']}"
                    )
        if columns_to_keep is not None:
            ds = ds.remove_columns(set(ds.column_names) - columns_to_keep)
        parts.append(ds)
    if len(parts) == 1:
        return parts[0]
    if streaming:
        from datasets import interleave_datasets

        probs = [spec.get("prob") for spec in dataset_specs]
        probabilities = probs if all(p is not None for p in probs) else None
        return interleave_datasets(
            parts, probabilities=probabilities, seed=seed,
            stopping_strategy=stopping_strategy,
        )
    return concatenate_datasets(parts)

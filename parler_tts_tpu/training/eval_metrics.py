"""Evaluation metrics: WER (ASR), CLAP similarity, SI-SDR.

Parity with `/root/reference/training/eval.py:17-142`. All three depend on
host-side torch models (Whisper ASR pipeline, CLAP, SQUIM) and are gated on
their optional dependencies — the training loop treats them as pluggable
callables and skips whatever is unavailable.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def clap_similarity(
    clap_model_name_or_path: str,
    texts: List[str],
    audios: List[np.ndarray],
    sampling_rate: int,
) -> Optional[float]:
    """Cosine similarity between CLAP text and audio embeddings (eval.py:17-43)."""
    try:
        import torch
        from transformers import AutoProcessor, ClapModel
    except ImportError:
        return None
    clap = ClapModel.from_pretrained(clap_model_name_or_path)
    processor = AutoProcessor.from_pretrained(clap_model_name_or_path)
    inputs = processor(
        text=texts, audios=[a.astype(np.float32) for a in audios],
        padding=True, return_tensors="pt", sampling_rate=sampling_rate,
    )
    with torch.no_grad():
        text_emb = clap.get_text_features(
            input_ids=inputs["input_ids"], attention_mask=inputs.get("attention_mask")
        )
        audio_emb = clap.get_audio_features(inputs["input_features"])
        sim = torch.nn.functional.cosine_similarity(audio_emb, text_emb, dim=1)
    return float(sim.mean())


def si_sdr(audios: List[np.ndarray], sampling_rate: int) -> Optional[List[float]]:
    """SQUIM objective SI-SDR noise estimate, 15 s cap (eval.py:46-68)."""
    try:
        import torch
        from torchaudio.pipelines import SQUIM_OBJECTIVE
    except ImportError:
        return None
    import torchaudio

    model = SQUIM_OBJECTIVE.get_model()
    max_len = 15 * SQUIM_OBJECTIVE.sample_rate
    out = []
    for audio in audios:
        wav = torch.tensor(audio, dtype=torch.float32)[None]
        if sampling_rate != SQUIM_OBJECTIVE.sample_rate:
            wav = torchaudio.functional.resample(
                wav, sampling_rate, SQUIM_OBJECTIVE.sample_rate
            )
        with torch.no_grad():
            _, _, sdr = model(wav[:, :max_len])
        out.append(float(sdr[0]))
    return out


def wer(
    asr_model_name_or_path: str,
    prompts: List[str],
    audios: List[np.ndarray],
    sampling_rate: int,
    per_device_eval_batch_size: int = 8,
    noise_level_to_compute_clean_wer: Optional[float] = None,
    si_sdr_measures: Optional[List[float]] = None,
) -> Optional[Tuple[float, Optional[float], List[str]]]:
    """Whisper transcription -> normalized WER, plus clean-WER above an SI-SDR
    threshold (eval.py:71-142). Returns (wer%, clean_wer%, transcriptions)."""
    try:
        import evaluate
        from transformers import pipeline
        from transformers.models.whisper.english_normalizer import (
            BasicTextNormalizer,
            EnglishTextNormalizer,
        )
    except ImportError:
        return None

    metric = evaluate.load("wer")
    asr = pipeline(model=asr_model_name_or_path, device="cpu")
    return_language = "whisper" in asr_model_name_or_path.lower()

    transcriptions = asr(
        [{"raw": a.astype(np.float32), "sampling_rate": sampling_rate} for a in audios],
        batch_size=int(per_device_eval_batch_size),
        return_language=return_language,
    )
    if return_language:
        tokenizer = asr.tokenizer
        english_normalizer = EnglishTextNormalizer(tokenizer.english_spelling_normalizer)
        basic_normalizer = BasicTextNormalizer()
        norm = lambda t: (  # noqa: E731
            english_normalizer(t["text"])
            if t.get("chunks", [{}])[0].get("language", "english") == "english"
            else basic_normalizer(t["text"])
        )
    else:
        basic = BasicTextNormalizer()
        norm = lambda t: basic(t["text"])  # noqa: E731

    normalized_predictions = [norm(t) for t in transcriptions]
    normalized_references = []
    for p in prompts:
        np_ref = norm({"text": p, "chunks": [{"language": "english"}]})
        normalized_references.append(np_ref if np_ref.strip() else p.lower())

    word_error = 100 * metric.compute(
        predictions=normalized_predictions, references=normalized_references
    )
    clean_word_error = None
    if noise_level_to_compute_clean_wer is not None and si_sdr_measures is not None:
        mask = np.asarray(si_sdr_measures) >= noise_level_to_compute_clean_wer
        if mask.any():
            clean_word_error = 100 * metric.compute(
                predictions=[p for p, m in zip(normalized_predictions, mask) if m],
                references=[r for r, m in zip(normalized_references, mask) if m],
            )
    return word_error, clean_word_error, [t["text"] for t in transcriptions]

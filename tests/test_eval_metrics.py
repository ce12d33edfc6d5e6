"""Execute the eval-metric BODIES (reference training/eval.py:17-142 parity)
with tiny random local models — no network, no hub.

Earlier rounds only covered the dependency gating; these tests build a tiny
random Whisper ASR pipeline and a tiny CLAP from the installed `transformers`
and run `wer` / `clap_similarity` end to end, including the clean-WER split
(eval.py:120-126) and the corpus-WER fallback metric.
"""

import os

import numpy as np
import pytest

from parler_tts_tpu.training.eval_metrics import (
    clap_similarity,
    si_sdr,
    wer,
    word_error_rate,
)

# local-path models only: make any accidental hub lookup fail fast instead of
# hanging on a dead socket
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def test_word_error_rate_exact_values():
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
    # corpus-level pooling: 1 sub + 1 del over 5 reference words
    assert word_error_rate(["a x c", "d"], ["a b c", "d e"]) == pytest.approx(2 / 5)
    # insertion-only and empty-prediction cases
    assert word_error_rate(["a b c d"], ["a b c"]) == pytest.approx(1 / 3)
    assert word_error_rate([""], ["a b"]) == 1.0


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    """A saved tiny random Whisper checkpoint + processor, built offline."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import ByteLevelBPETokenizer
    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperProcessor,
        WhisperTokenizer,
    )

    # keep "whisper" OUT of the path: wer() routes normalizer selection on the
    # model path (eval_metrics.py `return_language`), and the tiny model can't
    # do real language detection — exercise the basic-normalizer branch e2e
    td = str(tmp_path_factory.mktemp("tiny_asr"))
    tok = ByteLevelBPETokenizer()
    tok.train_from_iterator(
        ["hello world this is a test " * 50], vocab_size=400, min_frequency=1,
        special_tokens=[
            "<|endoftext|>", "<|startoftranscript|>", "<|en|>",
            "<|transcribe|>", "<|notimestamps|>",
        ],
    )
    tok.save_model(td)
    wt = WhisperTokenizer(
        vocab_file=os.path.join(td, "vocab.json"),
        merges_file=os.path.join(td, "merges.txt"),
        unk_token="<|endoftext|>", bos_token="<|endoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>",
    )
    cfg = WhisperConfig(
        vocab_size=tok.get_vocab_size(), d_model=32, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=wt.convert_tokens_to_ids("<|startoftranscript|>"),
        eos_token_id=wt.eos_token_id, pad_token_id=wt.pad_token_id,
        bos_token_id=wt.bos_token_id,
    )
    import torch

    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg)
    model.generation_config.max_length = 12
    proc = WhisperProcessor(
        feature_extractor=WhisperFeatureExtractor(feature_size=80), tokenizer=wt
    )
    model.save_pretrained(td)
    proc.save_pretrained(td)
    return td


def test_wer_executes_with_tiny_whisper(tiny_whisper_dir):
    rng = np.random.default_rng(0)
    audios = [
        rng.standard_normal(8000).astype(np.float32) * 0.1 for _ in range(3)
    ]
    prompts = ["hello world", "this is a test", "hello test"]
    out = wer(
        tiny_whisper_dir, prompts, audios, sampling_rate=16000,
        per_device_eval_batch_size=2,
        noise_level_to_compute_clean_wer=25.0,
        si_sdr_measures=[30.0, 10.0, 26.0],
    )
    assert out is not None, "wer body did not execute"
    word_error, clean_word_error, transcriptions = out
    assert np.isfinite(word_error) and word_error >= 0.0
    # clean split keeps rows 0 and 2 (SI-SDR >= 25)
    assert clean_word_error is not None and np.isfinite(clean_word_error)
    assert len(transcriptions) == 3
    assert all(isinstance(t, str) for t in transcriptions)

    # threshold excluding every row -> clean WER stays None
    _, clean_none, _ = wer(
        tiny_whisper_dir, prompts[:1], audios[:1], sampling_rate=16000,
        noise_level_to_compute_clean_wer=25.0, si_sdr_measures=[10.0],
    )
    assert clean_none is None


@pytest.fixture(scope="module")
def tiny_clap_dir(tmp_path_factory):
    """A saved tiny random CLAP checkpoint + processor, built offline."""
    pytest.importorskip("transformers")
    from tokenizers import ByteLevelBPETokenizer
    from transformers import (
        ClapAudioConfig,
        ClapConfig,
        ClapFeatureExtractor,
        ClapModel,
        ClapProcessor,
        ClapTextConfig,
        RobertaTokenizerFast,
    )

    td = str(tmp_path_factory.mktemp("tiny_clap"))
    tok = ByteLevelBPETokenizer()
    tok.train_from_iterator(
        ["a calm female voice with studio quality " * 50],
        vocab_size=300, min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    tok.save_model(td)
    rt = RobertaTokenizerFast(
        vocab_file=os.path.join(td, "vocab.json"),
        merges_file=os.path.join(td, "merges.txt"),
    )
    text_cfg = ClapTextConfig(
        vocab_size=tok.get_vocab_size(), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, projection_dim=16,
        max_position_embeddings=64,
    )
    # keep the DEFAULT spectrogram geometry (spec_size 256, 64 mel bins,
    # 10 s window) — the swin patcher asserts the feature map fits it — and
    # shrink only depths/widths
    audio_cfg = ClapAudioConfig(
        depths=[1, 1], num_attention_heads=[2, 2],
        patch_embeds_hidden_size=16, projection_dim=16, hidden_size=32,
    )
    import torch

    torch.manual_seed(0)
    model = ClapModel(ClapConfig(
        text_config=text_cfg.to_dict(), audio_config=audio_cfg.to_dict(),
        projection_dim=16,
    ))
    proc = ClapProcessor(
        # rand_trunc -> single-channel mels (the default "fusion" truncation
        # emits 4 crop channels, which need enable_fusion audio towers)
        feature_extractor=ClapFeatureExtractor(truncation="rand_trunc"),
        tokenizer=rt,
    )
    model.save_pretrained(td)
    proc.save_pretrained(td)
    return td


def test_clap_similarity_executes_with_tiny_clap(tiny_clap_dir):
    rng = np.random.default_rng(1)
    audios = [rng.standard_normal(24000).astype(np.float32) * 0.1
              for _ in range(2)]
    sim = clap_similarity(
        tiny_clap_dir,
        ["a calm female voice", "studio quality"],
        audios,
        sampling_rate=48000,
    )
    assert sim is not None, "clap body did not execute"
    assert -1.0 <= float(sim) <= 1.0


def test_si_sdr_gates_on_missing_torchaudio():
    try:
        import torchaudio  # noqa: F401

        pytest.skip("torchaudio installed; gating path not reachable")
    except ImportError:
        pass
    assert si_sdr([np.zeros(1000, np.float32)], 16000) is None


@pytest.fixture()
def mock_torchaudio(monkeypatch):
    """A stub torchaudio exposing exactly what `si_sdr` consumes — the
    SQUIM_OBJECTIVE bundle (sample_rate + get_model) and
    functional.resample — so the body's resample/cap/batch logic EXECUTES
    offline (same approach as the tiny local Whisper/CLAP above; torchaudio
    ships no tiny config, hence a stub instead of a tiny real model).
    Returns the stub model for input-shape assertions."""
    import sys
    import types

    import torch

    class _TinySquim(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.seen_lengths = []

        def forward(self, wav):
            self.seen_lengths.append(int(wav.shape[-1]))
            b = wav.shape[0]
            energy = wav.pow(2).mean(dim=1)
            # SQUIM contract: (stoi, pesq, si_sdr) batched estimates
            return torch.ones(b), torch.ones(b), 10 * torch.log10(energy + 1e-9)

    model = _TinySquim()

    def resample(wav, orig_freq, new_freq):
        import torch.nn.functional as F

        n = max(1, int(round(wav.shape[-1] * new_freq / orig_freq)))
        return F.interpolate(
            wav[None], size=n, mode="linear", align_corners=False
        )[0]

    ta = types.ModuleType("torchaudio")
    fn = types.ModuleType("torchaudio.functional")
    fn.resample = resample
    pipelines = types.ModuleType("torchaudio.pipelines")
    pipelines.SQUIM_OBJECTIVE = types.SimpleNamespace(
        sample_rate=16000, get_model=lambda: model
    )
    ta.functional = fn
    ta.pipelines = pipelines
    monkeypatch.setitem(sys.modules, "torchaudio", ta)
    monkeypatch.setitem(sys.modules, "torchaudio.functional", fn)
    monkeypatch.setitem(sys.modules, "torchaudio.pipelines", pipelines)
    return model


def test_si_sdr_body_executes_with_mock(mock_torchaudio):
    """The si_sdr body (eval_metrics reference eval.py:46-68): per-clip
    resample to the bundle rate, 15 s cap, scalar float per clip."""
    rng = np.random.default_rng(2)
    audios = [
        rng.standard_normal(44100).astype(np.float32) * 0.1,   # 1 s @ 44.1k
        rng.standard_normal(16 * 44100).astype(np.float32) * 0.1,  # 16 s
    ]
    out = si_sdr(audios, sampling_rate=44100)
    assert out is not None, "si_sdr body did not execute"
    assert len(out) == 2
    assert all(isinstance(x, float) and np.isfinite(x) for x in out)
    # clip 0: 44.1k -> 16k resample lands at ~16000 samples; clip 1 resamples
    # then caps at 15 s * 16000 before the model sees it
    assert abs(mock_torchaudio.seen_lengths[0] - 16000) <= 2
    assert mock_torchaudio.seen_lengths[1] == 15 * 16000


def test_si_sdr_no_resample_at_bundle_rate(mock_torchaudio):
    audio = np.random.default_rng(3).standard_normal(4000).astype(np.float32)
    out = si_sdr([audio], sampling_rate=16000)
    assert out is not None and len(out) == 1
    # no resample: the model saw the raw length
    assert mock_torchaudio.seen_lengths == [4000]

"""User-facing pipeline: text in -> waveform out.

API parity with the reference's `ParlerTTSForConditionalGeneration.generate`
(`/root/reference/parler_tts/modeling_parler_tts.py:3321-3653`) plus
checkpoint loading from HF-format directories (safetensors). Host-side work is
limited to tokenization and shape bucketing; everything else runs in two jitted
programs (token generation, codec decode).

Codec decode is bucketed: per-batch max frame counts are rounded up to
`frame_bucket` so a handful of compiled decode shapes cover all lengths instead
of always paying the full-max_length conv stack (the reference pays per-sample
dynamic shapes instead, modeling:3615-3647).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.dac_model import DACModel
from ..codec.registry import (
    build_codec,
    codec_channels,
    convert_codec_params,
    init_codec_params,
)
from ..config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
)
from ..models.parler import ParlerTTS, convert_composite_params
from .generate import make_generate, make_stream_functions


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


def load_hf_config(path: str) -> ParlerTTSConfig:
    """Parse an HF-format `config.json` into our config tree."""
    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    te, ae, de = raw["text_encoder"], raw["audio_encoder"], raw["decoder"]
    if ae.get("model_type") == "encodec":
        from ..codec.encodec_model import EncodecCodecConfig

        # HF derives the quantizer count from the top target bandwidth
        # (transformers EncodecConfig.num_quantizers)
        up = tuple(ae.get("upsampling_ratios", (8, 5, 4, 4)))
        hop = int(np.prod(up))
        fr = -(-ae.get("sampling_rate", 32000) // hop)  # ceil
        if "num_codebooks" in ae:
            n_q = ae["num_codebooks"]
        elif ae.get("target_bandwidths"):
            n_q = int(1000 * ae["target_bandwidths"][-1] // (fr * 10))
        else:
            n_q = de.get("num_codebooks", 4)
        audio_encoder = EncodecCodecConfig(
            sampling_rate=ae.get("sampling_rate", 32000),
            audio_channels=ae.get("audio_channels", 1),
            num_filters=ae.get("num_filters", 64),
            hidden_size=ae.get("hidden_size", 128),
            num_residual_layers=ae.get("num_residual_layers", 1),
            upsampling_ratios=up,
            codebook_size=ae.get("codebook_size", 2048),
            codebook_dim=ae.get("codebook_dim", ae.get("hidden_size", 128)),
            num_codebooks=n_q,
            num_lstm_layers=ae.get("num_lstm_layers", 2),
            kernel_size=ae.get("kernel_size", 7),
            last_kernel_size=ae.get("last_kernel_size", 7),
            residual_kernel_size=ae.get("residual_kernel_size", 3),
            dilation_growth_rate=ae.get("dilation_growth_rate", 2),
            use_causal_conv=ae.get("use_causal_conv", True),
            trim_right_ratio=ae.get("trim_right_ratio", 1.0),
            pad_mode=ae.get("pad_mode", "reflect"),
            compress=ae.get("compress", 2),
            normalize=ae.get("normalize", False),
        )
    else:
        mt = ae.get("model_type")
        if mt not in (None, "dac", "dac_on_the_hub"):
            raise ValueError(
                f"unsupported audio_encoder model_type {mt!r}; "
                "supported codecs: dac_on_the_hub, encodec"
            )
        # geometry fields beyond the HF DACConfig surface (which fixes them to
        # the 44.1kHz descript model) are honored when present so non-standard
        # DAC variants round-trip through config.json
        dac_defaults = DACConfig()
        audio_encoder = DACConfig(
            num_codebooks=ae.get("num_codebooks", 9),
            codebook_size=ae.get("codebook_size", 1024),
            codebook_dim=ae.get("codebook_dim", dac_defaults.codebook_dim),
            latent_dim=ae.get("latent_dim", 1024),
            encoder_dim=ae.get("encoder_dim", dac_defaults.encoder_dim),
            encoder_rates=tuple(ae.get("encoder_rates", dac_defaults.encoder_rates)),
            decoder_dim=ae.get("decoder_dim", dac_defaults.decoder_dim),
            decoder_rates=tuple(ae.get("decoder_rates", dac_defaults.decoder_rates)),
            frame_rate=int(ae.get("frame_rate", 86)),
            sampling_rate=ae.get("sampling_rate", 44100),
        )
    return ParlerTTSConfig(
        text_encoder=T5Config(
            vocab_size=te["vocab_size"],
            d_model=te["d_model"],
            d_kv=te["d_kv"],
            d_ff=te["d_ff"],
            num_layers=te["num_layers"],
            num_heads=te["num_heads"],
            relative_attention_num_buckets=te.get("relative_attention_num_buckets", 32),
            relative_attention_max_distance=te.get("relative_attention_max_distance", 128),
            # HF T5Config's default is "relu"; only flan checkpoints write
            # "gated-gelu". Mirror HF here or minimal config.json files load
            # a gated tower against non-gated weights.
            feed_forward_proj=te.get("feed_forward_proj", "relu"),
            dropout_rate=te.get("dropout_rate", 0.1),
        ),
        audio_encoder=audio_encoder,
        decoder=DecoderConfig(
            vocab_size=de["vocab_size"],
            max_position_embeddings=de.get("max_position_embeddings", 4096),
            num_hidden_layers=de["num_hidden_layers"],
            ffn_dim=de["ffn_dim"],
            num_attention_heads=de["num_attention_heads"],
            num_key_value_heads=de.get("num_key_value_heads"),
            num_cross_attention_key_value_heads=de.get("num_cross_attention_key_value_heads"),
            activation_function=de.get("activation_function", "gelu"),
            hidden_size=de["hidden_size"],
            dropout=de.get("dropout", 0.1),
            num_codebooks=de.get("num_codebooks", 9),
            pad_token_id=de.get("pad_token_id", 1024),
            bos_token_id=de.get("bos_token_id", 1025),
            eos_token_id=de.get("eos_token_id", 1024),
            rope_embeddings=de.get("rope_embeddings", False),
            rope_theta=de.get("rope_theta", 10000.0),
            sliding_window=de.get("sliding_window"),
            use_fused_lm_heads=de.get("use_fused_lm_heads", False),
            codebook_weights=tuple(de["codebook_weights"]) if de.get("codebook_weights") else None,
        ),
        vocab_size=raw.get("vocab_size", 32128),
        prompt_cross_attention=raw.get("prompt_cross_attention", False),
        pad_token_id=raw.get("pad_token_id", 1024),
        decoder_start_token_id=raw.get("decoder_start_token_id", 1025),
    )


def load_safetensors_dir(path: str) -> dict:
    """Load all tensors from (possibly sharded) safetensors in a directory."""
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    tensors = {}
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


class ParlerTTSPipeline:
    """End-to-end TTS: (description, prompt) -> waveform.

    Mirrors the reference usage pattern (README.md:30-55):
        pipe = ParlerTTSPipeline.from_pretrained(path)
        audio, lengths = pipe.generate(["a calm female voice"], ["Hello world"])
    """

    def __init__(
        self,
        model: ParlerTTS,
        params: Any,
        dac: DACModel,
        dac_params: Any,
        generation_config: Optional[GenerationConfig] = None,
        tokenizer: Any = None,
        frame_bucket: int = 256,
        pad_to_multiple: int = 16,
        fused_decode: bool = False,
        fused_qkv: bool = False,
        speculative_window: Optional[int] = None,
        speculative_per_row: bool = False,
        speculative_lookup: int = 3,
        codec_dtype: Any = None,
    ):
        from ..utils.compile_cache import enable_compilation_cache

        # one-time-per-machine compile cost: persist compiled executables
        enable_compilation_cache()
        if fused_qkv:
            # serving transform: one q|k|v matmul per decoder layer (fewer
            # serial dispatches per decode step — the B=1 bottleneck,
            # INFERENCE.md profile); bias-free so numerics are identical
            assert not fused_decode, "fused_qkv and fused_decode are exclusive"
            if getattr(model, "weight_quant", False):
                # quantized projections hold w_q + per-channel scales, not
                # 'kernel' — concatenation would also need scale merging
                raise ValueError("fused_qkv does not support weight_quant models")
            from ..models.parler import fuse_qkv_params

            model = model.clone(fused_qkv=True)
            params = fuse_qkv_params(params)
        self.model = model
        # pin params on device ONCE: numpy param trees (checkpoint loads,
        # quantization transforms) would otherwise re-upload every leaf on
        # every jit dispatch (~700 DevicePuts/call through the TPU tunnel)
        self.params = jax.device_put(params)
        self.dac = dac
        self.dac_params = jax.device_put(dac_params)
        self.config = model.config
        self.tokenizer = tokenizer
        self.frame_bucket = frame_bucket
        self.pad_to_multiple = pad_to_multiple
        dcfg = model.config.decoder
        self.generation_config = generation_config or GenerationConfig(
            bos_token_id=dcfg.bos_token_id,
            pad_token_id=dcfg.pad_token_id,
            eos_token_id=dcfg.eos_token_id,
        )
        self._generate_fn = make_generate(model, self.generation_config)
        # opt-in serving mode: B=1 decode steps run as ONE Pallas megakernel
        # (int8 weights, ~10% lower step latency; ops/pallas/fused_decode_step.py)
        self._fused = None
        self._generate_fused_fn = None
        if fused_decode:
            from ..ops.pallas.fused_decode_step import prepare_fused_params
            from .generate import make_generate_fused

            self._fused = jax.device_put(
                prepare_fused_params(
                    jax.tree.map(np.asarray, self.params)["decoder"]["decoder"],
                    model.config.decoder,
                )
            )
            self._generate_fused_fn = make_generate_fused(model, self.generation_config)
        # opt-in serving mode: speculative multi-column decoding
        # (runtime/speculative.py) — W candidate columns verified per forward.
        # Greedy output is token-identical to the plain loop; sampling is
        # distribution-preserving (different rng consumption). The accepted
        # column count per forward is data/checkpoint-dependent; stats from
        # the last call land in `self.last_spec_stats`.
        self._generate_spec_fn = None
        self._spec_window = speculative_window
        self._spec_per_row = speculative_per_row
        # greedy draft source: history n-gram lookup with Jacobi fallback
        # (speculative.lookup_candidates; 0 disables)
        self._spec_lookup = speculative_lookup
        self.last_spec_stats = None
        if speculative_per_row and speculative_window is None:
            raise ValueError(
                "speculative_per_row=True requires speculative_window "
                "(per-row advance is a property of the speculative decoder)"
            )
        if speculative_window is not None:
            assert not fused_decode, (
                "speculative_window and fused_decode are exclusive"
            )
            from .speculative import make_generate_speculative

            # per_row: each batch row advances by its OWN accepted prefix
            # (runtime/speculative.py) — keeps the B=1 acceptance rate at any
            # batch size, the batched-serving configuration.
            self._generate_spec_fn = make_generate_speculative(
                model, self.generation_config, window=speculative_window,
                per_row=speculative_per_row, lookup_ngram=speculative_lookup,
            )
        self._stream_fns = None
        # opt-in serving mode: run the DAC decode conv stack in a reduced
        # dtype (codec_dtype=jnp.bfloat16 halves its HBM traffic; the decode
        # is the non-loop share of e2e latency). Audio is returned fp32; the
        # ENCODE path (voice steering) keeps the original fp32 params so code
        # assignment (quantizer argmin) is unaffected. Waveform deviation vs
        # fp32 decode is tested at tolerance (tests/test_dac_codec.py).
        if codec_dtype is not None:
            from ..utils.dtypes import cast_floating

            self._dac_params_decode = jax.device_put(
                cast_floating(self.dac_params, codec_dtype)
            )
        else:
            self._dac_params_decode = self.dac_params
        # jax.jit caches one compiled program per codes shape; bucketing keeps
        # the number of shapes small
        self._decode_jit = jax.jit(
            lambda dac_params, codes: self.dac.apply(
                {"params": dac_params}, codes, method="decode"
            ).astype(jnp.float32)
        )

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_pretrained(
        cls,
        path: str,
        generation_config: Optional[GenerationConfig] = None,
        tokenizer: Any = None,
        **kw,
    ) -> "ParlerTTSPipeline":
        """Load a checkpoint directory.

        Two layouts are accepted:
          - HF format: config.json + (sharded) safetensors holding
            text_encoder./decoder./audio_encoder. tensors (what
            `parler-tts-mini-v1` ships and what utils/hf_export writes);
          - native format: config.json + params.pkl (+ dac_params.pkl /
            generation_config.json), as written by the helpers/init scripts
            and `save_pretrained`.
        """
        import pickle

        with open(os.path.join(path, "config.json")) as f:
            raw_cfg = f.read()
        native = os.path.exists(os.path.join(path, "params.pkl"))
        if native:
            cfg = ParlerTTSConfig.from_json(raw_cfg)
            with open(os.path.join(path, "params.pkl"), "rb") as f:
                params = pickle.load(f)
            dac_path = os.path.join(path, "dac_params.pkl")
            if os.path.exists(dac_path):
                with open(dac_path, "rb") as f:
                    dac_params = pickle.load(f)
            else:
                dac_params = init_codec_params(
                    build_codec(cfg.audio_encoder), cfg.audio_encoder,
                    jax.random.key(0),
                )
        else:
            cfg = load_hf_config(path)
            tensors = load_safetensors_dir(path)
            params = convert_composite_params(tensors, cfg)
            dac_params = convert_codec_params(tensors, cfg.audio_encoder)
        gen_path = os.path.join(path, "generation_config.json")
        if generation_config is None and os.path.exists(gen_path):
            with open(gen_path) as f:
                raw = json.load(f)
            fields = {f.name for f in __import__("dataclasses").fields(GenerationConfig)}
            generation_config = GenerationConfig(
                **{k: v for k, v in raw.items() if k in fields}
            )
        model = ParlerTTS(cfg)
        dac = build_codec(cfg.audio_encoder)
        if tokenizer is None:
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(path)
            except Exception:
                tokenizer = None
        return cls(model, params, dac, dac_params, generation_config, tokenizer, **kw)

    def save_pretrained(self, path: str) -> None:
        """Write the native checkpoint layout (config.json + params.pkl +
        dac_params.pkl + generation_config.json)."""
        import dataclasses
        import pickle

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(self.config.to_json())
        with open(os.path.join(path, "generation_config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.generation_config), f, indent=2)
        with open(os.path.join(path, "params.pkl"), "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, self.params), f)
        with open(os.path.join(path, "dac_params.pkl"), "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, self.dac_params), f)

    @classmethod
    def from_random(
        cls,
        config: ParlerTTSConfig,
        seed: int = 0,
        generation_config: Optional[GenerationConfig] = None,
        **kw,
    ) -> "ParlerTTSPipeline":
        """Randomly initialized pipeline (dev/bench; reference init scripts parity)."""
        model = ParlerTTS(config)
        k1, k2 = jax.random.split(jax.random.key(seed))
        params = model.init(
            k1,
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
            jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
            jnp.zeros((1, 2, config.decoder.num_codebooks), jnp.int32),
        )["params"]
        dac = build_codec(config.audio_encoder)
        # full roundtrip init so both encode (voice steering, training stage 1)
        # and decode paths have params
        dac_params = init_codec_params(dac, config.audio_encoder, k2)
        return cls(model, params, dac, dac_params, generation_config, **kw)

    # -------------------------------------------------------------- tokenizing
    def _encode_text(self, texts: Sequence[str], left_pad: bool) -> Tuple[np.ndarray, np.ndarray]:
        if self.tokenizer is None:
            raise ValueError("pipeline has no tokenizer; pass token ids directly")
        enc = self.tokenizer(list(texts))
        ids_list = enc["input_ids"]
        max_len = _round_up(max(len(x) for x in ids_list), self.pad_to_multiple)
        ids = np.zeros((len(ids_list), max_len), np.int32)
        mask = np.zeros((len(ids_list), max_len), np.int32)
        for i, x in enumerate(ids_list):
            if left_pad:  # prompts pad left (reference arguments.py:91-96)
                ids[i, max_len - len(x):] = x
                mask[i, max_len - len(x):] = 1
            else:
                ids[i, : len(x)] = x
                mask[i, : len(x)] = 1
        return ids, mask

    # -------------------------------------------------------------- generation
    def generate_codes(
        self,
        desc_ids: np.ndarray,
        desc_mask: Optional[np.ndarray],
        prompt_ids: np.ndarray,
        prompt_mask: Optional[np.ndarray],
        seed: int = 0,
        decoder_prompt_codes: Optional[np.ndarray] = None,
    ):
        n = self.generation_config.num_return_sequences
        if n > 1:
            if not self.generation_config.do_sample:
                raise ValueError(
                    "num_return_sequences > 1 requires do_sample=True "
                    "(greedy search returns one sequence per input)"
                )
            rep = lambda x: None if x is None else np.repeat(np.asarray(x), n, axis=0)
            desc_ids, desc_mask = rep(desc_ids), rep(desc_mask)
            prompt_ids, prompt_mask = rep(prompt_ids), rep(prompt_mask)
            decoder_prompt_codes = rep(decoder_prompt_codes)
        if self._generate_spec_fn is not None:
            out, stats = self._generate_spec_fn(
                self.params,
                jnp.asarray(desc_ids),
                jnp.asarray(desc_mask) if desc_mask is not None else None,
                jnp.asarray(prompt_ids),
                jnp.asarray(prompt_mask) if prompt_mask is not None else None,
                jax.random.key(seed),
                jnp.asarray(decoder_prompt_codes)
                if decoder_prompt_codes is not None
                else None,
            )
            self.last_spec_stats = stats
            return out
        if self._generate_fused_fn is not None and np.asarray(desc_ids).shape[0] == 1:
            return self._generate_fused_fn(
                self.params,
                self._fused,
                jnp.asarray(desc_ids),
                jnp.asarray(desc_mask) if desc_mask is not None else None,
                jnp.asarray(prompt_ids),
                jnp.asarray(prompt_mask) if prompt_mask is not None else None,
                jax.random.key(seed),
                jnp.asarray(decoder_prompt_codes)
                if decoder_prompt_codes is not None
                else None,
            )
        out = self._generate_fn(
            self.params,
            jnp.asarray(desc_ids),
            jnp.asarray(desc_mask) if desc_mask is not None else None,
            jnp.asarray(prompt_ids),
            jnp.asarray(prompt_mask) if prompt_mask is not None else None,
            jax.random.key(seed),
            jnp.asarray(decoder_prompt_codes)
            if decoder_prompt_codes is not None
            else None,
        )
        return out

    def encode_voice_prompt(
        self, audio: np.ndarray, return_scales: bool = False
    ):
        """Raw waveform (B, T) or (T,) -> codec codes (B, K, T/hop) for voice
        steering (reference `_prepare_audio_encoder_kwargs_for_generation`,
        modeling:3136-3194). With `return_scales=True` also returns the codec's
        per-clip `audio_scales` (B,) — required for scale-normalized Encodec
        checkpoints (reference modeling:3174-3192): pass them back through
        `generate(..., audio_scales=...)` / `decode_codes(...)` so the output
        amplitude is restored, exactly like the reference threads them."""
        normalize = getattr(self.config.audio_encoder, "normalize", False)
        if normalize and not return_scales:
            raise ValueError(
                "this codec is scale-normalized (Encodec normalize=True): "
                "call encode_voice_prompt(audio, return_scales=True) and pass "
                "the scales to generate(..., audio_scales=...) — dropping "
                "them would silently produce wrongly-scaled audio"
            )
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        ch = codec_channels(self.config.audio_encoder)
        if audio.ndim == 2:  # (B, T) mono input: replicate across codec channels
            audio = np.repeat(audio[:, :, None], ch, axis=2)
        hop = self.config.audio_encoder.hop_length
        t_pad = ((audio.shape[1] + hop - 1) // hop) * hop
        padded = np.zeros((audio.shape[0], t_pad, ch), np.float32)
        padded[:, : audio.shape[1]] = audio
        if return_scales:
            method = "encode_with_scale" if normalize else "encode"
            encode = self._encode_jit(method)
            if normalize:
                codes, scales = encode(self.dac_params, jnp.asarray(padded))
                return np.asarray(codes), np.asarray(scales)
            codes = encode(self.dac_params, jnp.asarray(padded))
            return np.asarray(codes), np.ones((codes.shape[0],), np.float32)
        return np.asarray(
            self._encode_jit("encode")(self.dac_params, jnp.asarray(padded))
        )

    def _encode_jit(self, method: str):
        """One jitted codec-encode per apply-method, cached on the pipeline —
        a fresh `jax.jit(lambda ...)` per call would re-trace every time
        (jit caches by function identity)."""
        cache = getattr(self, "_encode_jits", None)
        if cache is None:
            cache = self._encode_jits = {}
        fn = cache.get(method)
        if fn is None:
            fn = cache[method] = jax.jit(
                lambda p, a: self.dac.apply({"params": p}, a, method=method)
            )
        return fn

    def decode_codes(self, codes: jnp.ndarray, lengths: jnp.ndarray,
                     audio_scales: Optional[np.ndarray] = None):
        """Bucketed DAC decode: (B, K, T) codes -> (B, samples) waveform +
        lengths. `audio_scales` (B,) re-applies Encodec encode normalization
        (reference modeling:3603-3607)."""
        hop = self.config.audio_encoder.hop_length
        max_frames = int(jnp.max(lengths))
        if max_frames == 0:
            b = codes.shape[0]
            return np.zeros((b, hop), np.float32), np.zeros((b,), np.int64)
        bucket = min(_round_up(max_frames, self.frame_bucket), codes.shape[-1])
        # invalid tail tokens would index OOB into codebooks; clamp to 0 (those
        # samples are trimmed by `lengths` anyway)
        sliced = jnp.clip(codes[:, :, :bucket], 0, self.config.audio_encoder.codebook_size - 1)
        audio = self._decode_jit(self._dac_params_decode, sliced)  # (B, T*hop, C)
        if audio_scales is not None:
            audio = audio * jnp.asarray(audio_scales, audio.dtype)[:, None, None]
        if audio.shape[-1] == 1:
            return np.asarray(audio[:, :, 0]), np.asarray(lengths) * hop
        # stereo codecs: interleave channels, PCM-style (samples = frames*hop*C —
        # the reference flattens stereo the same way, modeling:2839-2842)
        b = audio.shape[0]
        flat = np.asarray(audio).reshape(b, -1)
        return flat, np.asarray(lengths) * hop * audio.shape[-1]

    def generate(
        self,
        description: Union[str, Sequence[str], np.ndarray],
        prompt: Union[str, Sequence[str], np.ndarray],
        desc_mask: Optional[np.ndarray] = None,
        prompt_mask: Optional[np.ndarray] = None,
        seed: int = 0,
        decoder_prompt_codes: Optional[np.ndarray] = None,
        audio_scales: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (waveform (B, samples), audio_lengths (B,)) — the reference's
        `generate(...)` + `audios_length` outputs (modeling:3648-3653).
        `decoder_prompt_codes` (B, K, T0) steers the voice (the reference's
        `input_values` audio prompt, modeling:2826-2843); `audio_scales` (B,)
        from `encode_voice_prompt(..., return_scales=True)` restores amplitude
        for scale-normalized Encodec checkpoints (modeling:3603-3607)."""
        if isinstance(description, str):
            description = [description]
        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(description, (list, tuple)):
            desc_ids, desc_mask = self._encode_text(description, left_pad=False)
        else:
            desc_ids = description
        if isinstance(prompt, (list, tuple)):
            prompt_ids, prompt_mask = self._encode_text(prompt, left_pad=True)
        else:
            prompt_ids = prompt
        out = self.generate_codes(
            desc_ids, desc_mask, prompt_ids, prompt_mask, seed,
            decoder_prompt_codes=decoder_prompt_codes,
        )
        return self.decode_codes(out.codes, out.lengths,
                                 audio_scales=audio_scales)

    # --------------------------------------------------------------- streaming

    def _ensure_stream_fns(self):
        """Lazy (prefill, chunk-step) pair; speculative when the pipeline was
        built with `speculative_window` (each flush then advances >= play_steps
        columns in ~play_steps/cols-per-forward forwards)."""
        if self._stream_fns is None:
            if self._spec_window is not None:
                from .speculative import make_stream_functions_speculative

                self._stream_fns = make_stream_functions_speculative(
                    self.model, self.generation_config,
                    window=self._spec_window, per_row=self._spec_per_row,
                    lookup_ngram=self._spec_lookup,
                )
            else:
                self._stream_fns = make_stream_functions(
                    self.model, self.generation_config
                )
        return self._stream_fns

    def warmup_stream_async(
        self,
        desc_ids: np.ndarray,
        desc_mask: Optional[np.ndarray],
        prompt_ids: np.ndarray,
        prompt_mask: Optional[np.ndarray],
        play_steps: int = 86,
        **stream_kwargs,
    ):
        """Compile the streaming programs (prefill, chunk step, first-flush
        codec-decode bucket) on a background thread by running one flush with
        the given input SHAPES (values don't matter for compilation).

        Cold-start mitigation: XLA compilation releases the GIL, so a server
        can overlap this with its offline-path warmup instead of paying the
        stream compile serially on the first user request (with the shipped
        compile cache the "compile" is a deserialize and this finishes in
        seconds). Returns the started `threading.Thread`; `join()` it before
        serving streams.
        """
        import threading

        def _run():
            for _ in self.stream(
                desc_ids, desc_mask, prompt_ids, prompt_mask,
                play_steps=play_steps, **stream_kwargs,
            ):
                break

        class _WarmupThread(threading.Thread):
            """join() re-raises a warmup failure instead of silently
            returning — a server must not serve believing the stream
            programs are warm when the flush died (compile error, OOM)."""

            exc: Optional[BaseException] = None

            def run(self):
                try:
                    _run()
                except BaseException as e:  # surfaced at join()
                    self.exc = e

            def join(self, timeout=None):
                super().join(timeout)
                if self.exc is not None:
                    raise RuntimeError("stream warmup failed") from self.exc

        t = _WarmupThread(daemon=True, name="parler-stream-warmup")
        t.start()
        return t

    def stream(
        self,
        desc_ids: np.ndarray,
        desc_mask: Optional[np.ndarray],
        prompt_ids: np.ndarray,
        prompt_mask: Optional[np.ndarray],
        play_steps: int = 86,
        seed: int = 0,
        decoder_prompt_codes: Optional[np.ndarray] = None,
        incremental: bool = True,
        context_frames: int = 64,
    ):
        """Yield waveform chunks as generation progresses.

        Chunking semantics follow `ParlerTTSStreamer`
        (`/root/reference/parler_tts/streamer.py:66-131`): every `play_steps`
        new tokens, un-delay + codec-decode and emit the new samples, holding
        back `stride` samples for smooth chunk joins.

        `incremental=True` (default, a TPU improvement over the reference's
        O(T^2) full-prefix re-decode, streamer.py:93-104): each flush decodes
        only a trailing WINDOW of frames — the new frames plus `context_frames`
        of history covering the conv stack's receptive field — so per-flush
        codec cost is O(play_steps + context), constant over the utterance, and
        every flush reuses ONE compiled decode shape. Emitted samples always
        sit >= context_frames past the window edge, where boundary effects from
        the missing earlier history have fully decayed.
        """
        from ..ops.delay_pattern import undelay_pattern, valid_frame_lengths

        if self._spec_per_row and np.shape(desc_ids)[0] > 1:
            raise ValueError(
                "stream() is the single-stream surface; with "
                "speculative_per_row=True and B>1 use stream_batch(), which "
                "gates flushes on the slowest active row and masks unverified "
                "window candidates per row"
            )
        prefill_fn, step_fn = self._ensure_stream_fns()
        dcfg = self.config.decoder
        hop = self.config.audio_encoder.hop_length
        stride = hop * max(play_steps - dcfg.num_codebooks, 1) // 6  # streamer.py:53-57

        state = prefill_fn(
            self.params,
            jnp.asarray(desc_ids),
            jnp.asarray(desc_mask) if desc_mask is not None else None,
            jnp.asarray(prompt_ids),
            jnp.asarray(prompt_mask) if prompt_mask is not None else None,
            jax.random.key(seed),
            jnp.asarray(decoder_prompt_codes)
            if decoder_prompt_codes is not None
            else None,
        )
        max_len = self.generation_config.max_length
        to_yield = 0
        t_start = int(np.max(np.asarray(state.t)))
        while True:
            state = step_fn(self.params, state, play_steps)
            # max(): a per-row speculative pipeline carries a (1,) pointer here
            t_raw = int(np.max(np.asarray(state.t)))
            done = t_raw >= max_len or bool(jnp.all(state.eos.eos_seen))
            # speculative chunk steps overshoot by up to window-1 columns;
            # clamp the VISIBLE column count to the play_steps grid so flush
            # boundaries (and codec-decode bucket shapes) are identical to
            # plain streaming — hidden columns surface on the next flush,
            # and `done` reveals everything
            t = t_raw if done else (
                t_start + (t_raw - t_start) // play_steps * play_steps
            )
            if t <= dcfg.num_codebooks:
                if done:
                    return
                continue
            codes = undelay_pattern(state.out_ids[:, :, :t], dcfg.num_codebooks)
            lengths = valid_frame_lengths(codes, dcfg.pad_token_id)
            n = int(lengths[0])
            if n == 0:
                if done:
                    return
                continue
            audio, base = self._decode_stream_window(
                codes, n, to_yield, play_steps, incremental, context_frames
            )
            total = base + audio.shape[1]
            if done:
                if total > to_yield:
                    yield audio[:, to_yield - base :]
                return
            upper = max(total - stride, to_yield)
            if upper > to_yield:
                yield audio[:, to_yield - base : upper - base]
                to_yield = upper

    def _decode_stream_window(self, codes, n, to_yield, play_steps,
                              incremental, context_frames):
        """Codec-decode the frames needed for the next flush.

        incremental: decode only the trailing window [w0, n) with w0 far
        enough behind the first emitted sample that conv boundary effects
        from the missing earlier history are fully decayed. Returns
        (audio (B, S), base) where `base` is the sample offset of audio[:, 0].
        """
        hop = self.config.audio_encoder.hop_length
        cb_max = self.config.audio_encoder.codebook_size - 1
        w0 = max(0, to_yield // hop - context_frames) if incremental else 0
        m = min(_round_up(n - w0, play_steps), codes.shape[-1] - w0)
        window = jnp.clip(codes[:, :, w0 : w0 + m], 0, cb_max)
        audio = np.asarray(
            self._decode_jit(self._dac_params_decode, window)
        )[:, : (n - w0) * hop, 0]
        return audio, w0 * hop

    def stream_batch(
        self,
        desc_ids: np.ndarray,
        desc_mask: Optional[np.ndarray],
        prompt_ids: np.ndarray,
        prompt_mask: Optional[np.ndarray],
        play_steps: int = 86,
        seed: int = 0,
        decoder_prompt_codes: Optional[np.ndarray] = None,
        incremental: bool = True,
        context_frames: int = 64,
    ):
        """Batched streaming — beyond the reference (its `ParlerTTSStreamer`
        is B=1 only, streamer.py:66): serve B concurrent streams from ONE
        compiled chunked program, amortizing the weight streaming that bounds
        single-stream decode. `decoder_prompt_codes` (B, K, T0) steers each
        stream's voice exactly as in `stream`/`generate_codes`.

        With `speculative_window` + `speculative_per_row=True` every stream
        advances by its own accepted prefix each forward; flushes are gated on
        the slowest active stream (min-of-sums beats the shared horizon's
        sum-of-mins), and faster streams buffer finalized columns that surface
        as the gate advances.

        Yields `(chunk, valid)` pairs on a uniform sample grid: `chunk` is
        (B, S) waveform and `valid[i]` counts how many of this chunk's S
        samples are real for stream i (0 after stream i finished; trailing
        chunks keep flowing until the longest stream ends). Stride holdback
        and the incremental decode window work exactly as in `stream`.
        """
        from ..ops.delay_pattern import undelay_pattern, valid_frame_lengths

        prefill_fn, step_fn = self._ensure_stream_fns()
        dcfg = self.config.decoder
        hop = self.config.audio_encoder.hop_length
        stride = hop * max(play_steps - dcfg.num_codebooks, 1) // 6

        state = prefill_fn(
            self.params,
            jnp.asarray(desc_ids),
            jnp.asarray(desc_mask) if desc_mask is not None else None,
            jnp.asarray(prompt_ids),
            jnp.asarray(prompt_mask) if prompt_mask is not None else None,
            jax.random.key(seed),
            jnp.asarray(decoder_prompt_codes)
            if decoder_prompt_codes is not None
            else None,
        )
        max_len = self.generation_config.max_length
        gen_pad = self.generation_config.pad_token_id
        to_yield = 0
        t_start = int(np.min(np.asarray(state.t)))
        while True:
            state = step_fn(self.params, state, play_steps)
            t_arr = np.asarray(state.t)
            per_row = t_arr.ndim == 1  # per-row speculation: (B,) pointers
            if per_row:
                eos_rows = np.asarray(jnp.all(state.eos.eos_seen, axis=1))
                row_done = (t_arr >= max_len) | eos_rows
                done = bool(row_done.all())
                # visible-column clamp to the play_steps grid, per row
                t_vis = np.where(
                    row_done, t_arr,
                    t_start + (t_arr - t_start) // play_steps * play_steps,
                )
                t = int(t_vis.max())
            else:
                t_raw = int(t_arr)
                done = t_raw >= max_len or bool(jnp.all(state.eos.eos_seen))
                # same visible-column clamping as `stream` (spec overshoot)
                t = t_raw if done else (
                    t_start + (t_raw - t_start) // play_steps * play_steps
                )
            if t <= dcfg.num_codebooks:
                if done:
                    return
                continue
            out_cols = state.out_ids[:, :, :t]
            if per_row:
                # a row's columns beyond its OWN pointer hold unverified
                # window candidates — restore the pattern tail (PAD) there,
                # exactly as the offline finalizer does, before un-delaying
                pat = state.pattern_ext[:, :, :t]
                tail = jnp.where(pat == -1, gen_pad, pat)
                cols = jnp.arange(t)[None, None, :]
                out_cols = jnp.where(
                    cols >= jnp.asarray(t_vis)[:, None, None], tail, out_cols
                )
            codes = undelay_pattern(out_cols, dcfg.num_codebooks)
            lengths = np.asarray(valid_frame_lengths(codes, dcfg.pad_token_id))
            n_max = int(lengths.max())
            if n_max == 0:
                if done:
                    return
                continue
            # flush gate: emitted samples must be final for every stream, so
            # the slowest ACTIVE row bounds the frontier (finished rows don't
            # gate; faster rows' buffered columns surface as the gate moves)
            if per_row and not done:  # not done => some row is still active
                n_emit = int(lengths[~row_done].min())
                if n_emit == 0:
                    continue
            else:
                n_emit = n_max
            audio, base = self._decode_stream_window(
                codes, n_emit, to_yield, play_steps, incremental, context_frames
            )
            total = base + audio.shape[1]  # == n_emit * hop
            upper = total if done else max(total - stride, to_yield)
            if upper > to_yield:
                width = upper - to_yield
                valid = np.clip(lengths * hop - to_yield, 0, width).astype(np.int64)
                yield audio[:, to_yield - base : upper - base], valid
                to_yield = upper
            if done:
                return

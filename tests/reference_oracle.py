"""Import helper for the reference implementation (oracle for parity tests).

The reference's package __init__ imports the external `dac` package, which is
not installed; stub it with an empty nn.Module so `DACModel` can instantiate
(the conv/VQ nets are never exercised — our tests mock `audio_encoder.decode`).
"""

import sys
import types


def import_reference_parler_tts():
    if "dac" not in sys.modules:
        import torch.nn as tnn

        dac = types.ModuleType("dac")
        dac_model = types.ModuleType("dac.model")

        class _StubDAC(tnn.Module):
            def __init__(self, n_codebooks=9, latent_dim=1024, codebook_size=1024, **kw):
                super().__init__()
                self.n_codebooks = n_codebooks
                self.latent_dim = latent_dim
                self.codebook_size = codebook_size

        dac_model.DAC = _StubDAC
        dac.model = dac_model
        sys.modules["dac"] = dac
        sys.modules["dac.model"] = dac_model
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import parler_tts  # noqa: F401

    return parler_tts


def make_reference_composite_class():
    """Reference composite class adapted to transformers>=4.50 API drift:

    - GenerationMixin is no longer inherited by PreTrainedModel; mix it back in;
    - `_get_initial_cache_position` is now called as (cur_len, device,
      model_kwargs); re-implement the reference's override (which sizes the
      prefill cache_position from the stashed decoder inputs_embeds =
      prompt + BOS column) under the new signature.
    """
    ref_pkg = import_reference_parler_tts()
    import torch
    from transformers.generation import GenerationMixin

    # transformers>=4.56 cache refactor: DynamicCache stores per-layer
    # `layers[i].keys/values`; the reference accesses `key_cache[i]`. Shim views.
    from transformers.cache_utils import DynamicCache

    if not hasattr(DynamicCache, "key_cache"):
        DynamicCache.key_cache = property(lambda self: [l.keys for l in self.layers])
        DynamicCache.value_cache = property(lambda self: [l.values for l in self.layers])

    class RefComposite(ref_pkg.ParlerTTSForConditionalGeneration, GenerationMixin):
        def _get_initial_cache_position(self, seq_length, device, model_kwargs):
            if model_kwargs.get("inputs_embeds") is not None:
                n = model_kwargs["inputs_embeds"].shape[1]
            else:
                n = seq_length
            cache_position = torch.arange(n, dtype=torch.int64, device=device)
            cache = model_kwargs.get("past_key_values")
            if cache is not None and hasattr(cache, "get_seq_length"):
                past = cache.get_seq_length() or 0
                cache_position = cache_position[past:]
            model_kwargs["cache_position"] = cache_position
            return model_kwargs

    return RefComposite


class DecodeCapture:
    """Mock `audio_encoder.decode` capturing the codes the generate loop emits."""

    def __init__(self, upsample=10):
        self.codes = []
        self.upsample = upsample

    def __call__(self, audio_codes, audio_scales=None, **kw):
        from types import SimpleNamespace

        import torch

        self.codes.append(audio_codes.clone())
        t = audio_codes.shape[-1]
        b = audio_codes.shape[1] if audio_codes.ndim == 4 else audio_codes.shape[0]
        return SimpleNamespace(audio_values=torch.zeros(b, 1, t * self.upsample))

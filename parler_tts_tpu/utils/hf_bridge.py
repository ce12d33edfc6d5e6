"""Weight-format bridge: HF/torch Parler-TTS checkpoints -> our params pytrees.

The reference persists weights via `save_pretrained` (safetensors / torch bin,
SURVEY.md §5 checkpoint notes). This module maps those tensors onto the stacked
TPU-native layouts:

  - K separate codebook embedding tables            -> one (K, vocab+1, D) array
  - per-codebook or fused LM heads                  -> one (K, D, V) array
  - torch Linear (out, in) weights                  -> flax (in, out) kernels
  - weight-normed DAC convs (g, v parametrization)  -> folded dense kernels
    (see codec/convert.py)

All functions take a flat `{name: np.ndarray}` dict so they work from either a
torch `state_dict()` or a safetensors file without importing torch here.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import DecoderConfig


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _ln(tensors: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(tensors[prefix + ".weight"]),
        "bias": np.asarray(tensors[prefix + ".bias"]),
    }


def _attn(tensors: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {
        "q_proj": {"kernel": _t(tensors[prefix + ".q_proj.weight"])},
        "k_proj": {"kernel": _t(tensors[prefix + ".k_proj.weight"])},
        "v_proj": {"kernel": _t(tensors[prefix + ".v_proj.weight"])},
        "out_proj": {"kernel": _t(tensors[prefix + ".out_proj.weight"])},
    }


def convert_decoder_params(
    tensors: Mapping[str, np.ndarray],
    config: DecoderConfig,
    prefix: str = "model.decoder.",
    lm_head_prefix: str = "",
) -> Dict:
    """Convert a `ParlerTTSForCausalLM` state dict to our `ParlerForCausalLM` params.

    `prefix` locates the decoder stack (`decoder.model.decoder.` inside the
    composite checkpoint); `lm_head_prefix` locates the lm heads (`decoder.` in
    the composite).
    """
    k = config.num_codebooks

    embed = np.stack(
        [np.asarray(tensors[f"{prefix}embed_tokens.{i}.weight"]) for i in range(k)]
    )  # (K, vocab+1, D)

    fused_key = f"{lm_head_prefix}lm_heads.weight"
    if fused_key in tensors:
        # fused head: (K*V, D) with row index k*V + v (reference modeling:1917-1920)
        w = np.asarray(tensors[fused_key])
        lm_heads = w.reshape(k, config.vocab_size, config.hidden_size).transpose(0, 2, 1)
    else:
        lm_heads = np.stack(
            [_t(np.asarray(tensors[f"{lm_head_prefix}lm_heads.{i}.weight"])) for i in range(k)]
        )  # (K, D, V)

    decoder: Dict = {"embed_tokens": embed, "layer_norm": _ln(tensors, f"{prefix}layer_norm")}
    for i in range(config.num_hidden_layers):
        lp = f"{prefix}layers.{i}."
        decoder[f"layers_{i}"] = {
            "self_attn": _attn(tensors, lp + "self_attn"),
            "self_attn_layer_norm": _ln(tensors, lp + "self_attn_layer_norm"),
            "encoder_attn": _attn(tensors, lp + "encoder_attn"),
            "encoder_attn_layer_norm": _ln(tensors, lp + "encoder_attn_layer_norm"),
            "fc1": {"kernel": _t(tensors[lp + "fc1.weight"])},
            "fc2": {"kernel": _t(tensors[lp + "fc2.weight"])},
            "final_layer_norm": _ln(tensors, lp + "final_layer_norm"),
        }

    return {"decoder": decoder, "lm_heads": lm_heads}


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to numpy (torch import stays at the call site)."""
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}

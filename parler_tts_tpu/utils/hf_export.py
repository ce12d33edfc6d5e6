"""Inverse weight bridge: our params pytrees -> HF/torch Parler-TTS layout.

Mirrors `hf_bridge.convert_*` in the opposite direction so trained TPU
checkpoints can be loaded by the reference implementation
(`ParlerTTSForConditionalGeneration.from_pretrained`). Stacked layouts are
unstacked back into per-codebook tables/heads and flax (in, out) kernels are
transposed to torch (out, in).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import ParlerTTSConfig, T5Config


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _ln(tree, out: Dict[str, np.ndarray], prefix: str):
    out[prefix + ".weight"] = np.asarray(tree["scale"])
    out[prefix + ".bias"] = np.asarray(tree["bias"])


def _attn(tree, out: Dict[str, np.ndarray], prefix: str):
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        out[f"{prefix}.{name}.weight"] = _t(tree[name]["kernel"])


def export_decoder_to_hf_tensors(
    params: Dict, config, prefix: str = "model.decoder.", lm_head_prefix: str = ""
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    dec = params["decoder"]
    embed = np.asarray(dec["embed_tokens"])  # (K, rows, D)
    for k in range(config.num_codebooks):
        out[f"{prefix}embed_tokens.{k}.weight"] = embed[k]
    _ln(dec["layer_norm"], out, f"{prefix}layer_norm")
    for i in range(config.num_hidden_layers):
        lp = f"{prefix}layers.{i}"
        layer = dec[f"layers_{i}"]
        _attn(layer["self_attn"], out, f"{lp}.self_attn")
        _ln(layer["self_attn_layer_norm"], out, f"{lp}.self_attn_layer_norm")
        _attn(layer["encoder_attn"], out, f"{lp}.encoder_attn")
        _ln(layer["encoder_attn_layer_norm"], out, f"{lp}.encoder_attn_layer_norm")
        out[f"{lp}.fc1.weight"] = _t(layer["fc1"]["kernel"])
        out[f"{lp}.fc2.weight"] = _t(layer["fc2"]["kernel"])
        _ln(layer["final_layer_norm"], out, f"{lp}.final_layer_norm")
    heads = np.asarray(params["lm_heads"])  # (K, D, V)
    for k in range(config.num_codebooks):
        out[f"{lm_head_prefix}lm_heads.{k}.weight"] = _t(heads[k])
    return out


def export_t5_to_hf_tensors(
    params: Dict, config: T5Config, prefix: str = ""
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        prefix + "shared.weight": np.asarray(params["shared_embedding"]),
        prefix + "encoder.embed_tokens.weight": np.asarray(params["shared_embedding"]),
        prefix
        + "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": np.asarray(
            params["relative_attention_bias"]
        ),
        prefix + "encoder.final_layer_norm.weight": np.asarray(
            params["final_layer_norm"]["weight"]
        ),
    }
    for i in range(config.num_layers):
        bp = f"{prefix}encoder.block.{i}."
        block = params[f"block_{i}"]
        for name in ("q", "k", "v", "o"):
            out[bp + f"layer.0.SelfAttention.{name}.weight"] = _t(
                block["attention"][name]["kernel"]
            )
        out[bp + "layer.0.layer_norm.weight"] = np.asarray(block["ln_attn"]["weight"])
        if config.is_gated_act:
            for name in ("wi_0", "wi_1", "wo"):
                out[bp + f"layer.1.DenseReluDense.{name}.weight"] = _t(
                    block["ff"][name]["kernel"]
                )
        else:
            for name in ("wi", "wo"):
                out[bp + f"layer.1.DenseReluDense.{name}.weight"] = _t(
                    block["ff"][name]["kernel"]
                )
        out[bp + "layer.1.layer_norm.weight"] = np.asarray(block["ln_ff"]["weight"])
    return out


def export_composite_to_hf_tensors(
    params: Dict, config: ParlerTTSConfig
) -> Dict[str, np.ndarray]:
    out = export_t5_to_hf_tensors(params["text_encoder"], config.text_encoder, "text_encoder.")
    out.update(
        export_decoder_to_hf_tensors(
            params["decoder"], config.decoder,
            prefix="decoder.model.decoder.", lm_head_prefix="decoder.",
        )
    )
    out["embed_prompts.weight"] = np.asarray(params["embed_prompts"]["embedding"])
    if "enc_to_dec_proj" in params:
        out["enc_to_dec_proj.weight"] = _t(params["enc_to_dec_proj"]["kernel"])
        out["enc_to_dec_proj.bias"] = np.asarray(params["enc_to_dec_proj"]["bias"])
    return out

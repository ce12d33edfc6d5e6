"""Int8 weight-only quantization for serving.

The B=1 decode loop is weight-bandwidth-bound (see the profiler breakdown in
INFERENCE.md); int8 weights halve HBM traffic versus bf16. Symmetric
per-output-channel scales keep logits near-lossless:

    w_q[i, o] = round(w[i, o] / scale[o]),  scale[o] = max_i |w[i, o]| / 127

The dequant multiply folds into the matmul epilogue (XLA fuses it); ints are
cast to bf16 in-register after the 1-byte HBM read.

Scope: the decoder's hot matmuls (attention projections, MLP, LM heads).
Embeddings, layer norms and the one-shot T5/cross-kv projections stay bf16.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(w: np.ndarray) -> Dict[str, np.ndarray]:
    """(in, out) float kernel -> {'w_q': int8 (in, out), 'scale': (out,) f32}."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return {"w_q": w_q, "scale": scale.astype(np.float32)}


def quantize_stacked_heads(w: np.ndarray) -> Dict[str, np.ndarray]:
    """(K, D, V) lm_heads -> {'w_q': int8 (K, D, V), 'scale': (K, 1, V) f32}."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=1, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "scale": scale.astype(np.float32)}


_QUANT_DENSE_NAMES = {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"}


def quantize_decoder_params(params: Any) -> Any:
    """Transform a `ParlerTTS` (or `ParlerForCausalLM`) params tree into the
    layout expected by the modules built with `weight_quant=True`."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if (
                    k in _QUANT_DENSE_NAMES
                    and isinstance(v, dict)
                    and "kernel" in v
                    and any(p.startswith("layers_") for p in path)
                ):
                    out[k] = quantize_kernel(np.asarray(v["kernel"]))
                else:
                    out[k] = walk(v, path + (k,))
            return out
        return tree

    return walk(jax.tree.map(np.asarray, params))


def dequantize_for_reference(qtree: Dict) -> jnp.ndarray:
    """{'w_q','scale'} -> float kernel (tests)."""
    return jnp.asarray(qtree["w_q"], jnp.float32) * jnp.asarray(qtree["scale"])

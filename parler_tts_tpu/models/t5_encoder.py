"""Encoder-only T5 (the frozen Flan-T5 description encoder) in JAX.

The reference consumes it from HF transformers (torch); SURVEY.md §7 item 3
requires a native JAX implementation with relative-position-bias attention for
encoder parity. Checkpoints: parler-mini-v1 ships flan-t5-base weights inside
the composite checkpoint under `text_encoder.*`.

T5 specifics honored here:
  - T5LayerNorm is RMS-norm (no mean subtraction, no bias);
  - attention has NO 1/sqrt(d) scaling (folded into initialization);
  - a single learned relative-position-bias table (block 0) is shared by all
    layers, bidirectional bucketing for the encoder;
  - flan variants use gated-gelu MLPs (wi_0 * gelu -> wi_1).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5Config


def relative_position_bucket(
    relative_position: jnp.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing (encoder form)."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + 1e-6)
        return (scale * x).astype(self.dtype)


class T5SelfAttention(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask_bias):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner if name != "o" else cfg.d_model,  # noqa: E731
                                      use_bias=False, dtype=self.dtype, name=name)
        b, t, _ = x.shape
        q = dense("q")(x).reshape(b, t, cfg.num_heads, cfg.d_kv)
        k = dense("k")(x).reshape(b, t, cfg.num_heads, cfg.d_kv)
        v = dense("v")(x).reshape(b, t, cfg.num_heads, cfg.d_kv)
        # NO 1/sqrt(d) scaling in T5.
        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores + position_bias
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, inner)
        return dense("o")(out)


class T5FeedForward(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        act = {
            "gelu": lambda y: jax.nn.gelu(y, approximate=True),  # HF t5 "gelu_new"
            "gelu_new": lambda y: jax.nn.gelu(y, approximate=True),
            "relu": jax.nn.relu,
            "silu": jax.nn.silu,
        }[cfg.dense_act_fn]
        dense = lambda feats, name: nn.Dense(feats, use_bias=False, dtype=self.dtype, name=name)  # noqa: E731
        if cfg.is_gated_act:
            h = act(dense(cfg.d_ff, "wi_0")(x)) * dense(cfg.d_ff, "wi_1")(x)
        else:
            h = act(dense(cfg.d_ff, "wi")(x))
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return dense(cfg.d_model, "wo")(h)


class T5Block(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask_bias, deterministic=True):
        cfg = self.config
        h = T5LayerNorm(self.dtype, name="ln_attn")(x)
        h = T5SelfAttention(cfg, self.dtype, name="attention")(h, position_bias, mask_bias)
        x = x + nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        h = T5LayerNorm(self.dtype, name="ln_ff")(x)
        h = T5FeedForward(cfg, self.dtype, name="ff")(h, deterministic=deterministic)
        return x + nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)


class T5Encoder(nn.Module):
    """Returns last_hidden_state (B, T, d_model)."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        shared = self.param(
            "shared_embedding",
            nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model),
            jnp.float32,
        )
        x = jnp.take(shared.astype(self.dtype), input_ids, axis=0)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        t = input_ids.shape[-1]
        # shared relative position bias, computed once
        rel_bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32,
        )
        ctx = jnp.arange(t)
        rel_pos = ctx[None, :] - ctx[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel_pos, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        position_bias = jnp.take(rel_bias_table, buckets, axis=0)  # (T, T, H)
        position_bias = position_bias.transpose(2, 0, 1)[None]     # (1, H, T, T)

        mask_bias = None
        if attention_mask is not None:
            mask_bias = jnp.where(attention_mask.astype(bool), 0.0, jnp.finfo(jnp.float32).min)
            mask_bias = mask_bias[:, None, None, :].astype(jnp.float32)

        for i in range(cfg.num_layers):
            x = T5Block(cfg, self.dtype, name=f"block_{i}")(
                x, position_bias, mask_bias, deterministic=deterministic
            )

        x = T5LayerNorm(self.dtype, name="final_layer_norm")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)


def convert_t5_encoder_params(
    tensors: Mapping[str, np.ndarray], config: T5Config, prefix: str = ""
) -> Dict:
    """HF T5EncoderModel state dict -> T5Encoder params.

    `prefix` is `text_encoder.` inside a composite Parler checkpoint.
    """

    def _t(name):
        return np.ascontiguousarray(np.asarray(tensors[prefix + name]).T)

    params: Dict = {
        "shared_embedding": np.asarray(tensors[prefix + "shared.weight"]),
        "relative_attention_bias": np.asarray(
            tensors[prefix + "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "final_layer_norm": {
            "weight": np.asarray(tensors[prefix + "encoder.final_layer_norm.weight"])
        },
    }
    for i in range(config.num_layers):
        bp = f"encoder.block.{i}."
        block = {
            "ln_attn": {"weight": np.asarray(tensors[prefix + bp + "layer.0.layer_norm.weight"])},
            "attention": {
                "q": {"kernel": _t(bp + "layer.0.SelfAttention.q.weight")},
                "k": {"kernel": _t(bp + "layer.0.SelfAttention.k.weight")},
                "v": {"kernel": _t(bp + "layer.0.SelfAttention.v.weight")},
                "o": {"kernel": _t(bp + "layer.0.SelfAttention.o.weight")},
            },
            "ln_ff": {"weight": np.asarray(tensors[prefix + bp + "layer.1.layer_norm.weight"])},
        }
        if config.is_gated_act:
            block["ff"] = {
                "wi_0": {"kernel": _t(bp + "layer.1.DenseReluDense.wi_0.weight")},
                "wi_1": {"kernel": _t(bp + "layer.1.DenseReluDense.wi_1.weight")},
                "wo": {"kernel": _t(bp + "layer.1.DenseReluDense.wo.weight")},
            }
        else:
            block["ff"] = {
                "wi": {"kernel": _t(bp + "layer.1.DenseReluDense.wi.weight")},
                "wo": {"kernel": _t(bp + "layer.1.DenseReluDense.wo.weight")},
            }
        params[f"block_{i}"] = block
    return params

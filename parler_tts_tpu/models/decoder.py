"""TPU-native Parler-TTS autoregressive codec-token decoder.

Re-design of the reference decoder stack
(`/root/reference/parler_tts/modeling_parler_tts.py:439-1736,1824-2298`) as
functional flax modules:

  - K per-codebook embedding tables live in ONE stacked (K, vocab+1, D) param and
    are gathered + summed in a single take (reference sums K separate
    `nn.Embedding`s, modeling:1432-1433);
  - attention is einsum-based GQA in the (B, T, H, Dh) layout with fp32 softmax,
    serving self- and cross-attention; RoPE is applied to q (and to new self-attn
    k) exactly like the reference, including its quirk of rotating cross-attn
    queries but not encoder keys (modeling:516-545);
  - the KV cache is an explicit, statically-shaped pytree threaded through
    `__call__` — the same code path serves training (no cache), prefill
    (T > 1 at index 0) and decode (T == 1), so the whole generate loop stays
    inside one jitted program (the reference needs a separate StaticCache
    machinery for this, modeling:3254-3309);
  - LM heads are ONE stacked (K, D, V) param applied as a single einsum — the
    TPU-native form of the reference's `use_fused_lm_heads` (modeling:1834-1840).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.positions import apply_rope, rope_cos_sin, sinusoidal_embed, sinusoidal_table

ACT_FNS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


@flax.struct.dataclass
class DecoderCache:
    """Static-shape KV cache for the full decoder stack.

    self_k/self_v: (L, B, S_max, H_kv, Dh) — or (L, B, S_max, H_kv*Dh) when
      `flat_self=True` (the flash-decode serving layout: the Pallas kernel
      consumes 2-D (S, H_kv*Dh) blocks, and keeping the cache flat makes the
      per-layer slice a true bitcast instead of letting XLA pick an S-minor
      layout that turns every one-token DUS write into a strided scatter —
      profiled at +0.9 ms/step at B=8 before this layout existed)
    cross_k/cross_v: (L, B, S_enc, H_ckv, Dh) — filled once per generate
    index: () int32 — next self-attention write position
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    index: jnp.ndarray

    @classmethod
    def zeros(
        cls,
        config: DecoderConfig,
        batch_size: int,
        max_length: int,
        encoder_length: int,
        dtype=jnp.float32,
        flat_self: bool = False,
    ) -> "DecoderCache":
        l, dh = config.num_hidden_layers, config.head_dim
        self_shape = (
            (l, batch_size, max_length, config.num_key_value_heads * dh)
            if flat_self
            else (l, batch_size, max_length, config.num_key_value_heads, dh)
        )
        return cls(
            self_k=jnp.zeros(self_shape, dtype),
            self_v=jnp.zeros(self_shape, dtype),
            cross_k=jnp.zeros(
                (l, batch_size, encoder_length, config.num_cross_attention_key_value_heads, dh), dtype
            ),
            cross_v=jnp.zeros(
                (l, batch_size, encoder_length, config.num_cross_attention_key_value_heads, dh), dtype
            ),
            index=jnp.zeros((), jnp.int32),
        )


def _gqa_attention(
    q: jnp.ndarray,  # (B, T, H, Dh) — already scaled
    k: jnp.ndarray,  # (B, S, H_kv, Dh)
    v: jnp.ndarray,  # (B, S, H_kv, Dh)
    bias: Optional[jnp.ndarray],  # (B, 1, T, S) additive fp32
) -> jnp.ndarray:
    """Grouped-query attention with fp32 logits/softmax. Returns (B, T, H, Dh)."""
    b, t, h, dh = q.shape
    h_kv = k.shape[2]
    g = h // h_kv
    qg = q.reshape(b, t, h_kv, g, dh)
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias[:, :, None, :, :]  # broadcast over (kv, group)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, v)
    return out.reshape(b, t, h, dh)


class QuantDense(nn.Module):
    """Weight-only int8 linear: int8 kernel + per-output-channel scales.

    Serving-mode replacement for the hot nn.Dense matmuls — halves the HBM
    weight traffic that bounds B=1 decode (see utils/quantize.py). Two
    implementations:
      - "pallas": the dequant-matmul kernel (1-byte HBM reads, in-VMEM
        dequant, fused scale epilogue);
      - "xla": plain dot over w_q.astype(dtype) * scale — XLA streams the
        int8 bytes and fuses the convert into the dot's operand read, which
        on v5e beats the Pallas DMA pipeline's byte rate.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    impl: str = "pallas"

    @nn.compact
    def __call__(self, x):
        w_q = self.param(
            "w_q", nn.initializers.zeros, (x.shape[-1], self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        shape = x.shape
        if self.impl == "xla":
            y = jnp.dot(
                x.reshape(-1, shape[-1]).astype(self.dtype),
                w_q.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) * scale[None, :]
            y = y.astype(self.dtype)
        else:
            from ..ops.pallas.quant_matmul import quant_matmul

            y = quant_matmul(x.reshape(-1, shape[-1]).astype(self.dtype), w_q, scale)
        return y.reshape(*shape[:-1], self.features)


class Attention(nn.Module):
    """Bias-free multi-head attention with GQA/MQA (reference modeling:439-584)."""

    config: DecoderConfig
    num_kv_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash_decode: bool = False  # opt-in Pallas kernel for T==1 decode
    # O(T*chunk)-memory training attention: False | True (online-softmax scan,
    # ops/chunked_attention.py, chunk 512) | int (scan with that chunk size)
    # | "pallas" (flash kernel, ops/pallas/flash_attention.py)
    use_chunked_attention: Any = False
    weight_quant: Any = False            # int8 serving: False | True (pallas) | "xla"
    fused_qkv: bool = False              # serving: one q|k|v matmul per layer

    def setup(self):
        cfg = self.config
        d, dh = cfg.hidden_size, cfg.head_dim
        if self.weight_quant:
            # weight_quant may be True (pallas kernel) or "xla" (fused-convert dot)
            impl = "xla" if self.weight_quant == "xla" else "pallas"
            dense = lambda feats, name: QuantDense(feats, self.dtype, impl, name=name)  # noqa: E731
        else:
            dense = lambda feats, name: nn.Dense(  # noqa: E731
                feats, use_bias=False, dtype=self.dtype, name=name,
                kernel_init=nn.initializers.normal(cfg.initializer_factor),
            )
        if self.fused_qkv:
            # B=1 decode is bound by serial per-op dispatch, not FLOPs
            # (INFERENCE.md profile): merging q|k|v into ONE matmul removes two
            # dispatches per layer per step. Kernel layout = concat along the
            # output axis (see fuse_qkv_params); bias-free so the concat is
            # numerically identical to the three separate matmuls.
            self.qkv_proj = dense(d + 2 * self.num_kv_heads * dh, "qkv_proj")
        else:
            self.q_proj = dense(d, "q_proj")
            self.k_proj = dense(self.num_kv_heads * dh, "k_proj")
            self.v_proj = dense(self.num_kv_heads * dh, "v_proj")
        self.out_proj = dense(d, "out_proj")

    def _qkv(self, x):
        """(q, k, v) raw projections under either layout."""
        cfg = self.config
        d, dh = cfg.hidden_size, cfg.head_dim
        if self.fused_qkv:
            qkv = self.qkv_proj(x)
            kv = self.num_kv_heads * dh
            return (
                qkv[..., :d],
                qkv[..., d : d + kv],
                qkv[..., d + kv :],
            )
        return self.q_proj(x), self.k_proj(x), self.v_proj(x)

    def _split_q(self, x):
        b, t, _ = x.shape
        cfg = self.config
        return x.reshape(b, t, cfg.num_attention_heads, cfg.head_dim)

    def _split_kv(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_kv_heads, self.config.head_dim)

    def project_kv(self, states: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """k/v projections of (encoder) states — used to prefill the cross cache."""
        _, k, v = self._qkv(states) if self.fused_qkv else (
            None, self.k_proj(states), self.v_proj(states)
        )
        return self._split_kv(k), self._split_kv(v)

    def _query(self, x, cos, sin):
        # q is scaled before RoPE like the reference (rotation commutes with scale).
        q = self._split_q(self.q_proj(x)) * (self.config.head_dim ** -0.5)
        if self.config.rope_embeddings and cos is not None:
            q = apply_rope(q, cos, sin)
        return q

    def self_attention(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        cos: Optional[jnp.ndarray],
        sin: Optional[jnp.ndarray],
        cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        layer_idx: int = 0,
        cache_index: Optional[jnp.ndarray] = None,
        decode_lengths: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        mask_1d: Optional[jnp.ndarray] = None,
    ):
        """Returns (out, updated stacked cache (or None)).

        The cache is the FULL stacked (L, B, S, H_kv, Dh) pair; each layer
        writes its new k/v with ONE dynamic_update_slice so XLA aliases the
        buffer in place through the decode while_loop — no per-step restack
        copy of the whole cache.
        """
        q_raw, k_raw, v_raw = self._qkv(x)
        q = self._split_q(q_raw) * (self.config.head_dim ** -0.5)
        if self.config.rope_embeddings and cos is not None:
            q = apply_rope(q, cos, sin)
        k = self._split_kv(k_raw)
        v = self._split_kv(v_raw)
        if self.config.rope_embeddings and cos is not None:
            k = apply_rope(k, cos, sin)

        if cache_kv is not None:
            ck, cv = cache_kv
            # 4-D stacked cache = flat (L, B, S, H_kv*Dh) flash-decode layout
            flat = ck.ndim == 4
            k_w = k.reshape(k.shape[0], k.shape[1], -1) if flat else k
            v_w = v.reshape(v.shape[0], v.shape[1], -1) if flat else v
            if jnp.ndim(cache_index) == 1:
                # (B,) per-row write offsets (per-row speculative windows:
                # each batch row sits at its own column). vmapped DUS lowers
                # to one scatter of the B*T new rows.
                def _upd(cl, nb, ib):
                    return jax.lax.dynamic_update_slice(
                        cl, nb, (ib,) + (0,) * (cl.ndim - 1)
                    )

                lay_k = jax.vmap(_upd)(
                    ck[layer_idx], k_w.astype(ck.dtype), cache_index
                )
                lay_v = jax.vmap(_upd)(
                    cv[layer_idx], v_w.astype(cv.dtype), cache_index
                )
                ck = jax.lax.dynamic_update_slice(
                    ck, lay_k[None], (layer_idx,) + (0,) * (ck.ndim - 1)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, lay_v[None], (layer_idx,) + (0,) * (cv.ndim - 1)
                )
            else:
                tail = (0,) * (ck.ndim - 3)
                ck = jax.lax.dynamic_update_slice(
                    ck, k_w[None].astype(ck.dtype),
                    (layer_idx, 0, cache_index) + tail,
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, v_w[None].astype(cv.dtype),
                    (layer_idx, 0, cache_index) + tail,
                )
            cache_kv = (ck, cv)
            flash_path = self.use_flash_decode and decode_lengths is not None
            if not flash_path:
                # Dense paths consume one layer, (B, S, H_kv, Dh); the
                # flash-decode kernel takes the FULL stacked cache with a
                # static `layer` index instead — slicing `ck[layer_idx]` here
                # would make XLA materialize a per-layer copy to feed the
                # custom call (120 us x 2 x L per step at B=32, profiled;
                # 68% of the decode loop). The minor-dim split of the flat
                # layout is a bitcast, not a copy.
                k, v = ck[layer_idx], cv[layer_idx]
                if flat:
                    n_kv = self.num_kv_heads
                    k = k.reshape(k.shape[0], k.shape[1], n_kv, -1)
                    v = v.reshape(v.shape[0], v.shape[1], n_kv, -1)

        b, t = x.shape[:2]
        if (
            self.use_flash_decode
            and cache_kv is not None
            and decode_lengths is not None
        ):
            from ..ops.pallas.flash_decode import flash_decode_attention

            # t == 1: the AR decode step. t > 1: a speculative W-column
            # window — the kernel gives column i the causal bound
            # [start, limit + i), matching the bias the dense path would use.
            starts, limit = decode_lengths
            qk = q[:, 0] if t == 1 else q
            out = flash_decode_attention(
                qk, cache_kv[0], cache_kv[1], starts, limit, layer=layer_idx
            )
            out = out.astype(q.dtype)
            if t == 1:
                out = out[:, None]
        elif self.use_chunked_attention and cache_kv is None and mask_1d is not None:
            if self.use_chunked_attention == "pallas":
                # Pallas flash attention (fwd + custom-VJP bwd): same contract
                # as chunked_attention, scores never touch HBM
                from ..ops.pallas.flash_attention import flash_attention

                out = flash_attention(
                    q, k.astype(q.dtype), v.astype(q.dtype), mask_1d, causal=True
                )
            else:
                from ..ops.chunked_attention import chunked_attention

                # int-valued use_chunked_attention selects the chunk size:
                # fewer/larger online-softmax scan steps (less loop overhead,
                # more VMEM per step) — see training/README.md MFU table
                ca = self.use_chunked_attention
                chunk = 512 if isinstance(ca, bool) else int(ca)
                out = chunked_attention(
                    q, k.astype(q.dtype), v.astype(q.dtype), mask_1d,
                    causal=True, chunk_q=chunk, chunk_k=chunk,
                )
        else:
            out = _gqa_attention(q, k.astype(q.dtype), v.astype(q.dtype), bias)
        return self.out_proj(out.reshape(b, t, -1)), cache_kv

    def cross_attention(
        self,
        x: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        cos: Optional[jnp.ndarray],
        sin: Optional[jnp.ndarray],
    ):
        # Reference quirk: with rope_embeddings=True the cross-attn *query* is
        # rotated (decoder positions) while encoder keys are not (modeling:516-518).
        q = self._query(x, cos, sin)
        out = _gqa_attention(q, k.astype(q.dtype), v.astype(q.dtype), bias)
        b, t, _, _ = out.shape
        return self.out_proj(out.reshape(b, t, -1))


class DecoderLayer(nn.Module):
    """Pre-LN block: self-attn -> cross-attn -> GELU MLP (reference modeling:940-1074)."""

    config: DecoderConfig
    dtype: jnp.dtype = jnp.float32
    use_flash_decode: bool = False
    use_chunked_attention: Any = False  # False | True (chunked scan) | "pallas"
    weight_quant: Any = False  # False | True (pallas) | "xla"
    fused_qkv: bool = False

    def setup(self):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)  # noqa: E731
        self.self_attn = Attention(
            cfg, cfg.num_key_value_heads, self.dtype,
            use_flash_decode=self.use_flash_decode,
            use_chunked_attention=self.use_chunked_attention,
            weight_quant=self.weight_quant, fused_qkv=self.fused_qkv,
            name="self_attn",
        )
        self.self_attn_layer_norm = ln("self_attn_layer_norm")
        self.encoder_attn = Attention(
            cfg, cfg.num_cross_attention_key_value_heads, self.dtype,
            weight_quant=self.weight_quant, name="encoder_attn",
        )
        self.encoder_attn_layer_norm = ln("encoder_attn_layer_norm")
        if self.weight_quant:
            impl = "xla" if self.weight_quant == "xla" else "pallas"
            self.fc1 = QuantDense(cfg.ffn_dim, self.dtype, impl, name="fc1")
            self.fc2 = QuantDense(cfg.hidden_size, self.dtype, impl, name="fc2")
        else:
            self.fc1 = nn.Dense(cfg.ffn_dim, use_bias=False, dtype=self.dtype, name="fc1",
                                kernel_init=nn.initializers.normal(cfg.initializer_factor))
            self.fc2 = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype, name="fc2",
                                kernel_init=nn.initializers.normal(cfg.initializer_factor))
        self.final_layer_norm = ln("final_layer_norm")
        self.dropout = nn.Dropout(cfg.dropout)
        self.activation_dropout = nn.Dropout(cfg.activation_dropout)

    def cross_kv(self, encoder_hidden_states: jnp.ndarray):
        return self.encoder_attn.project_kv(encoder_hidden_states)

    def train_forward(
        self, x, self_attn_bias, cross_k, cross_v, cross_attn_bias, cos, sin,
        mask_1d, deterministic: bool = True,
    ):
        """Positional-args adapter for `nn.remat` (training path, no cache)."""
        out, _ = self(
            x, self_attn_bias=self_attn_bias, cross_k=cross_k, cross_v=cross_v,
            cross_attn_bias=cross_attn_bias, cos=cos, sin=sin, mask_1d=mask_1d,
            deterministic=deterministic,
        )
        return out

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        self_attn_bias: Optional[jnp.ndarray],
        cross_k: Optional[jnp.ndarray],
        cross_v: Optional[jnp.ndarray],
        cross_attn_bias: Optional[jnp.ndarray],
        cos: Optional[jnp.ndarray],
        sin: Optional[jnp.ndarray],
        cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        layer_idx: int = 0,
        cache_index: Optional[jnp.ndarray] = None,
        decode_lengths: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        mask_1d: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        residual = x
        h = self.self_attn_layer_norm(x)
        h, cache_kv = self.self_attn.self_attention(
            h, self_attn_bias, cos, sin, cache_kv, layer_idx, cache_index,
            decode_lengths, mask_1d,
        )
        x = residual + self.dropout(h, deterministic=deterministic)

        if cross_k is not None:
            residual = x
            h = self.encoder_attn_layer_norm(x)
            h = self.encoder_attn.cross_attention(h, cross_k, cross_v, cross_attn_bias, cos, sin)
            x = residual + self.dropout(h, deterministic=deterministic)

        residual = x
        h = self.final_layer_norm(x)
        h = ACT_FNS[self.config.activation_function](self.fc1(h))
        h = self.activation_dropout(h, deterministic=deterministic)
        h = self.fc2(h)
        x = residual + self.dropout(h, deterministic=deterministic)
        return x, cache_kv


class ParlerDecoder(nn.Module):
    """The decoder stack (reference `ParlerTTSDecoder`, modeling:1338-1736)."""

    config: DecoderConfig
    dtype: jnp.dtype = jnp.float32
    use_flash_decode: bool = False
    use_chunked_attention: Any = False  # False | True (chunked scan) | "pallas"
    weight_quant: Any = False  # False | True (pallas) | "xla"
    remat_layers: bool = False  # per-layer rematerialization for long-T training
    fused_qkv: bool = False
    # remat policy for remat_layers: None = recompute everything (min memory);
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
    # matmul outputs are SAVED, only cheap elementwise work is recomputed
    # (trades HBM back for backward-pass FLOPs; see benchmarks/train_step.py)
    remat_policy: Any = None

    def setup(self):
        cfg = self.config
        # One stacked embedding param: (K, vocab+1, D).
        self.embed_tokens = self.param(
            "embed_tokens",
            nn.initializers.normal(cfg.initializer_factor),
            (cfg.num_codebooks, cfg.embed_rows, cfg.hidden_size),
            jnp.float32,
        )
        layer_cls = DecoderLayer
        if self.remat_layers:
            # checkpoint each layer's train_forward: activations are
            # recomputed in the backward instead of stored — required to fit
            # the 30s/2580-frame recipe in HBM (the fc1 activations alone are
            # ~2GB otherwise and XLA spills catastrophically)
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif callable(self.remat_policy):
                policy = self.remat_policy
            layer_cls = nn.remat(
                DecoderLayer, static_argnums=(9,), methods=["train_forward"],
                policy=policy,
            )
        self.layers = [
            layer_cls(
                cfg, self.dtype, self.use_flash_decode,
                self.use_chunked_attention, self.weight_quant, self.fused_qkv,
                name=f"layers_{i}",
            )
            for i in range(cfg.num_hidden_layers)
        ]
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")
        self.dropout = nn.Dropout(cfg.dropout)

    def embed_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Sum the K codebook embeddings: (B, K, T) int -> (B, T, D).

        One fused gather over the stacked table instead of K table lookups
        (reference modeling:1432-1433).
        """
        cfg = self.config
        scale = cfg.hidden_size ** 0.5 if cfg.scale_embedding else 1.0
        # Flatten the stacked table to (K * rows, D) and add per-codebook row
        # offsets so the whole lookup is ONE gather.
        flat = self.embed_tokens.astype(self.dtype).reshape(-1, cfg.hidden_size)
        offsets = (jnp.arange(cfg.num_codebooks) * cfg.embed_rows)[None, :, None]
        gathered = jnp.take(flat, input_ids + offsets, axis=0)  # (B, K, T, D)
        return gathered.sum(axis=1) * scale

    def precompute_cross_kv(self, encoder_hidden_states: jnp.ndarray):
        """Per-layer cross-attention k/v, stacked (L, B, S_enc, H_ckv, Dh)."""
        ks, vs = [], []
        for layer in self.layers:
            k, v = layer.cross_kv(encoder_hidden_states.astype(self.dtype))
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,       # (B, T, D) — prompt prefix already prepended
        position_ids: jnp.ndarray,        # (B, T) absolute positions
        *,
        self_attn_bias: Optional[jnp.ndarray],   # (B, 1, T, S)
        encoder_hidden_states: Optional[jnp.ndarray] = None,  # (B, S_enc, D) training path
        cross_attn_bias: Optional[jnp.ndarray] = None,        # (B, 1, T, S_enc)
        cache: Optional[DecoderCache] = None,
        decode_lengths: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        mask_1d: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        x = inputs_embeds.astype(self.dtype)

        cos = sin = None
        if cfg.rope_embeddings:
            cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, self.dtype)
        else:
            table = sinusoidal_table(cfg.max_position_embeddings, cfg.hidden_size, self.dtype)
            x = x + sinusoidal_embed(table, position_ids)

        x = self.dropout(x, deterministic=deterministic)

        # LayerDrop (reference modeling:1587-1589): during training each layer
        # is skipped with prob cfg.layerdrop. The skip is a select (the layer
        # still computes under jit — static graph), preserving the regularizer
        # semantics without data-dependent control flow.
        drop_rng = None
        if not deterministic and cfg.layerdrop > 0.0 and cache is None:
            drop_rng = self.make_rng("dropout")

        cache_kv = (cache.self_k, cache.self_v) if cache is not None else None
        for i, layer in enumerate(self.layers):
            if cache is not None:
                cross_k_i, cross_v_i = cache.cross_k[i], cache.cross_v[i]
                idx = cache.index
            elif encoder_hidden_states is not None:
                cross_k_i, cross_v_i = layer.cross_kv(encoder_hidden_states.astype(self.dtype))
                idx = None
            else:
                cross_k_i = cross_v_i = idx = None
            x_in = x
            if self.remat_layers and cache is None:
                x = layer.train_forward(
                    x, self_attn_bias, cross_k_i, cross_v_i, cross_attn_bias,
                    cos, sin, mask_1d, deterministic,
                )
            else:
                x, cache_kv = layer(
                    x,
                    self_attn_bias=self_attn_bias,
                    cross_k=cross_k_i,
                    cross_v=cross_v_i,
                    cross_attn_bias=cross_attn_bias,
                    cos=cos,
                    sin=sin,
                    cache_kv=cache_kv,
                    layer_idx=i,
                    cache_index=idx,
                    decode_lengths=decode_lengths,
                    mask_1d=mask_1d,
                    deterministic=deterministic,
                )
            if drop_rng is not None:
                dropped = jax.random.bernoulli(
                    jax.random.fold_in(drop_rng, i), cfg.layerdrop
                )
                x = jnp.where(dropped, x_in, x)

        x = self.layer_norm(x)

        new_cache = None
        if cache is not None:
            new_cache = DecoderCache(
                self_k=cache_kv[0],
                self_v=cache_kv[1],
                cross_k=cache.cross_k,
                cross_v=cache.cross_v,
                index=cache.index + inputs_embeds.shape[1],
            )
        return x, new_cache


class ParlerForCausalLM(nn.Module):
    """Decoder + stacked LM heads (reference `ParlerTTSForCausalLM`, modeling:1824-2298)."""

    config: DecoderConfig
    dtype: jnp.dtype = jnp.float32
    use_flash_decode: bool = False
    use_chunked_attention: Any = False  # False | True (chunked scan) | "pallas"
    weight_quant: Any = False  # False | True (pallas) | "xla"
    remat_layers: bool = False
    fused_qkv: bool = False
    remat_policy: Any = None

    def setup(self):
        cfg = self.config
        self.decoder = ParlerDecoder(
            cfg, self.dtype, self.use_flash_decode,
            self.use_chunked_attention, self.weight_quant, self.remat_layers,
            self.fused_qkv, self.remat_policy, name="decoder",
        )
        # (K, D, V) — applied as one fused einsum (TPU-native `use_fused_lm_heads`).
        # NB: heads stay bf16 even in weight_quant mode — their vocab axis
        # (K*V) is not lane-aligned for the quant kernel and they are a small
        # fraction of the weight bytes.
        self.lm_heads = self.param(
            "lm_heads", nn.initializers.normal(cfg.initializer_factor),
            (cfg.num_codebooks, cfg.hidden_size, cfg.vocab_size),
            jnp.float32,
        )

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """(B, T, D) -> (B, K, T, V)."""
        return jnp.einsum(
            "btd,kdv->bktv", hidden, self.lm_heads.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        position_ids: jnp.ndarray,
        *,
        self_attn_bias: Optional[jnp.ndarray],
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        cross_attn_bias: Optional[jnp.ndarray] = None,
        cache: Optional[DecoderCache] = None,
        decode_lengths: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        mask_1d: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        apply_heads: bool = True,
    ):
        hidden, new_cache = self.decoder(
            inputs_embeds,
            position_ids,
            self_attn_bias=self_attn_bias,
            encoder_hidden_states=encoder_hidden_states,
            cross_attn_bias=cross_attn_bias,
            cache=cache,
            decode_lengths=decode_lengths,
            mask_1d=mask_1d,
            deterministic=deterministic,
        )
        if not apply_heads:
            # pre-head (B, T, D) states for the chunked fused-head CE loss
            # (ops/losses.py:chunked_per_codebook_cross_entropy)
            return hidden, new_cache
        return self.logits(hidden), new_cache

    def embed_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.decoder.embed_ids(input_ids)

    def precompute_cross_kv(self, encoder_hidden_states: jnp.ndarray):
        return self.decoder.precompute_cross_kv(encoder_hidden_states)

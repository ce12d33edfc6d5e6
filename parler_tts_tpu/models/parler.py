"""The composite Parler-TTS model: T5 text encoder + AR codec-token decoder.

Re-design of `ParlerTTSForConditionalGeneration`
(`/root/reference/parler_tts/modeling_parler_tts.py:2306-3678`). The module owns
the *neural* composition only — description encoding, prompt embedding, the two
prompt-conditioning modes, and the decoder-with-heads. The generation loop and
the DAC codec live in `runtime/` and `codec/` (the reference folds all three
into one class; splitting them keeps every piece independently jittable).

Prompt-conditioning parity:
  - default mode: prompt embeddings are PREPENDED to the decoder input embeds
    and the prompt mask is concatenated to the decoder mask (modeling:1437-1439,
    1474-1480, 3033-3044);
  - `prompt_cross_attention=True`: prompt embeddings + sinusoidal positions are
    CONCATENATED to the encoder states for cross-attention (modeling:2791-2811).
Position-id quirk preserved: sinusoidal positions count masked prompt tokens;
RoPE positions do not (mask-cumsum, modeling:1506-1534).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import ParlerTTSConfig
from ..ops.losses import shift_tokens_right
from ..ops.masks import dense_self_attention_bias, padding_cross_attention_bias
from ..ops.positions import sinusoidal_embed, sinusoidal_table
from .decoder import ParlerForCausalLM
from .t5_encoder import T5Encoder, convert_t5_encoder_params


class ParlerTTS(nn.Module):
    config: ParlerTTSConfig
    dtype: jnp.dtype = jnp.float32
    use_flash_decode: bool = False
    use_chunked_attention: Any = False  # False | True (chunked scan) | "pallas" flash kernel
    weight_quant: Any = False            # int8 serving: False | True (pallas) | "xla"
    remat_layers: bool = False           # per-layer remat for long-T training
    fused_qkv: bool = False              # serving: one q|k|v matmul per layer
    remat_policy: Any = None             # None | "dots" (see models/decoder.py)

    def setup(self):
        cfg = self.config
        self.text_encoder = T5Encoder(cfg.text_encoder, self.dtype, name="text_encoder")
        self.decoder_lm = ParlerForCausalLM(
            cfg.decoder, self.dtype, self.use_flash_decode,
            self.use_chunked_attention, self.weight_quant, self.remat_layers,
            self.fused_qkv, self.remat_policy, name="decoder",
        )
        # prompt embedding: (prompt_vocab, decoder_hidden) — modeling:2395
        self.embed_prompts = nn.Embed(
            cfg.vocab_size, cfg.decoder.hidden_size, dtype=self.dtype, name="embed_prompts",
            embedding_init=nn.initializers.normal(cfg.decoder.initializer_factor),
        )
        # projection iff hidden sizes differ — modeling:2388-2392
        self.needs_proj = (
            cfg.text_encoder.d_model != cfg.decoder.hidden_size
            and cfg.decoder.cross_attention_hidden_size is None
        )
        if self.needs_proj:
            self.enc_to_dec_proj = nn.Dense(
                cfg.decoder.hidden_size, dtype=self.dtype, name="enc_to_dec_proj"
            )

    # ------------------------------------------------------------- components
    def encode_description(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """T5 -> optional projection -> zero masked positions (modeling:3082-3093)."""
        enc = self.text_encoder(input_ids, attention_mask, deterministic=deterministic)
        if self.needs_proj:
            enc = self.enc_to_dec_proj(enc)
        if attention_mask is not None:
            enc = enc * attention_mask[..., None].astype(enc.dtype)
        return enc

    def prompt_hidden(self, prompt_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_prompts(prompt_ids)

    def build_encoder_states(
        self,
        encoder_hidden: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray],
        prompt_hidden: Optional[jnp.ndarray],
        prompt_mask: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """In prompt_cross_attention mode, concat prompt (+ sinusoidal positions)
        onto the encoder states (modeling:2791-2811)."""
        cfg = self.config
        if not cfg.prompt_cross_attention or prompt_hidden is None:
            return encoder_hidden, attention_mask
        table = sinusoidal_table(
            cfg.decoder.max_position_embeddings, cfg.decoder.hidden_size, self.dtype
        )
        pos = jnp.arange(prompt_hidden.shape[1])
        prompt_hidden = prompt_hidden + sinusoidal_embed(table, pos)[None]
        b = encoder_hidden.shape[0]
        if prompt_mask is not None and attention_mask is None:
            attention_mask = jnp.ones(encoder_hidden.shape[:2], jnp.int32)
        elif attention_mask is not None and prompt_mask is None:
            prompt_mask = jnp.ones(prompt_hidden.shape[:2], jnp.int32)
        states = jnp.concatenate([encoder_hidden, prompt_hidden], axis=1)
        mask = (
            jnp.concatenate([attention_mask, prompt_mask], axis=1)
            if attention_mask is not None
            else None
        )
        return states, mask

    # ---------------------------------------------------------- training path
    def __call__(
        self,
        input_ids: jnp.ndarray,                 # (B, S_desc) description ids
        attention_mask: Optional[jnp.ndarray],  # (B, S_desc)
        prompt_input_ids: jnp.ndarray,          # (B, S_p)
        prompt_attention_mask: Optional[jnp.ndarray],
        labels: jnp.ndarray,                    # (B, T, K)
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        """Teacher-forced forward: returns (logits (B, K, T, V), decoder_input_ids (B, K, T)).
        With `return_hidden=True` the LM heads are NOT applied and the first
        element is the pre-head hidden states (B, T, D) — the train step then
        fuses heads+CE chunk-by-chunk (`chunked_per_codebook_cross_entropy`).

        Mirrors the reference training forward (modeling:2695-2864): T5 encode,
        prompt embed, shift labels right, decode with prompt prefix.
        """
        cfg = self.config
        enc = self.encode_description(input_ids, attention_mask, deterministic)
        prompt = self.prompt_hidden(prompt_input_ids)

        decoder_input_ids = shift_tokens_right(
            labels, cfg.pad_token_id, cfg.decoder_start_token_id
        )  # (B, K, T)
        dec_embeds = self.decoder_lm.embed_ids(decoder_input_ids)  # (B, T, D)
        b, t, _ = dec_embeds.shape

        enc_states, enc_mask = self.build_encoder_states(
            enc, attention_mask, prompt, prompt_attention_mask
        )

        if cfg.prompt_cross_attention:
            full_embeds = dec_embeds
            dec_mask = jnp.ones((b, t), jnp.int32)
            s_p = 0
        else:
            full_embeds = jnp.concatenate([prompt, dec_embeds], axis=1)
            if prompt_attention_mask is None:
                prompt_attention_mask = jnp.ones(prompt.shape[:2], jnp.int32)
            dec_mask = jnp.concatenate(
                [prompt_attention_mask, jnp.ones((b, t), jnp.int32)], axis=1
            )
            s_p = prompt.shape[1]

        full_t = full_embeds.shape[1]
        if full_t > cfg.decoder.max_position_embeddings:
            # torch's F.embedding raises on out-of-range positions; jnp.take's
            # fill mode would silently emit NaN rows instead — fail loudly at
            # trace time (shapes are static under jit).
            raise ValueError(
                f"decoder sequence (prompt {s_p} + frames {t} = {full_t}) exceeds "
                f"max_position_embeddings={cfg.decoder.max_position_embeddings}; "
                "lower the collator's label bucket / audio_max_length or raise "
                "the config limit"
            )
        # Positions are absolute for BOTH sinusoidal and RoPE: the reference
        # sets position_ids from cache_position before its mask-cumsum branch,
        # making that branch dead code (modeling:1466-1468 vs :1520-1526) —
        # masked prompt tokens count toward positions in all modes.
        position_ids = jnp.broadcast_to(jnp.arange(full_t), (b, full_t))

        # chunked attention computes causality+padding on the fly — never
        # materialize the (B, 1, T, T) bias at long T
        self_bias = None if self.use_chunked_attention else dense_self_attention_bias(dec_mask)
        cross_bias = padding_cross_attention_bias(enc_mask, full_t)

        out, _ = self.decoder_lm(
            full_embeds,
            position_ids,
            self_attn_bias=self_bias,
            encoder_hidden_states=enc_states,
            cross_attn_bias=cross_bias,
            mask_1d=dec_mask if self.use_chunked_attention else None,
            deterministic=deterministic,
            apply_heads=not return_hidden,
        )
        # keep only label positions (drop the prompt prefix) — modeling:1896-1899
        if return_hidden:
            return out[:, s_p:, :], decoder_input_ids
        return out[:, :, s_p:, :], decoder_input_ids


def convert_composite_params(
    tensors: Mapping[str, np.ndarray], config: ParlerTTSConfig
) -> Dict:
    """Composite HF checkpoint -> `ParlerTTS` params pytree."""
    from ..utils.hf_bridge import convert_decoder_params

    params: Dict = {
        "text_encoder": convert_t5_encoder_params(
            tensors, config.text_encoder, prefix="text_encoder."
        ),
        "decoder": convert_decoder_params(
            tensors,
            config.decoder,
            prefix="decoder.model.decoder.",
            lm_head_prefix="decoder.",
        ),
        "embed_prompts": {"embedding": np.asarray(tensors["embed_prompts.weight"])},
    }
    if "enc_to_dec_proj.weight" in tensors:
        params["enc_to_dec_proj"] = {
            "kernel": np.ascontiguousarray(np.asarray(tensors["enc_to_dec_proj.weight"]).T),
            "bias": np.asarray(tensors["enc_to_dec_proj.bias"]),
        }
    return params


def fuse_qkv_params(params) -> Dict:
    """Serving transform for `ParlerTTS(fused_qkv=True)`: concatenate each
    decoder layer's self-attention q/k/v kernels (bias-free) into one
    `qkv_proj` kernel along the output axis — numerically identical, two fewer
    dispatches per layer per decode step (see INFERENCE.md profile)."""

    def walk(tree):
        if not isinstance(tree, Mapping):
            return tree
        if "q_proj" in tree and "k_proj" in tree and "v_proj" in tree:
            out = {k: v for k, v in tree.items() if k not in ("q_proj", "k_proj", "v_proj")}
            out["qkv_proj"] = {
                "kernel": np.concatenate(
                    [
                        np.asarray(tree["q_proj"]["kernel"]),
                        np.asarray(tree["k_proj"]["kernel"]),
                        np.asarray(tree["v_proj"]["kernel"]),
                    ],
                    axis=1,
                )
            }
            return out
        return {k: walk(v) for k, v in tree.items()}

    import jax

    host = jax.tree.map(np.asarray, params)
    # only self_attn is fused; walk from each layer dict and rewrite its
    # self_attn subtree, leaving encoder_attn and everything else untouched
    def rewrite(tree):
        if not isinstance(tree, Mapping):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "self_attn" and isinstance(v, Mapping) and "q_proj" in v:
                out[k] = walk(v)
            else:
                out[k] = rewrite(v)
        return out

    return rewrite(host)

from .delay_pattern import (
    apply_delay_pattern_mask,
    build_delay_pattern_mask,
    flatten_codebooks,
    undelay_pattern,
    unflatten_codebooks,
    valid_frame_lengths,
)
from .losses import (
    chunked_per_codebook_cross_entropy,
    mean_loss_reference_style,
    per_codebook_cross_entropy,
    shift_tokens_right,
)
from .masks import (
    causal_self_attention_bias,
    dense_self_attention_bias,
    padding_cross_attention_bias,
)
from .positions import (
    apply_rope,
    rope_cos_sin,
    rotate_half,
    sinusoidal_embed,
    sinusoidal_table,
)
from .sampling import (
    EosState,
    advance_eos_state,
    init_eos_state,
    mask_eos_ordering,
    record_sampled,
    sample_tokens,
    suppress_eos_before_min_length,
)

__all__ = [
    "apply_delay_pattern_mask",
    "build_delay_pattern_mask",
    "flatten_codebooks",
    "undelay_pattern",
    "unflatten_codebooks",
    "valid_frame_lengths",
    "mean_loss_reference_style",
    "chunked_per_codebook_cross_entropy",
    "per_codebook_cross_entropy",
    "shift_tokens_right",
    "causal_self_attention_bias",
    "dense_self_attention_bias",
    "padding_cross_attention_bias",
    "apply_rope",
    "rope_cos_sin",
    "rotate_half",
    "sinusoidal_embed",
    "sinusoidal_table",
    "EosState",
    "advance_eos_state",
    "init_eos_state",
    "mask_eos_ordering",
    "record_sampled",
    "sample_tokens",
    "suppress_eos_before_min_length",
]

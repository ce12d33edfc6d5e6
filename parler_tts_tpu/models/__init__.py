from .decoder import (
    Attention,
    DecoderCache,
    DecoderLayer,
    ParlerDecoder,
    ParlerForCausalLM,
)

__all__ = [
    "Attention",
    "DecoderCache",
    "DecoderLayer",
    "ParlerDecoder",
    "ParlerForCausalLM",
]

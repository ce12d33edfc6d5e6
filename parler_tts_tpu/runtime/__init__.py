from .generate import (
    GenerateOutput,
    GenLoopState,
    StreamState,
    generate_tokens,
    generate_tokens_decoder_only,
    make_generate,
    make_stream_functions,
)
from .speculative import (
    SpecState,
    SpecStats,
    generate_tokens_decoder_only_speculative,
    generate_tokens_speculative,
    make_generate_speculative,
    make_stream_functions_speculative,
)

__all__ = [
    "GenerateOutput",
    "GenLoopState",
    "SpecState",
    "SpecStats",
    "StreamState",
    "generate_tokens",
    "generate_tokens_decoder_only",
    "generate_tokens_decoder_only_speculative",
    "generate_tokens_speculative",
    "make_generate",
    "make_generate_speculative",
    "make_stream_functions",
    "make_stream_functions_speculative",
]

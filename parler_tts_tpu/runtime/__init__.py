from .generate import (
    GenerateOutput,
    GenLoopState,
    StreamState,
    generate_tokens,
    generate_tokens_decoder_only,
    make_generate,
    make_stream_functions,
)

__all__ = [
    "GenerateOutput",
    "GenLoopState",
    "StreamState",
    "generate_tokens",
    "generate_tokens_decoder_only",
    "make_generate",
    "make_stream_functions",
]

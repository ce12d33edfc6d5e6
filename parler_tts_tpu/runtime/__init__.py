from .generate import (
    GenerateOutput,
    GenLoopState,
    StreamState,
    generate_tokens,
    make_generate,
    make_stream_functions,
)

__all__ = [
    "GenerateOutput",
    "GenLoopState",
    "StreamState",
    "generate_tokens",
    "make_generate",
    "make_stream_functions",
]

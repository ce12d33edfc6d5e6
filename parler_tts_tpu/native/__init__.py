"""Native (C++) host runtime with transparent build-on-first-import.

`audio_runtime.cpp` compiles to `_audio_runtime.so` with g++ on first use (no
pip, no pybind11 — plain CPython C API). Every entry point has a numpy
fallback so the package works even without a toolchain.
"""

from __future__ import annotations
import os
import subprocess
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audio_runtime.cpp")
_SO = os.path.join(_HERE, "_audio_runtime.so")

_native = None
_tried = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-std=c++17", "-fPIC",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_native():
    """The compiled module, building it if needed; None when unavailable."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        import importlib.util

        spec = importlib.util.spec_from_file_location("_audio_runtime", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _native = mod
    except Exception:
        _native = None
    return _native


# ------------------------------------------------------------ typed wrappers
def float_to_pcm16(audio: np.ndarray) -> bytes:
    """float32 [-1, 1] -> int16 PCM bytes."""
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    native = get_native()
    if native is not None:
        return native.float_to_pcm16(audio.tobytes())
    return (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16).tobytes()


def write_wav(path: str, rate: int, audio: np.ndarray) -> int:
    """Write mono 16-bit PCM WAV; returns samples written."""
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    native = get_native()
    if native is not None:
        return native.write_wav(path, int(rate), audio.tobytes())
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(float_to_pcm16(audio))
    return int(audio.size)


def build_delayed_labels(
    codes: np.ndarray, bos_token_id: int, eos_token_id: int
) -> np.ndarray:
    """Codec codes (K, T) -> labels (T+K+1, K): BOS prepended, codebook k
    delayed by k, EOS elsewhere (training label prep; reference
    run_parler_tts_training.py:458-486)."""
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    k, t = codes.shape
    native = get_native()
    if native is not None:
        raw = native.build_delayed_labels(
            codes.tobytes(), int(k), int(t), int(bos_token_id), int(eos_token_id)
        )
        return np.frombuffer(raw, dtype=np.int32).reshape(t + 1 + k, k).copy()
    out = np.full((t + 1 + k, k), eos_token_id, dtype=np.int32)
    for cb in range(k):
        out[: cb + 1, cb] = bos_token_id
        out[cb + 1 : cb + 1 + t, cb] = codes[cb]
    return out


def make_ring_buffer(capacity: int):
    """Thread-safe byte ring buffer (native) or a deque-based fallback."""
    native = get_native()
    if native is not None:
        return native.RingBuffer(capacity)

    import threading

    class _PyRing:
        def __init__(self, cap):
            self.cap = cap
            self.buf = bytearray()
            self.mu = threading.Lock()

        def push(self, data: bytes) -> int:
            with self.mu:
                n = min(len(data), self.cap - len(self.buf))
                self.buf.extend(data[:n])
                return n

        def pop(self, n: int) -> bytes:
            with self.mu:
                out = bytes(self.buf[:n])
                del self.buf[:n]
                return out

        def size(self) -> int:
            with self.mu:
                return len(self.buf)

    return _PyRing(capacity)

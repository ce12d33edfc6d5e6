"""Native C++ audio runtime: build, PCM/WAV, ring buffer, label builder."""

import os
import threading
import wave

import numpy as np
import pytest

from parler_tts_tpu.native import (
    build_delayed_labels,
    float_to_pcm16,
    get_native,
    make_ring_buffer,
    write_wav,
)


def test_native_extension_builds():
    assert get_native() is not None, "g++ build of _audio_runtime.so failed"


def test_float_to_pcm16_matches_numpy():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=4096) * 0.8).astype(np.float32)
    x[:4] = [-2.0, 2.0, -1.0, 1.0]  # clamp cases
    got = np.frombuffer(float_to_pcm16(x), dtype=np.int16)
    want = (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_write_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=2048) * 0.5).astype(np.float32)
    path = str(tmp_path / "out.wav")
    n = write_wav(path, 44100, x)
    assert n == 2048
    with wave.open(path, "rb") as w:
        assert w.getframerate() == 44100
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    np.testing.assert_array_equal(data, (np.clip(x, -1, 1) * 32767.0).astype(np.int16))


def test_build_delayed_labels_matches_pattern_ops():
    """Native label builder == the jnp delay-pattern construction."""
    import jax.numpy as jnp

    from parler_tts_tpu.ops import build_delay_pattern_mask

    rng = np.random.default_rng(2)
    k, t, bos, eos = 4, 11, 1025, 1024
    codes = rng.integers(0, 1024, size=(k, t)).astype(np.int32)

    labels = build_delayed_labels(codes, bos, eos)  # (T+K+1, K)
    assert labels.shape == (t + 1 + k, k)

    # oracle: BOS + codes through the delay pattern, -1 filled with EOS
    ids = np.concatenate([np.full((1, k, 1), bos), codes[None]], axis=-1)
    _, pattern = build_delay_pattern_mask(jnp.asarray(ids), bos, eos, t + 1 + k)
    want = np.where(np.asarray(pattern)[0] == -1, eos, np.asarray(pattern)[0]).T
    np.testing.assert_array_equal(labels, want)


def test_ring_buffer_bounded_and_ordered():
    rb = make_ring_buffer(16)
    assert rb.push(b"abcdefgh") == 8
    assert rb.push(b"ijklmnopXYZ") == 8  # capacity bound: only 8 more fit
    assert rb.size() == 16
    assert rb.pop(4) == b"abcd"
    assert rb.push(b"1234") == 4
    out = rb.pop(100)
    assert out == b"efghijklmnop1234"
    assert rb.size() == 0


def test_ring_buffer_threaded():
    rb = make_ring_buffer(1 << 16)
    payload = bytes(range(256)) * 64

    def producer():
        sent = 0
        while sent < len(payload):
            sent += rb.push(payload[sent:])

    thread = threading.Thread(target=producer)
    thread.start()
    got = bytearray()
    while len(got) < len(payload):
        got.extend(rb.pop(4096))
    thread.join()
    assert bytes(got) == payload

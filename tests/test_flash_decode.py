"""Pallas flash-decode kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.ops.pallas.flash_decode import (
    flash_decode_attention,
    reference_decode_attention,
)


def make_case(seed=0, b=2, h=8, h_kv=8, dh=64, s=512, w=None):
    rng = np.random.default_rng(seed)
    qshape = (b, h, dh) if w is None else (b, w, h, dh)
    q = rng.normal(size=qshape).astype(np.float32) * 0.3
    k = rng.normal(size=(b, s, h_kv, dh)).astype(np.float32) * 0.3
    v = rng.normal(size=(b, s, h_kv, dh)).astype(np.float32) * 0.3
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


# b=1 exercises the rb==1 SMEM-scalar validity path (the primary B=1 serving
# mode); b=8 the row-blocked rb=8 path; b=2 the in-between divisor case.
@pytest.mark.parametrize("b", [1, 2, 8])
@pytest.mark.parametrize("limit", [1, 5, 255, 256, 257, 512])
def test_flash_decode_matches_oracle_prefix(b, limit):
    q, k, v = make_case(b=b)
    starts = jnp.zeros((b,), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, jnp.int32(limit), block_s=256, interpret=True)
    want = reference_decode_attention(q, k, v, starts, jnp.int32(limit))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b", [1, 2, 8])
def test_flash_decode_left_padded_starts(b):
    q, k, v = make_case(seed=1, b=b)
    rng = np.random.default_rng(7)
    starts = jnp.asarray(rng.integers(0, 120, (b,)), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, jnp.int32(300), block_s=128, interpret=True)
    want = reference_decode_attention(q, k, v, starts, jnp.int32(300))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_decode_per_row_limits():
    """Heterogeneous per-row [start, limit) inside one rb=8 row block."""
    b = 8
    q, k, v = make_case(seed=9, b=b)
    rng = np.random.default_rng(3)
    starts = jnp.asarray(rng.integers(0, 50, (b,)), jnp.int32)
    limits = jnp.asarray(rng.integers(60, 512, (b,)), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, limits, block_s=128, interpret=True)
    want = reference_decode_attention(q, k, v, starts, limits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_decode_gqa():
    q, k, v = make_case(seed=2, h=8, h_kv=2)
    starts = jnp.zeros((2,), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, jnp.int32(200), block_s=128, interpret=True)
    want = reference_decode_attention(q, k, v, starts, jnp.int32(200))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_decode_bf16():
    q, k, v = make_case(seed=3)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    starts = jnp.zeros((2,), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, jnp.int32(400), block_s=256, interpret=True)
    want = reference_decode_attention(q, k, v, starts, jnp.int32(400))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2, rtol=2e-2
    )


# ---------------------------------------------------------------- W-window
@pytest.mark.parametrize("b", [1, 2, 8])
@pytest.mark.parametrize("w", [2, 8])
def test_flash_decode_window_matches_oracle(b, w):
    """W speculative query columns, column i limited to [start, limit+i)."""
    q, k, v = make_case(seed=11, b=b, w=w)
    starts = jnp.zeros((b,), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, jnp.int32(130), block_s=128, interpret=True)
    assert got.shape == q.shape
    want = reference_decode_attention(q, k, v, starts, jnp.int32(130))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_decode_window_per_row_limits():
    """Per-row window limits (the per-row speculative forward's contract):
    each row's window column i sees its own [start_b, limit_b + i)."""
    b, w = 8, 6
    q, k, v = make_case(seed=12, b=b, w=w)
    rng = np.random.default_rng(5)
    starts = jnp.asarray(rng.integers(0, 40, (b,)), jnp.int32)
    limits = jnp.asarray(rng.integers(41, 500 - w, (b,)), jnp.int32)
    got = flash_decode_attention(q, k, v, starts, limits, block_s=128, interpret=True)
    want = reference_decode_attention(q, k, v, starts, limits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_decode_window_gqa_bf16():
    q, k, v = make_case(seed=13, b=2, h=8, h_kv=2, w=4)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    starts = jnp.asarray([0, 17], jnp.int32)
    got = flash_decode_attention(q, k, v, starts, jnp.int32(333), block_s=256, interpret=True)
    want = reference_decode_attention(q, k, v, starts, jnp.int32(333))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2, rtol=2e-2
    )


def test_flash_decode_window_block_boundaries():
    """limit+i straddling a block boundary must include exactly the extra
    slots of the next block for the tail columns only."""
    b, w = 2, 4
    q, k, v = make_case(seed=14, b=b, w=w, s=256)
    starts = jnp.zeros((b,), jnp.int32)
    for limit in [126, 127, 128]:
        got = flash_decode_attention(
            q, k, v, starts, jnp.int32(limit), block_s=128, interpret=True
        )
        want = reference_decode_attention(q, k, v, starts, jnp.int32(limit))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
        )


def test_generation_with_flash_decode_matches_default():
    """End-to-end: the opt-in flash-decode model generates the same greedy
    tokens as the XLA attention path."""
    import numpy as np
    from parler_tts_tpu.config import GenerationConfig
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.runtime.generate import make_generate
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_training_step import tiny_config, init_state
    from parler_tts_tpu.training import make_optimizer

    cfg = tiny_config()
    gen = GenerationConfig(
        max_length=20, min_new_tokens=6, do_sample=False,
        bos_token_id=89, pad_token_id=88, eos_token_id=88,
    )
    base = ParlerTTS(cfg)
    params = init_state(base, make_optimizer()).params
    flash = ParlerTTS(cfg, use_flash_decode=True)

    rng = np.random.default_rng(0)
    desc = rng.integers(0, 120, (2, 9)).astype(np.int32)
    dm = np.ones((2, 9), np.int32)
    prompt = rng.integers(0, 256, (2, 5)).astype(np.int32)
    pm = np.ones((2, 5), np.int32)
    pm[0, :2] = 0  # left padding exercises flash starts

    out_a = make_generate(base, gen)(params, desc, dm, prompt, pm, jax.random.key(0))
    out_b = make_generate(flash, gen)(params, desc, dm, prompt, pm, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out_a.delayed_ids), np.asarray(out_b.delayed_ids))


@pytest.mark.parametrize("flat", [True, False])
@pytest.mark.parametrize("layer", [0, 1, 2])
def test_flash_decode_stacked_layer_index(flat, layer):
    """`layer` selects one layer of the stacked cache via the index map —
    results must match slicing that layer out by hand (the slow path the
    index map exists to avoid)."""
    b, h, h_kv, dh, s, n_layers = 2, 8, 4, 64, 384, 3
    rng = np.random.default_rng(20 + layer)
    q = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32) * 0.3)
    ks = jnp.asarray(rng.normal(size=(n_layers, b, s, h_kv, dh)).astype(np.float32) * 0.3)
    vs = jnp.asarray(rng.normal(size=(n_layers, b, s, h_kv, dh)).astype(np.float32) * 0.3)
    starts = jnp.asarray(rng.integers(0, 40, (b,)), jnp.int32)
    limit = jnp.int32(300)
    k_in = ks.reshape(n_layers, b, s, h_kv * dh) if flat else ks
    v_in = vs.reshape(n_layers, b, s, h_kv * dh) if flat else vs
    got = flash_decode_attention(
        q, k_in, v_in, starts, limit, block_s=128, interpret=True, layer=layer
    )
    want = reference_decode_attention(q, ks[layer], vs[layer], starts, limit)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_decode_stacked_layer_windowed():
    """Stacked-layer mode composes with the W-column speculative window."""
    b, w, h, h_kv, dh, s, n_layers = 2, 4, 8, 8, 64, 384, 2
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.normal(size=(b, w, h, dh)).astype(np.float32) * 0.3)
    ks = jnp.asarray(rng.normal(size=(n_layers, b, s, h_kv, dh)).astype(np.float32) * 0.3)
    vs = jnp.asarray(rng.normal(size=(n_layers, b, s, h_kv, dh)).astype(np.float32) * 0.3)
    starts = jnp.zeros((b,), jnp.int32)
    limit = jnp.asarray([100, 250], jnp.int32)
    got = flash_decode_attention(
        q, ks, vs, starts, limit, block_s=128, interpret=True, layer=1
    )
    want = reference_decode_attention(q, ks[1], vs[1], starts, limit)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

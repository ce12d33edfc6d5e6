"""Chunked online-softmax attention == dense attention (values + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.ops.chunked_attention import chunked_attention
from parler_tts_tpu.ops.masks import dense_self_attention_bias


def dense_attention(q, k, v, mask, causal=True):
    b, tq, h, dh = q.shape
    h_kv = k.shape[2]
    g = h // h_kv
    qg = q.reshape(b, tq, h_kv, g, dh)
    s = jnp.einsum("bqkgd,bskd->bkgqs", qg.astype(jnp.float32), k.astype(jnp.float32))
    ok = mask[:, None, None, None, :].astype(bool)
    if causal:
        pos = jnp.arange(max(tq, k.shape[1]))
        ok = ok & (pos[None, : k.shape[1]] <= pos[:tq, None])[None, None, None]
    s = jnp.where(ok, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgqs,bskd->bqkgd", p, v.astype(jnp.float32))
    return out.reshape(b, tq, h, dh).astype(q.dtype)


def _case(seed=0, b=2, t=100, h=4, h_kv=4, dh=32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(b, t, h_kv, dh)), jnp.float32) * 0.3
    v = jnp.asarray(rng.normal(size=(b, t, h_kv, dh)), jnp.float32) * 0.3
    mask = np.ones((b, t), bool)
    mask[1, :17] = False  # left padding
    return q, k, v, jnp.asarray(mask)


def _compare_valid(got, want, mask, **tol):
    """Fully-masked (padded) query rows are garbage in both paths (dense:
    uniform-attention fallback; chunked: zeros) and never consumed — compare
    only valid rows."""
    sel = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[sel], np.asarray(want)[sel], **tol
    )


@pytest.mark.parametrize("chunk", [32, 64, 128])
def test_chunked_matches_dense(chunk):
    q, k, v, mask = _case()
    got = chunked_attention(q, k, v, mask, causal=True, chunk_q=chunk, chunk_k=chunk)
    want = dense_attention(q, k, v, mask, causal=True)
    _compare_valid(got, want, mask, atol=2e-5, rtol=1e-4)


def test_chunked_gqa_and_noncausal():
    q, k, v, mask = _case(seed=1, h=8, h_kv=2)
    got = chunked_attention(q, k, v, mask, causal=False, chunk_q=64, chunk_k=32)
    want = dense_attention(q, k, v, mask, causal=False)
    _compare_valid(got, want, mask, atol=2e-5, rtol=1e-4)


def test_chunked_gradients_match_dense():
    q, k, v, mask = _case(seed=2, t=70)

    sel = mask[:, :, None, None]

    def loss_chunked(q, k, v):
        out = chunked_attention(q, k, v, mask, chunk_q=32, chunk_k=32)
        return ((out * sel) ** 2).sum()

    def loss_dense(q, k, v):
        return ((dense_attention(q, k, v, mask) * sel) ** 2).sum()

    g1 = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-3)


def test_chunked_inside_jit_and_nondivisible_lengths():
    q, k, v, mask = _case(seed=3, t=101)
    f = jax.jit(lambda q, k, v: chunked_attention(q, k, v, mask, chunk_q=64, chunk_k=64))
    got = f(q, k, v)
    want = dense_attention(q, k, v, mask)
    _compare_valid(got, want, mask, atol=2e-5, rtol=1e-4)


def test_model_training_forward_chunked_matches_dense():
    """ParlerTTS(use_chunked_attention=True) == default on the training path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_training_step import tiny_config, init_state, make_batch
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.training import make_optimizer

    cfg = tiny_config()
    base = ParlerTTS(cfg)
    chunked = ParlerTTS(cfg, use_chunked_attention=True)
    params = init_state(base, make_optimizer()).params
    batch = make_batch(b=2, seed=11)

    args = (batch.input_ids, batch.attention_mask, batch.prompt_input_ids,
            batch.prompt_attention_mask, batch.labels)
    logits_a, _ = base.apply({"params": params}, *args)
    logits_b, _ = chunked.apply({"params": params}, *args)
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=3e-5, rtol=1e-4
    )


def test_model_training_forward_int_chunk_matches_dense():
    """use_chunked_attention=<int> selects that chunk size (the MFU lever;
    a non-divisor of T exercises the padding path)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_training_step import tiny_config, init_state, make_batch
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.training import make_optimizer

    cfg = tiny_config()
    base = ParlerTTS(cfg)
    chunked = ParlerTTS(cfg, use_chunked_attention=24)
    params = init_state(base, make_optimizer()).params
    batch = make_batch(b=2, seed=12)

    args = (batch.input_ids, batch.attention_mask, batch.prompt_input_ids,
            batch.prompt_attention_mask, batch.labels)
    logits_a, _ = base.apply({"params": params}, *args)
    logits_b, _ = chunked.apply({"params": params}, *args)
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=3e-5, rtol=1e-4
    )

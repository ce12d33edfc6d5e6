"""Pallas training flash attention vs a dense fp32 oracle (values + grads).

Covers the contract of reference modeling_parler_tts.py:600-814 (the
`flash_attn` training path): causal self-attention with key-validity masking,
MHA and GQA head layouts, non-block-aligned lengths, and a nonzero q_offset.
Runs the real kernels through the Pallas interpreter on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.ops.pallas.flash_attention import flash_attention

NEG_INF = jnp.finfo(jnp.float32).min


def dense_oracle(q, k, v, mask, causal=True, q_offset=0):
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    g = h // k.shape[2]
    kk = jnp.repeat(k, g, axis=2) if g > 1 else k
    vv = jnp.repeat(v, g, axis=2) if g > 1 else v
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kk.astype(jnp.float32))
    ok = mask[:, None, None, :].astype(bool)
    if causal:
        qp = jnp.arange(tq)[:, None] + q_offset
        kp = jnp.arange(tk)[None, :]
        ok = ok & (kp <= qp)[None, None]
    s = jnp.where(ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vv.astype(jnp.float32))
    return out.astype(q.dtype)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


@pytest.mark.parametrize(
    "tq,tk,h,h_kv,causal,q_offset",
    [
        (256, 256, 4, 4, True, 0),       # MHA causal, block-aligned
        (200, 200, 4, 4, True, 0),       # non-block-aligned lengths
        (128, 384, 4, 4, True, 256),     # q block at an offset into the keys
        (256, 256, 8, 2, True, 0),       # GQA (4 query heads per kv head)
        (192, 256, 4, 4, False, 0),      # non-causal
    ],
)
def test_flash_attention_matches_dense(tq, tk, h, h_kv, causal, q_offset):
    b, dh = 2, 64
    ks = jax.random.split(jax.random.key(0), 4)
    q = _rand(ks[0], b, tq, h, dh) * dh**-0.5
    k = _rand(ks[1], b, tk, h_kv, dh)
    v = _rand(ks[2], b, tk, h_kv, dh)
    # ragged key validity (right-padding)
    lens = jnp.array([tk, max(1, tk - 37)])[:b]
    mask = jnp.arange(tk)[None, :] < lens[:, None]

    got = flash_attention(
        q, k, v, mask, causal=causal, q_offset=q_offset,
        block_q=128, block_k=128,
    )
    want = dense_oracle(q, k, v, mask, causal=causal, q_offset=q_offset)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("h,h_kv", [(4, 4), (8, 2)])
def test_flash_attention_grads_match_dense(h, h_kv):
    b, tq, tk, dh = 2, 200, 200, 64
    ks = jax.random.split(jax.random.key(1), 4)
    q = _rand(ks[0], b, tq, h, dh) * dh**-0.5
    k = _rand(ks[1], b, tk, h_kv, dh)
    v = _rand(ks[2], b, tk, h_kv, dh)
    mask = jnp.arange(tk)[None, :] < jnp.array([tk, tk - 53])[:, None]
    w = _rand(ks[3], b, tq, h, dh)  # fixed cotangent direction

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, mask, causal=True,
                            block_q=128, block_k=128) * w
        )

    def loss_dense(q, k, v):
        return jnp.sum(dense_oracle(q, k, v, mask, causal=True) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            got, want, atol=3e-4, rtol=3e-4,
            err_msg=f"d{name} mismatch",
        )


def test_flash_attention_bf16_close_to_fp32_oracle():
    b, t, h, dh = 1, 256, 4, 64
    ks = jax.random.split(jax.random.key(2), 3)
    q = _rand(ks[0], b, t, h, dh, dtype=jnp.bfloat16) * dh**-0.5
    k = _rand(ks[1], b, t, h, dh, dtype=jnp.bfloat16)
    v = _rand(ks[2], b, t, h, dh, dtype=jnp.bfloat16)
    mask = jnp.ones((b, t), bool)
    got = flash_attention(q, k, v, mask, block_q=128, block_k=128)
    assert got.dtype == jnp.bfloat16
    want = dense_oracle(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), mask
    )
    np.testing.assert_allclose(
        got.astype(jnp.float32), want, atol=3e-2, rtol=3e-2
    )


def test_model_training_pallas_flash_matches_dense():
    """ParlerTTS(use_chunked_attention="pallas") == default: loss AND grads."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_training_step import init_state, make_batch, tiny_config

    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.training import make_optimizer

    cfg = tiny_config()
    base = ParlerTTS(cfg)
    flash = ParlerTTS(cfg, use_chunked_attention="pallas")
    params = init_state(base, make_optimizer()).params
    batch = make_batch(b=2, seed=11)
    args = (batch.input_ids, batch.attention_mask, batch.prompt_input_ids,
            batch.prompt_attention_mask, batch.labels)

    logits_a, _ = base.apply({"params": params}, *args)
    logits_b, _ = flash.apply({"params": params}, *args)
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=3e-5, rtol=1e-4
    )

    # grads through the whole model (fixed cotangent so both paths see the
    # same backward signal)
    w = jax.random.normal(jax.random.key(7), logits_a.shape)

    def loss_fn(model):
        return lambda p: jnp.sum(model.apply({"params": p}, *args)[0] * w)

    ga = jax.grad(loss_fn(base))(params)
    gb = jax.grad(loss_fn(flash))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )


def test_flash_attention_matches_chunked_attention():
    """Same contract as the JAX fallback used by `use_chunked_attention`."""
    from parler_tts_tpu.ops.chunked_attention import chunked_attention

    b, t, h, dh = 2, 300, 4, 64
    ks = jax.random.split(jax.random.key(3), 3)
    q = _rand(ks[0], b, t, h, dh) * dh**-0.5
    k = _rand(ks[1], b, t, h, dh)
    v = _rand(ks[2], b, t, h, dh)
    mask = jnp.arange(t)[None, :] < jnp.array([t, t - 29])[:, None]
    got = flash_attention(q, k, v, mask, block_q=128, block_k=128)
    want = chunked_attention(q, k, v, mask, causal=True, chunk_q=128, chunk_k=128)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

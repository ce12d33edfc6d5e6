"""Sinusoidal + RoPE parity with the reference torch formulas."""

import math

import jax.numpy as jnp
import numpy as np
import torch

from parler_tts_tpu.ops import apply_rope, rope_cos_sin, sinusoidal_embed, sinusoidal_table


def torch_sinusoidal(num_embeddings, embedding_dim):
    """Oracle: modeling_parler_tts.py:345-360 (tensor2tensor [cos|sin] layout)."""
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = torch.exp(torch.arange(half_dim, dtype=torch.int64).float() * -emb)
    emb = torch.arange(num_embeddings, dtype=torch.int64).float().unsqueeze(1) * emb.unsqueeze(0)
    emb = torch.cat([torch.cos(emb), torch.sin(emb)], dim=1).view(num_embeddings, -1)
    if embedding_dim % 2 == 1:
        emb = torch.cat([emb, torch.zeros(num_embeddings, 1)], dim=1)
    return emb


def torch_rope(position_ids, dim, base):
    """Oracle: modeling_parler_tts.py:373-406 (llama duplicated-freq layout)."""
    inv_freq = 1.0 / (base ** (torch.arange(0, dim, 2, dtype=torch.int64).float() / dim))
    inv_freq_expanded = inv_freq[None, :, None].expand(position_ids.shape[0], -1, 1)
    position_ids_expanded = position_ids[:, None, :].float()
    freqs = (inv_freq_expanded @ position_ids_expanded).transpose(1, 2)
    emb = torch.cat((freqs, freqs), dim=-1)
    return emb.cos(), emb.sin()


def test_sinusoidal_table_matches_reference():
    for dim in (512, 1024, 64):
        ours = np.asarray(sinusoidal_table(100, dim))
        ref = torch_sinusoidal(100, dim).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sinusoidal_embed_offset():
    table = sinusoidal_table(50, 64)
    pos = jnp.arange(5) + 7
    out = sinusoidal_embed(table, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[7:12], atol=0)


def test_rope_cos_sin_matches_reference():
    pos = torch.tensor([[0, 1, 2, 5, 9], [3, 3, 4, 4, 100]])
    ref_cos, ref_sin = torch_rope(pos, 64, 10000.0)
    cos, sin = rope_cos_sin(jnp.asarray(pos.numpy()), 64, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), ref_sin.numpy(), atol=1e-5)


def test_apply_rope_matches_reference_rotate_half():
    def torch_rotate_half(x):
        x1 = x[..., : x.shape[-1] // 2]
        x2 = x[..., x.shape[-1] // 2 :]
        return torch.cat((-x2, x1), dim=-1)

    rng = np.random.default_rng(0)
    # torch layout: (B, H, T, Dh); ours: (B, T, H, Dh)
    x = rng.normal(size=(2, 5, 3, 64)).astype(np.float32)  # B,T=5,H=3,Dh
    pos = np.array([[0, 1, 2, 3, 4], [2, 2, 3, 7, 8]])

    cos, sin = rope_cos_sin(jnp.asarray(pos), 64, 10000.0)
    ours = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

    tx = torch.tensor(x).permute(0, 2, 1, 3)  # B,H,T,Dh
    tcos, tsin = torch_rope(torch.tensor(pos), 64, 10000.0)
    ref = tx * tcos.unsqueeze(1) + torch_rotate_half(tx) * tsin.unsqueeze(1)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)


def test_rope_preserves_inner_products_shift_invariance():
    # <rope(q,p), rope(k,p')> depends only on p - p'
    q = jnp.ones((1, 1, 1, 64))
    k = jnp.ones((1, 1, 1, 64))

    def score(pq, pk):
        cq, sq = rope_cos_sin(jnp.array([[pq]]), 64)
        ck, sk = rope_cos_sin(jnp.array([[pk]]), 64)
        return float(jnp.sum(apply_rope(q, cq, sq) * apply_rope(k, ck, sk)))

    assert abs(score(5, 3) - score(12, 10)) < 1e-4

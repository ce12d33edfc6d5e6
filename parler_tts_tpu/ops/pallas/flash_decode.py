"""Pallas flash-decode attention over the static KV cache.

Single-token decode attention for the AR loop (BASELINE.json north star).
Fuses what the XLA path does in several ops — bias construction, q·K, masking,
softmax, ·V — into one kernel with two structural wins:

Measured reality check (v5e, mini-v1 shapes, B=1, S=896): the fused XLA path
runs ~76us/layer-call and this kernel ~70-170us — at single-utterance decode
the attention is op-overhead-bound, not bandwidth-bound, so the kernel is an
OPT-IN (`ParlerTTS(..., use_flash_decode=True)`); its prefix-bounded reads pay
off as batch x cache_len grows (batched serving).

Structural wins:

  1. prefix-bounded bandwidth: the kernel only streams cache blocks up to the
     current write index. The scalar-prefetch index map pins all later grid
     steps to the last needed block, so the Pallas pipeline fetches it once
     and `pl.when` skips their compute — early decode steps read a fraction
     of the cache instead of all `max_length` slots;
  2. mask-free masking: validity is the range [start_b, limit) (left-padded
     prompt start per batch row, current length), computed from block
     coordinates — no (B, 1, T, S) bias array is ever materialized.

Layout: q (B, H, Dh) pre-scaled (+RoPE'd); k/v (B, S, H_kv, Dh) — one layer of
the stacked cache; GQA handled by repeating kv heads in-register. The online
softmax runs in fp32 scratch; blocks are VPU-friendly (the per-step attention
is bandwidth-, not MXU-, bound at decode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _decode_kernel(
    bounds_ref,          # scalar prefetch: (B, 2) int32 [start, limit]
    q_ref,               # (1, H, Dh) VMEM
    k_ref,               # (1, BLK, H_kv, Dh) VMEM (pipelined block)
    v_ref,               # (1, BLK, H_kv, Dh) VMEM
    out_ref,             # (1, H, Dh) VMEM
    m_ref,               # (H, 128) f32 scratch (running max, col 0 used)
    l_ref,               # (H, 128) f32 scratch (running denom, col 0 used)
    acc_ref,             # (H, Dh) f32 scratch
    *,
    block_s: int,
    groups: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nblk = pl.num_programs(1)

    start = bounds_ref[b, 0]
    limit = bounds_ref[b, 1]
    last_needed = jnp.maximum((limit + block_s - 1) // block_s - 1, 0)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)                    # (H, Dh)
        k = k_ref[0].astype(jnp.float32)                    # (BLK, H_kv, Dh)
        v = v_ref[0].astype(jnp.float32)

        # scores[s, h] with query head h = kv * groups + g using kv head h//G
        # (torch repeat_kv layout, reference modeling:279-289); VPU reduce —
        # no MXU needed for a single query.
        if groups > 1:
            h_kv = k.shape[1]
            qg = q.reshape(h_kv, groups, q.shape[-1])       # (H_kv, G, Dh)
            scores = jnp.sum(
                k[:, :, None, :] * qg[None], axis=-1
            ).reshape(k.shape[0], -1)                        # (BLK, H)
        else:
            scores = jnp.sum(k * q[None], axis=-1)          # (BLK, H)

        # the block the index map actually loaded (blocks past last_needed are
        # pinned to last_needed, so global positions must use the pinned id)
        blk_id = jnp.minimum(j, last_needed)
        pos = blk_id * block_s + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=0
        )
        valid = (pos >= start) & (pos < limit)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, 0]                                # (H,)
        m_blk = jnp.max(scores, axis=0)                     # (H,)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(scores - m_new[None, :])                # (BLK, H)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)                     # (H,)

        l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=0)
        if groups > 1:
            h_kv = v.shape[1]
            pg = p.reshape(p.shape[0], h_kv, groups)         # (BLK, H_kv, G)
            pv = jnp.sum(
                pg[..., None] * v[:, :, None, :], axis=0
            ).reshape(-1, v.shape[-1])                        # (H, Dh)
        else:
            pv = jnp.sum(p[:, :, None] * v, axis=0)          # (H, Dh)
        acc_ref[...] = acc_ref[...] * alpha[:, None] + pv
        m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(j == nblk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0], 1e-30)
        out_ref[0] = (acc_ref[...] / denom[:, None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attention(
    q: jnp.ndarray,        # (B, H, Dh) — pre-scaled (and RoPE'd) query
    k: jnp.ndarray,        # (B, S, H_kv, Dh) cache keys
    v: jnp.ndarray,        # (B, S, H_kv, Dh) cache values
    starts: jnp.ndarray,   # (B,) first valid slot (left-pad offset)
    limit: jnp.ndarray,    # () or (B,) — number of written slots
    block_s: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, Dh) attention output over the valid cache prefix."""
    b, h, dh = q.shape
    s = k.shape[1]
    h_kv = k.shape[2]
    groups = h // h_kv
    block_s = min(block_s, s)
    nblk = pl.cdiv(s, block_s)
    # Mosaic only targets TPU; fall back to the interpreter elsewhere (tests)
    interpret = interpret or jax.default_backend() != "tpu"

    limit = jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (b,))
    bounds = jnp.stack([starts.astype(jnp.int32), limit], axis=1)  # (B, 2)

    def kv_index_map(bi, j, bounds_ref):
        last = jnp.maximum((bounds_ref[bi, 1] + block_s - 1) // block_s - 1, 0)
        return (bi, jnp.minimum(j, last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda bi, j, bounds: (bi, 0, 0)),
            pl.BlockSpec((1, block_s, h_kv, dh), kv_index_map),
            pl.BlockSpec((1, block_s, h_kv, dh), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda bi, j, bounds: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, dh), jnp.float32),
        ],
    )

    return pl.pallas_call(
        functools.partial(_decode_kernel, block_s=block_s, groups=groups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        interpret=interpret,
    )(bounds, q, k, v)


def reference_decode_attention(q, k, v, starts, limit):
    """XLA oracle with identical semantics (for tests)."""
    b, h, dh = q.shape
    s = k.shape[1]
    h_kv = k.shape[2]
    g = h // h_kv
    pos = jnp.arange(s)[None, :]
    limit = jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (b,))
    valid = (pos >= starts[:, None]) & (pos < limit[:, None])  # (B, S)
    qg = q.reshape(b, h_kv, g, dh)
    scores = jnp.einsum("bkgd,bskd->bkgs", qg.astype(jnp.float32), k.astype(jnp.float32))
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bskd->bkgd", p, v.astype(jnp.float32))
    return out.reshape(b, h, dh).astype(q.dtype)

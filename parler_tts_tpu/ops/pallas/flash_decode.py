"""Pallas flash-decode attention over the static KV cache.

Decode attention for the AR loop (BASELINE.json north star) and for the
speculative W-column window forward (`runtime/speculative.py`). Fuses what
the XLA path does in several ops — q·K, masking, softmax, ·V — into one
kernel with three structural wins:

  1. prefix-bounded bandwidth: the kernel only streams cache blocks up to the
     current write index. The scalar-prefetch index map pins all later grid
     steps to the last needed block, so the Pallas pipeline fetches it once
     and `pl.when` skips their compute — early decode steps read a fraction
     of the cache instead of all `max_length` slots;
  2. MXU-shaped compute: a single decode query makes q·K a per-head MATVEC,
     which XLA strength-reduces to a VPU loop fusion that streams the cache
     at ~170 GB/s (profiled at B=8: 88 us per 14.7 MB layer read — the
     dominant cost of the batched step). Here both contractions run on the
     MXU as real matmuls via a block-diagonal query: qbd (H_kv*Dh, W*H) with
     qbd[kv*Dh:(kv+1)*Dh, i*H + kv*G+g] = q_{i, kv*G+g}, so
        scores (BLK, W*H)     = K2d (BLK, H_kv*Dh) @ qbd   — one dot
        ctx    (W*H, H_kv*Dh) = P^T (W*H, BLK)     @ V2d   — one dot
     and the per-head context is the diagonal block of ctx, extracted by a
     third tiny matmul (mask + stacked-identity fold; Mosaic cannot split
     the 1024-lane minor dim in-kernel). The off-diagonal MACs are free
     (~4 MFLOP against a 512 KB DMA), leaving the step DMA-bound.
     W speculative query columns ride the SAME cache stream as one: they
     become W*H query columns of the same two dots, each with its own causal
     limit (column i sees [start, limit + i)) — this is how per-row
     speculation and the flash kernel COMPOSE (the window forward was the
     last hot path on dense-XLA attention);
  3. row-blocked grid: the grid iterates sequentially on one TensorCore, so
     (B, nblk) grid steps cost ~1 us each in fixed overhead — at B=32 that
     is 3k steps (~3 ms/token across 24 layers), dwarfing the DMA. Batching
     RB=8 rows per grid step (batched MXU dots over the row dimension) cuts
     the step count 8x; per-row [start, limit) masking keeps semantics.

Companion layout: the decode cache is stored FLAT as (L, B, S, H_kv*Dh)
(`DecoderCache.zeros(flat_self=True)`), so the per-layer 2-D slice the
kernel consumes is a bitcast. Feeding the kernel from the 5-D cache instead
makes XLA satisfy the kernel's row-major operand with an S-minor cache
layout — turning every one-token DUS write into an 11 us strided scatter
(+0.9 ms/step at B=8, profiled) plus 19 us/layer slice copies.

Measured v5e, mini-v1 shapes, full 860-step generation (benchmarks/
serving_frontier.py --mode fd): see INFERENCE.md's serving-frontier table.
The VPU predecessor of this kernel matched plain XLA at B=8 (3.9 ms/step)
and lost at B=32; this version is the batched-serving default path.

Layout: q (B, H, Dh) — or (B, W, H, Dh) for a W-column speculative window —
pre-scaled (+RoPE'd); k/v (B, S, H_kv, Dh) — one layer of the stacked cache
(a bitcast view when the cache is flat); GQA handled by the block-diagonal
query placement. The online softmax runs in fp32 scratch; P is cast to the
cache dtype for the MXU ·V dot (max-subtracted, so |p| <= 1 and bf16's 2^-8
granularity is benign — the same choice every production flash-attention
kernel makes; fp32 caches keep full precision).

Reference parity: this implements the decode-step slice of the reference's
attention (`/root/reference/parler_tts/modeling_parler_tts.py:439-584`) over
its StaticCache layout (:3254-3309), with left-padded-prompt validity
[start_b, limit) instead of a materialized (B,1,T,S) bias.
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
    boundsv_ref,         # (1, 8, 128) int32 VMEM — rows r<RB: [0,r,0]=start,
                         # [0,r,1]=limit. The bounds as vectors, padded to a
                         # full (8,128) tile (Mosaic crashes on SMEM-scalar ->
                         # vector stacks in-kernel, and sub-8-sublane blocks
                         # are rejected)
    coloff_ref,          # (8, WH) int32 VMEM — row 0: query-column offset per
                         # score column (c // H), same padding rationale
    qbd_ref,             # (RB, H_kv*Dh, W*H) VMEM — block-diagonal queries
    msel_ref,            # (W*H, H_kv*Dh) f32 VMEM — per-head kv-block mask
    fold_ref,            # (H_kv*Dh, Dh) f32 VMEM — segment-fold identity
    k_ref,               # (1, RB, BLK, H_kv*Dh) VMEM (pipelined block; the
                         # leading 1 is the layer axis of the stacked cache —
                         # the index map selects the layer, so the kernel DMAs
                         # straight out of the full (L, B, S, HD) buffer and
                         # XLA never materializes a per-layer slice copy)
    v_ref,               # (1, RB, BLK, H_kv*Dh) VMEM
    out_ref,             # (RB, W*H, Dh) VMEM
    m_ref,               # (RB, W*H, 128) f32 scratch (running max, col 0 used)
    l_ref,               # (RB, W*H, 128) f32 scratch (running denom, col 0)
    acc_ref,             # (RB, W*H, Dh) f32 scratch
    *,
    block_s: int,
    rb: int,
    wq: int,
):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    nblk = pl.num_programs(1)

    lim_max = bounds_ref[bi * rb, 1]
    for r in range(1, rb):
        lim_max = jnp.maximum(lim_max, bounds_ref[bi * rb + r, 1])
    lim_max = lim_max + (wq - 1)  # last window column sees wq-1 extra slots
    last_needed = jnp.maximum((lim_max + block_s - 1) // block_s - 1, 0)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_needed)
    def _compute():
        # batched MXU: (RB, BLK, H_kv*Dh) @ (RB, H_kv*Dh, W*H) -> (RB, BLK, W*H)
        scores = jax.lax.dot_general(
            k_ref[0], qbd_ref[...],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

        pos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        # query column i attends [start, limit + i): shift pos by the
        # per-score-column offset so one (pos' < limit) compare serves every
        # window column (the start bound is column-independent — use pos)
        pos_c = pos - coloff_ref[0, :][None, None, :] if wq > 1 else pos
        if rb == 1:
            # single row: SMEM scalars broadcast fine (and Mosaic rejects
            # 1-row vector slices of the padded bounds tile)
            valid = (pos >= bounds_ref[bi, 0]) & (pos_c < bounds_ref[bi, 1])
        else:
            starts = boundsv_ref[0, :rb, 0]                 # (RB,)
            limits = boundsv_ref[0, :rb, 1]
            valid = (
                (pos >= starts[:, None, None])
                & (pos_c < limits[:, None, None])
            )
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :, 0]                             # (RB, W*H)
        m_blk = jnp.max(scores, axis=1)                     # (RB, W*H)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(scores - m_new[:, None, :])             # (RB, BLK, W*H)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)                     # (RB, W*H)
        l_new = l_ref[:, :, 0] * alpha + jnp.sum(p, axis=1)

        # batched MXU: P^T @ V2d -> (RB, W*H, H_kv*Dh); per-head context is
        # the diagonal kv block, extracted by the masked fold matmul.
        ctx = jax.lax.dot_general(
            p.astype(v_ref.dtype),  # bf16 cache -> bf16 P (max-subtracted,
            v_ref[0],               # |p|<=1); f32 inputs keep full precision
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                    # (RB, W*H, HD)
        wh, hd = msel_ref.shape
        dh = fold_ref.shape[1]
        masked = (ctx * msel_ref[...][None]).reshape(rb * wh, hd)
        pv = jax.lax.dot_general(
            masked, fold_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rb, wh, dh)                                # (RB, W*H, Dh)

        acc_ref[...] = acc_ref[...] * alpha[:, :, None] + pv
        m_ref[...] = jnp.broadcast_to(m_new[:, :, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new[:, :, None], l_ref.shape)

    @pl.when(j == nblk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :, 0], 1e-30)
        out_ref[...] = (acc_ref[...] / denom[:, :, None]).astype(out_ref.dtype)


def _row_block(b: int, row_block: int) -> int:
    """Largest divisor of b that is <= row_block (grid rows per step)."""
    rb = min(row_block, b)
    while b % rb:
        rb -= 1
    return rb


@functools.partial(
    jax.jit, static_argnames=("block_s", "row_block", "interpret", "layer")
)
def flash_decode_attention(
    q: jnp.ndarray,        # (B, H, Dh) or (B, W, H, Dh) — pre-scaled, RoPE'd
    k: jnp.ndarray,        # (B, S, H_kv, Dh) cache keys — or, with `layer`,
                           # the FULL stacked cache (L, B, S, H_kv*Dh) flat /
                           # (L, B, S, H_kv, Dh)
    v: jnp.ndarray,        # same layout as k
    starts: jnp.ndarray,   # (B,) first valid slot (left-pad offset)
    limit: jnp.ndarray,    # () or (B,) — slots visible to the FIRST query
                           # column; window column i sees [start, limit + i)
    block_s: int = 256,
    row_block: int = 8,
    interpret: bool = False,
    layer: int | None = None,
) -> jnp.ndarray:
    """Attention output over the valid cache prefix.

    Returns (B, H, Dh) for a rank-3 q, (B, W, H, Dh) for a rank-4 q (the
    speculative window forward: W query columns at consecutive positions,
    column i causally limited to `limit + i` slots).

    `layer` (static — the decoder's layers are unrolled) selects one layer of
    a stacked cache via the BlockSpec index map. This is load-bearing for
    performance: slicing `cache[l]` in the caller makes XLA materialize a
    full per-layer copy to feed the custom call (profiled at B=32: 120 us x
    2 x 24 layers = 5.8 ms/step, 68% of the decode loop — the former "B>=32
    roofline gap"). With the index map, the kernel's double-buffered DMA
    reads the big buffer in place and the copy disappears.
    """
    windowed = q.ndim == 4
    if windowed:
        b, wq, h, dh = q.shape
    else:
        b, h, dh = q.shape
        wq = 1
    if layer is None:
        # per-layer (B, S, H_kv, Dh) operand: view as a 1-layer stacked cache
        k = k.reshape((1,) + k.shape)
        v = v.reshape((1,) + v.shape)
        layer = 0
    if k.ndim == 5:  # (L, B, S, H_kv, Dh) -> flat minor dims (a bitcast)
        k = k.reshape(k.shape[:3] + (-1,))
        v = v.reshape(v.shape[:3] + (-1,))
    s = k.shape[2]
    hd_tot = k.shape[3]
    h_kv = hd_tot // dh
    groups = h // h_kv
    wh = wq * h
    itemsize = jnp.dtype(k.dtype).itemsize

    rb = _row_block(b, row_block)
    # VMEM budget: the double-buffered K+V row block must fit alongside the
    # block-diagonal queries and the kernel's fp32 intermediates (scores/p:
    # 2*BLK*WH, ctx+masked: 2*WH*HD). Mosaic hard-fails around ~16 MB; stay
    # conservative (W=1 keeps the long-measured rb=8/block=256 point).
    def vmem_bytes(rb_, blk_):
        kv = 4 * rb_ * blk_ * hd_tot * itemsize
        qb = rb_ * hd_tot * wh * itemsize
        inter = 2 * rb_ * blk_ * wh * 4 + 2 * rb_ * wh * hd_tot * 4
        acc = rb_ * wh * (dh + 2 * 128) * 4
        return kv + qb + (inter + acc if wq > 1 else 0)

    budget = 12 * 1024 * 1024
    while vmem_bytes(rb, block_s) > budget and block_s > 128:
        block_s //= 2
    while vmem_bytes(rb, block_s) > budget and rb > 1:
        rb = _row_block(b, rb - 1)
    block_s = min(block_s, s)
    nblk = pl.cdiv(s, block_s)
    # Mosaic only targets TPU; fall back to the interpreter elsewhere (tests)
    interpret = interpret or jax.default_backend() != "tpu"

    limit = jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (b,))
    bounds = jnp.stack([starts.astype(jnp.int32), limit], axis=1)  # (B, 2)
    # VMEM copy of the bounds, (n_row_blocks, 8, 128)-padded to a full tile
    boundsv = jnp.zeros((b // rb, 8, 128), jnp.int32)
    boundsv = boundsv.at[:, :rb, :2].set(bounds.reshape(b // rb, rb, 2))
    # per-score-column query offsets (c // H), 8-sublane padded
    coloff = jnp.zeros((8, wh), jnp.int32)
    coloff = coloff.at[0, :].set(jnp.arange(wh, dtype=jnp.int32) // h)

    # Block-diagonal query (B, H_kv*Dh, W*H): query head h = kv*G + g of window
    # column i sits in kv head kv's Dh rows at column i*H + h (torch repeat_kv
    # layout, reference modeling:279-289). ~B*W*H*H_kv*Dh MACs once per layer
    # call — noise next to the cache DMA.
    sel = (
        jnp.arange(h, dtype=jnp.int32)[:, None] // groups
        == jnp.arange(h_kv, dtype=jnp.int32)[None, :]
    )                                                        # (H, H_kv)
    q4 = q if windowed else q[:, None]
    qbd = jnp.einsum(
        "bwhd,hk->bkdwh", q4.astype(jnp.float32), sel.astype(jnp.float32)
    ).reshape(b, hd_tot, wh).astype(k.dtype)
    # (W*H, H_kv*Dh) mask selecting head h's kv segment, and the (H_kv*Dh, Dh)
    # stacked identity folding segments onto Dh — the kernel's third matmul.
    msel = jnp.tile(
        jnp.repeat(sel.astype(jnp.float32), dh, axis=1), (wq, 1)
    )                                                        # (W*H, H_kv*Dh)
    fold = jnp.tile(jnp.eye(dh, dtype=jnp.float32), (h_kv, 1))  # (H_kv*Dh, Dh)

    def kv_index_map(bi, j, bounds_ref):
        lim = bounds_ref[bi * rb, 1]
        for r in range(1, rb):
            lim = jnp.maximum(lim, bounds_ref[bi * rb + r, 1])
        lim = lim + (wq - 1)
        last = jnp.maximum((lim + block_s - 1) // block_s - 1, 0)
        return (layer, bi, jnp.minimum(j, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // rb, nblk),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda bi, j, bounds: (bi, 0, 0)),
            pl.BlockSpec((8, wh), lambda bi, j, bounds: (0, 0)),
            pl.BlockSpec((rb, hd_tot, wh), lambda bi, j, bounds: (bi, 0, 0)),
            pl.BlockSpec((wh, hd_tot), lambda bi, j, bounds: (0, 0)),
            pl.BlockSpec((hd_tot, dh), lambda bi, j, bounds: (0, 0)),
            pl.BlockSpec((1, rb, block_s, hd_tot), kv_index_map),
            pl.BlockSpec((1, rb, block_s, hd_tot), kv_index_map),
        ],
        out_specs=pl.BlockSpec((rb, wh, dh), lambda bi, j, bounds: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rb, wh, 128), jnp.float32),
            pltpu.VMEM((rb, wh, 128), jnp.float32),
            pltpu.VMEM((rb, wh, dh), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_s=block_s, rb=rb, wq=wq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, wh, dh), q.dtype),
        interpret=interpret,
    )(bounds, boundsv, coloff, qbd, msel, fold, k, v)
    return out.reshape(b, wq, h, dh) if windowed else out


def reference_decode_attention(q, k, v, starts, limit):
    """XLA oracle with identical semantics (for tests). Accepts rank-3
    (B, H, Dh) or rank-4 (B, W, H, Dh) queries like the kernel."""
    windowed = q.ndim == 4
    q4 = q if windowed else q[:, None]
    b, wq, h, dh = q4.shape
    s = k.shape[1]
    h_kv = k.shape[2]
    g = h // h_kv
    pos = jnp.arange(s)[None, None, :]                        # (1, 1, S)
    limit = jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (b,))
    lim_w = limit[:, None] + jnp.arange(wq)[None, :]          # (B, W)
    valid = (pos >= starts[:, None, None]) & (pos < lim_w[:, :, None])
    qg = q4.reshape(b, wq, h_kv, g, dh)
    scores = jnp.einsum(
        "bwkgd,bskd->bwkgs", qg.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = jnp.where(valid[:, :, None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bwkgs,bskd->bwkgd", p, v.astype(jnp.float32))
    out = out.reshape(b, wq, h, dh).astype(q.dtype)
    return out if windowed else out[:, 0]

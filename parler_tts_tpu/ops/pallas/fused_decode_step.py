"""Fused decode step: ALL decoder layers in ONE Pallas kernel per token.

The XLA decode step executes ~600 ops per token; at B=1 the step time is bound
by that serial op chain, not FLOPs (profiled in INFERENCE.md). This kernel
collapses the whole layer stack into a single `pallas_call` with grid=(L,):

  - the activation is carried across grid steps in VMEM scratch (one grid step
    per layer; TPU grids execute sequentially);
  - int8 weights live in HBM (`memory_space=ANY`) and are DMA'd just-in-time
    — 1 byte/weight of HBM traffic (weight-only quantization,
    per-output-channel scales, utils/quantize.py). All six attention
    projections of a layer travel as ONE (D, 6D) DMA, and the fc1/fc2 DMAs are
    started at layer entry and awaited only when the MLP needs them, so they
    overlap the attention compute (serial per-projection DMAs were the
    bottleneck of the first version: 8 waits/layer ~= the whole XLA step);
  - self-attention streams the KV-cache prefix in aligned blocks with an
    online softmax; the current token's k/v (not yet in the cache) contribute
    as an extra block, and the (B=1) new rows are returned for XLA to scatter
    into the cache (Mosaic cannot DMA-write at unaligned dynamic rows);
  - per-head reductions avoid (S, H, Dh) relayouts via constant head-sum /
    head-expand matrices: scores = (k * q) @ M, weighted V = (probs @ E) * v.

Scope: B=1, MHA (H == H_kv), sinusoidal-position checkpoints (v1 family —
RoPE models fall back to the XLA path). Cross-attention uses the precomputed
per-layer cross k/v reshaped to (L, S_enc, H*Dh).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import DecoderConfig

NEG_INF = float(jnp.finfo(jnp.float32).min)


class FusedParams(NamedTuple):
    """Per-layer stacked tensors in kernel layout (int8 weights + scales)."""

    ln1_scale: jnp.ndarray  # (L, D) f32   self_attn_layer_norm
    ln1_bias: jnp.ndarray
    ln2_scale: jnp.ndarray  # encoder_attn_layer_norm
    ln2_bias: jnp.ndarray
    ln3_scale: jnp.ndarray  # final_layer_norm (per-layer MLP norm)
    ln3_bias: jnp.ndarray
    w_attn: jnp.ndarray     # (L, D, 6D) int8: [q | k | v | o | cq | co]
    s_attn: jnp.ndarray     # (L, 6D) f32
    wfc1: jnp.ndarray       # (L, D, F) int8
    sfc1: jnp.ndarray       # (L, F)
    wfc2: jnp.ndarray       # (L, F, D) int8
    sfc2: jnp.ndarray       # (L, D)
    head_sum: jnp.ndarray   # (D, H) bf16 one-hot head reducer (M)
    head_expand: jnp.ndarray  # (H, D) bf16 head expander (E = M.T)


def prepare_fused_params(decoder_params: Dict[str, Any], config: DecoderConfig) -> FusedParams:
    """Quantize + stack a `ParlerDecoder` params tree into kernel layout."""
    from ...utils.quantize import quantize_kernel

    L = config.num_hidden_layers
    d, h, dh = config.hidden_size, config.num_attention_heads, config.head_dim
    assert config.num_key_value_heads == h, "fused kernel supports MHA only"

    def stack_ln(name, field):
        return np.stack(
            [np.asarray(decoder_params[f"layers_{i}"][name][field], np.float32) for i in range(L)]
        )

    def quant(i, *path):
        node = decoder_params[f"layers_{i}"]
        for p in path:
            node = node[p]
        return quantize_kernel(np.asarray(node["kernel"], np.float32))

    w_attn, s_attn, wfc1, sfc1, wfc2, sfc2 = [], [], [], [], [], []
    attn_paths = [
        ("self_attn", "q_proj"), ("self_attn", "k_proj"), ("self_attn", "v_proj"),
        ("self_attn", "out_proj"), ("encoder_attn", "q_proj"), ("encoder_attn", "out_proj"),
    ]
    for i in range(L):
        qs = [quant(i, *p) for p in attn_paths]
        w_attn.append(np.concatenate([q["w_q"] for q in qs], axis=1))   # (D, 6D)
        s_attn.append(np.concatenate([q["scale"] for q in qs]))         # (6D,)
        q1 = quant(i, "fc1")
        q2 = quant(i, "fc2")
        wfc1.append(q1["w_q"])
        sfc1.append(q1["scale"])
        wfc2.append(q2["w_q"])
        sfc2.append(q2["scale"])

    head_sum = np.zeros((d, h), np.float32)
    for hh in range(h):
        head_sum[hh * dh:(hh + 1) * dh, hh] = 1.0

    return FusedParams(
        ln1_scale=jnp.asarray(stack_ln("self_attn_layer_norm", "scale")),
        ln1_bias=jnp.asarray(stack_ln("self_attn_layer_norm", "bias")),
        ln2_scale=jnp.asarray(stack_ln("encoder_attn_layer_norm", "scale")),
        ln2_bias=jnp.asarray(stack_ln("encoder_attn_layer_norm", "bias")),
        ln3_scale=jnp.asarray(stack_ln("final_layer_norm", "scale")),
        ln3_bias=jnp.asarray(stack_ln("final_layer_norm", "bias")),
        w_attn=jnp.asarray(np.stack(w_attn)),
        s_attn=jnp.asarray(np.stack(s_attn), jnp.float32),
        wfc1=jnp.asarray(np.stack(wfc1)),
        sfc1=jnp.asarray(np.stack(sfc1), jnp.float32),
        wfc2=jnp.asarray(np.stack(wfc2)),
        sfc2=jnp.asarray(np.stack(sfc2), jnp.float32),
        head_sum=jnp.asarray(head_sum, jnp.bfloat16),
        head_expand=jnp.asarray(head_sum.T, jnp.bfloat16),
    )


def _layernorm(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias)


def _make_kernel(config: DecoderConfig, s_cache: int, s_enc: int, block_s: int,
                 act: str):
    import os
    _bisect = os.environ.get("FUSED_BISECT", "full")  # perf-bisect hook (tests/bench only)
    d, h, dh = config.hidden_size, config.num_attention_heads, config.head_dim
    f = config.ffn_dim
    inv_sqrt_dh = float(dh) ** -0.5

    def kernel(
        # scalar prefetch
        bounds_ref,        # (2,) int32 [start, n_cache_rows]
        # VMEM-blocked inputs
        x_ref,             # (1, D) bf16 — input embedding (positions added)
        ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,  # (1, 1, D) f32
        sattn_ref,         # (1, 1, 6D) f32
        sfc1_ref,          # (1, 1, F) f32
        sfc2_ref,          # (1, 1, D) f32
        msum_ref,          # (D, H) bf16
        mexp_ref,          # (H, D) bf16
        crossk_ref,        # (1, S_enc, D) bf16 (per layer)
        crossv_ref,        # (1, S_enc, D) bf16
        encbias_ref,       # (1, S_enc) f32 additive
        # ANY (HBM) inputs — manual DMA
        wattn_hbm,         # (L, D, 6D) int8
        wfc1_hbm, wfc2_hbm,
        cache_k_hbm,       # (L, S, D) bf16
        cache_v_hbm,
        # outputs
        hidden_ref,        # (1, D) bf16
        newk_ref,          # (1, 1, D) bf16 per layer
        newv_ref,
        # scratch
        x_scr,             # (1, D) f32 carried activation
        wattn_scr,         # (D, 6D) int8
        fc1_scr,           # (D, F) int8
        fc2_scr,           # (F, D) int8
        mid_scr,           # (1, F) f32
        kbuf, vbuf,        # (block_s, D) cache streaming
        dsem,              # DMA sems (5,)
    ):
        layer = pl.program_id(0)
        n_layers = pl.num_programs(0)
        start = bounds_ref[0]
        n_rows = bounds_ref[1]  # cache rows already written (current token excluded)

        @pl.when(layer == 0)
        def _():
            x_scr[...] = x_ref[...].astype(jnp.float32)

        # Weight pipeline: attention weights double-buffer ACROSS layers (the
        # next layer's 6MB block is prefetched during this layer's compute);
        # fc1/fc2 start at layer entry and fly during the attention section.
        buf = layer % 2
        attn_dma = lambda i, slot: pltpu.make_async_copy(  # noqa: E731
            wattn_hbm.at[i], wattn_scr.at[slot], dsem.at[slot]
        )

        @pl.when(layer == 0)
        def _():
            attn_dma(0, 0).start()

        cp_fc1 = pltpu.make_async_copy(wfc1_hbm.at[layer], fc1_scr, dsem.at[3])
        cp_fc2 = pltpu.make_async_copy(wfc2_hbm.at[layer], fc2_scr, dsem.at[4])
        cp_fc1.start()
        cp_fc2.start()

        s_attn = sattn_ref[0]  # (1, 6D)

        def proj(hbf, col0, ncols, scale_slice):
            w = wattn_scr[buf, :, col0:col0 + ncols].astype(jnp.bfloat16)
            y = jnp.dot(hbf, w, preferred_element_type=jnp.float32)
            return y * scale_slice

        # ---------------- self attention
        h1 = _layernorm(x_scr[...], ln1s_ref[0], ln1b_ref[0]).astype(jnp.bfloat16)
        attn_dma(layer, buf).wait()

        # current block secured -> immediately prefetch the NEXT layer's block
        @pl.when(layer + 1 < n_layers)
        def _():
            attn_dma(layer + 1, 1 - buf).start()

        qkv = proj(h1, 0, 3 * d, s_attn[:, 0:3 * d])           # (1, 3D) fp32
        q = (qkv[:, 0:d] * inv_sqrt_dh).astype(jnp.bfloat16)
        knew = qkv[:, d:2 * d].astype(jnp.bfloat16)
        vnew = qkv[:, 2 * d:3 * d].astype(jnp.bfloat16)
        newk_ref[...] = knew[None]
        newv_ref[...] = vnew[None]

        msum = msum_ref[...]
        mexp = mexp_ref[...]

        def head_scores(kblk, query):  # (S', D) -> (S', H) fp32
            prod = kblk.astype(jnp.bfloat16) * query.astype(jnp.bfloat16)
            return jnp.dot(prod, msum, preferred_element_type=jnp.float32)

        # online softmax over cache blocks + the current token
        n_blk = (n_rows + block_s - 1) // block_s

        def blk_body(i, carry):
            m_run, l_run, acc = carry
            cpk = pltpu.make_async_copy(
                cache_k_hbm.at[layer, pl.ds(i * block_s, block_s)], kbuf, dsem.at[1]
            )
            cpv = pltpu.make_async_copy(
                cache_v_hbm.at[layer, pl.ds(i * block_s, block_s)], vbuf, dsem.at[2]
            )
            cpk.start()
            cpv.start()
            cpk.wait()
            s_blk = head_scores(kbuf[...], q)  # (block_s, H)
            pos = i * block_s + jax.lax.broadcasted_iota(jnp.int32, (block_s, h), 0)
            ok = (pos >= start) & (pos < n_rows)
            s_blk = jnp.where(ok, s_blk, NEG_INF)
            m_blk = jnp.max(s_blk, axis=0)
            m_new = jnp.maximum(m_run, m_blk)
            p = jnp.where(ok, jnp.exp(s_blk - m_new[None]), 0.0)  # (block_s, H)
            alpha = jnp.exp(m_run - m_new)                         # (H,)
            cpv.wait()
            pexp = jnp.dot(p.astype(jnp.bfloat16), mexp,
                           preferred_element_type=jnp.float32)     # (block_s, D)
            pv = jnp.sum(pexp * vbuf[...].astype(jnp.float32), axis=0)  # (D,)
            alpha_d = jnp.dot(alpha.astype(jnp.bfloat16)[None], mexp,
                              preferred_element_type=jnp.float32)[0]    # (D,)
            l_new = l_run * alpha + jnp.sum(p, axis=0)
            return m_new, l_new, acc * alpha_d + pv

        init = (
            jnp.full((h,), NEG_INF, jnp.float32),
            jnp.zeros((h,), jnp.float32),
            jnp.zeros((d,), jnp.float32),
        )
        if _bisect in ("no_selfattn_loop", "weights_only"):
            m_run, l_run, acc = init
        else:
            m_run, l_run, acc = jax.lax.fori_loop(0, n_blk, blk_body, init)

        # current token's contribution (its k/v are not in the cache yet)
        s_cur = head_scores(knew, q)[0]  # (H,)
        m_new = jnp.maximum(m_run, s_cur)
        p_cur = jnp.exp(s_cur - m_new)
        alpha = jnp.exp(m_run - m_new)
        alpha_d = jnp.dot(alpha.astype(jnp.bfloat16)[None], mexp,
                          preferred_element_type=jnp.float32)[0]
        pcur_d = jnp.dot(p_cur.astype(jnp.bfloat16)[None], mexp,
                         preferred_element_type=jnp.float32)[0]
        acc = acc * alpha_d + pcur_d * vnew.astype(jnp.float32)[0]
        l_run = l_run * alpha + p_cur
        denom = jnp.dot(jnp.maximum(l_run, 1e-30).astype(jnp.float32)[None],
                        mexp.astype(jnp.float32),
                        preferred_element_type=jnp.float32)[0]
        attn = (acc / denom)[None].astype(jnp.bfloat16)  # (1, D)

        x_scr[...] = x_scr[...] + proj(attn, 3 * d, d, s_attn[:, 3 * d:4 * d])

        # ---------------- cross attention
        if _bisect in ("no_cross", "weights_only"):
            cp_fc1.wait()
            cp_fc2.wait()
            x_scr[...] = x_scr[...] + 0.0
            mid_dummy = jnp.dot(
                _layernorm(x_scr[...], ln3s_ref[0], ln3b_ref[0]).astype(jnp.bfloat16),
                fc1_scr[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            x_scr[...] = x_scr[...] + jnp.dot(
                jnp.tanh(mid_dummy).astype(jnp.bfloat16),
                fc2_scr[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32) * 0.0

            @pl.when(layer == n_layers - 1)
            def _():
                hidden_ref[...] = x_scr[...].astype(hidden_ref.dtype)
            return
        h2 = _layernorm(x_scr[...], ln2s_ref[0], ln2b_ref[0]).astype(jnp.bfloat16)
        qc = (proj(h2, 4 * d, d, s_attn[:, 4 * d:5 * d]) * inv_sqrt_dh).astype(jnp.bfloat16)
        ck = crossk_ref[0]  # (S_enc, D)
        cv = crossv_ref[0]
        s_c = head_scores(ck, qc)  # (S_enc, H)
        s_c = s_c + encbias_ref[...].reshape(s_enc, 1)
        m_c = jnp.max(s_c, axis=0)
        p_c = jnp.exp(s_c - m_c[None])
        l_c = jnp.sum(p_c, axis=0)
        pexp_c = jnp.dot(p_c.astype(jnp.bfloat16), mexp, preferred_element_type=jnp.float32)
        acc_c = jnp.sum(pexp_c * cv.astype(jnp.float32), axis=0)
        denom_c = jnp.dot(jnp.maximum(l_c, 1e-30)[None].astype(jnp.bfloat16),
                          mexp, preferred_element_type=jnp.float32)[0]
        attn_c = (acc_c / denom_c)[None].astype(jnp.bfloat16)
        x_scr[...] = x_scr[...] + proj(attn_c, 5 * d, d, s_attn[:, 5 * d:6 * d])

        # ---------------- MLP (fc DMAs started at layer entry; overlap done)
        if _bisect == "no_mlp":
            cp_fc1.wait()
            cp_fc2.wait()

            @pl.when(layer == n_layers - 1)
            def _():
                hidden_ref[...] = x_scr[...].astype(hidden_ref.dtype)
            return
        h3 = _layernorm(x_scr[...], ln3s_ref[0], ln3b_ref[0]).astype(jnp.bfloat16)
        cp_fc1.wait()
        mid = jnp.dot(h3, fc1_scr[...].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * sfc1_ref[0]
        if act in ("gelu", "gelu_new"):
            # Mosaic has no erf/erfc; tanh-gelu deviates from exact gelu by
            # <4e-3 absolute — below the int8 quantization noise of this mode
            mid = jax.nn.gelu(mid, approximate=True)
        elif act == "relu":
            mid = jnp.maximum(mid, 0.0)
        else:
            mid = jax.nn.silu(mid)
        mid_scr[...] = mid
        cp_fc2.wait()
        x_scr[...] = x_scr[...] + jnp.dot(
            mid_scr[...].astype(jnp.bfloat16), fc2_scr[...].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * sfc2_ref[0]

        @pl.when(layer == n_layers - 1)
        def _():
            hidden_ref[...] = x_scr[...].astype(hidden_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "block_s", "interpret")
)
def fused_decode_layers(
    config: DecoderConfig,
    fp: FusedParams,
    x_emb: jnp.ndarray,      # (1, D) bf16 — summed codebook embedding + position
    cache_k: jnp.ndarray,    # (L, S, D) bf16
    cache_v: jnp.ndarray,
    cross_k: jnp.ndarray,    # (L, S_enc, D) bf16
    cross_v: jnp.ndarray,
    enc_bias: jnp.ndarray,   # (1, S_enc) f32 additive (0 / NEG_INF)
    start: jnp.ndarray,      # () int32 first valid cache row
    n_rows: jnp.ndarray,     # () int32 cache rows already written
    block_s: int = 128,
    interpret: bool = False,
):
    """Returns (hidden (1, D) bf16 pre-final-LN, new_k (L, 1, D), new_v (L, 1, D))."""
    L = config.num_hidden_layers
    d, f = config.hidden_size, config.ffn_dim
    h = config.num_attention_heads
    s_cache = cache_k.shape[1]
    s_enc = cross_k.shape[1]
    interpret = interpret or jax.default_backend() != "tpu"

    bounds = jnp.stack([start.astype(jnp.int32), n_rows.astype(jnp.int32)])

    pv = lambda cols: pl.BlockSpec((1, 1, cols), lambda l, b: (l, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    const_vec = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda l, b: (0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            const_vec(1, d),                       # x
            pv(d), pv(d), pv(d), pv(d), pv(d), pv(d),  # ln1/2/3 scale+bias
            pv(6 * d),                              # s_attn
            pv(f),                                  # sfc1
            pv(d),                                  # sfc2
            const_vec(d, h),                        # head_sum
            const_vec(h, d),                        # head_expand
            pl.BlockSpec((1, s_enc, d), lambda l, b: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_enc, d), lambda l, b: (l, 0, 0), memory_space=pltpu.VMEM),
            const_vec(1, s_enc),                    # enc bias
            pl.BlockSpec(memory_space=pl.ANY),      # w_attn
            pl.BlockSpec(memory_space=pl.ANY),      # wfc1
            pl.BlockSpec(memory_space=pl.ANY),      # wfc2
            pl.BlockSpec(memory_space=pl.ANY),      # cache_k
            pl.BlockSpec(memory_space=pl.ANY),      # cache_v
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda l, b: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda l, b: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((2, d, 6 * d), jnp.int8),
            pltpu.VMEM((d, f), jnp.int8),
            pltpu.VMEM((f, d), jnp.int8),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((block_s, d), cache_k.dtype),
            pltpu.VMEM((block_s, d), cache_k.dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )

    kernel = _make_kernel(config, s_cache, s_enc, block_s, config.activation_function)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, 1, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, 1, d), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            # double-buffered 2x6MB attn + 4+4MB fc staging exceeds the 16MB
            # default scoped-vmem cap; v5e has headroom above the default
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    # (L, X) -> (L, 1, X): TPU blocks need the second-to-minor dim of each
    # block to equal the array dim (here 1)
    v3 = lambda a: a[:, None, :]  # noqa: E731
    return call(
        bounds,
        x_emb.astype(jnp.bfloat16),
        v3(fp.ln1_scale), v3(fp.ln1_bias), v3(fp.ln2_scale), v3(fp.ln2_bias),
        v3(fp.ln3_scale), v3(fp.ln3_bias),
        v3(fp.s_attn), v3(fp.sfc1), v3(fp.sfc2),
        fp.head_sum, fp.head_expand,
        cross_k.astype(jnp.bfloat16), cross_v.astype(jnp.bfloat16), enc_bias,
        fp.w_attn, fp.wfc1, fp.wfc2,
        cache_k, cache_v,
    )

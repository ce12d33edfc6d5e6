"""Pallas weight-only-int8 matmul: stream int8 weights, dequantize in VMEM.

XLA has no fused path for `x @ w_int8.astype(bf16)` — it materializes bf16
weight copies every decode step (measured ~30x slower than bf16 at mini-v1
scale). This kernel does what weight-only quantization is supposed to do: the
HBM read is 1 byte/weight, the int8 -> compute-dtype convert happens on the
block in VMEM, and the per-output-channel scale folds into the epilogue
(pallas_guide.md quantization-kernel pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 in VMEM
    acc_ref[...] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def quant_matmul(
    x: jnp.ndarray,       # (M, K) activations (bf16/f32), M small
    w_q: jnp.ndarray,     # (K, N) int8 weights
    scale: jnp.ndarray,   # (N,) f32 per-output-channel scales
    block_n: int = 512,
    block_k: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (M, N) = (x @ dequant(w_q)) with fp32 accumulation."""
    m, k = x.shape
    n = w_q.shape[1]
    block_k = min(block_k, k)
    block_n = min(block_n, n)
    assert k % block_k == 0 and n % block_n == 0, (k, n, block_k, block_n)
    n_k = k // block_k
    interpret = interpret or jax.default_backend() != "tpu"

    return pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=(n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((m, block_k), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        interpret=interpret,
    )(x, w_q, scale[None, :])


def quant_matmul_reference(x, w_q, scale):
    """XLA oracle with the kernel's numerics (bf16 operands, fp32 accum)."""
    y = jnp.dot(
        x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (y * scale[None, :]).astype(x.dtype)

"""Param dtype utilities.

For serving, weights stream from HBM every decode step — at mini-v1 scale the
token loop is weight-bandwidth-bound, so param dtype is a direct ~2x lever
(SURVEY.md §6 / pallas_guide HBM roofline). bf16 params + fp32 softmax/logits
matches the reference's recommended bf16 inference (INFERENCE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves to `dtype`; leave ints alone."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def param_bytes(tree) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(tree) if hasattr(x, "size")
    )

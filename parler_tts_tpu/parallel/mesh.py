"""Device-mesh construction and sharding rules.

The reference scales with Accelerate DDP over NCCL only (SURVEY.md §2.4:
`run_parler_tts_training.py:112-120`). The TPU-native design is a 2-D
`Mesh(('data', 'model'))` over ICI: batch sharded on `data` (DP parity with the
reference), decoder weights optionally sharded on `model` (TP, a first-class
improvement). XLA inserts the collectives (psum for grad all-reduce ≡ DDP
all-reduce; all_gather where TP activations need it).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_seq: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'seq', 'model') mesh. Defaults to all devices on
    `data`. The 'seq' axis (sequence/context parallelism) shards the label
    time axis of the training batch: activations of the long-T decoder are
    T-sharded through every pointwise op and matmul, and GSPMD inserts the
    attention collectives (the scaling-book recipe: annotate, let XLA place
    collectives). Size-1 axes cost nothing — existing P('data'/'model')
    specs are unaffected."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // (n_model * n_seq)
    assert n_data * n_seq * n_model == n, (
        f"{n_data}x{n_seq}x{n_model} != {n} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_seq, n_model)
    return Mesh(arr, ("data", "seq", "model"))


# ---------------------------------------------------------------------------
# Parameter partition rules: regex on the flattened param path -> PartitionSpec.
# Dimensions follow our stacked layouts (see models/decoder.py docstring).
_DECODER_RULES: Tuple[Tuple[str, P], ...] = (
    # (K, vocab+1, D): shard embedding rows over model (vocab-parallel gather is
    # cheap; the summed output is psum'd implicitly by XLA)
    (r".*decoder/embed_tokens$", P(None, "model", None)),
    # attention projections (D, H*Dh): shard heads (output dim)
    (r".*(self_attn|encoder_attn)/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    # out projection (H*Dh, D): shard input (heads) dim -> psum on output
    (r".*(self_attn|encoder_attn)/out_proj/kernel$", P("model", None)),
    # MLP: fc1 (D, F) shard F; fc2 (F, D) shard F
    (r".*fc1/kernel$", P(None, "model")),
    (r".*fc2/kernel$", P("model", None)),
    # LM heads (K, D, V): shard vocab
    (r".*lm_heads$", P(None, None, "model")),
    # T5 encoder attention/MLP
    (r".*attention/(q|k|v)/kernel$", P(None, "model")),
    (r".*attention/o/kernel$", P("model", None)),
    (r".*ff/(wi|wi_0|wi_1)/kernel$", P(None, "model")),
    (r".*ff/wo/kernel$", P("model", None)),
    (r".*shared_embedding$", P("model", None)),
    (r".*embed_prompts/embedding$", P("model", None)),
)


def param_partition_spec(path: str) -> P:
    for pattern, spec in _DECODER_RULES:
        if re.match(pattern, path):
            return spec
    return P()  # replicate


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def params_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for a params pytree (regex rules above)."""

    def spec_for(path, leaf):
        spec = param_partition_spec(_path_str(path))
        # drop sharding for dims not divisible by the mesh axis
        dims = list(spec)
        for i, axis in enumerate(dims):
            if axis is not None and i < leaf.ndim:
                if leaf.shape[i] % mesh.shape[axis] != 0:
                    dims[i] = None
        while len(dims) < leaf.ndim:
            dims.append(None)
        return NamedSharding(mesh, P(*dims[: leaf.ndim]))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def fsdp_params_shardings(params: Any, mesh: Mesh):
    """ZeRO-3/FSDP-style sharding: every large parameter is additionally
    sharded over the 'data' axis (on a dimension not already taken by a
    'model' rule). GSPMD inserts the all-gathers before use and
    reduce-scatters on gradients — params AND optimizer moments then cost
    1/n_data of the memory per chip, which is what makes the full-length
    recipe fit (the reference relies on 80GB GPUs instead)."""
    n_data = mesh.shape["data"]

    def spec_for(path, leaf):
        base = list(param_partition_spec(_path_str(path)))
        while len(base) < leaf.ndim:
            base.append(None)
        if leaf.ndim >= 1 and leaf.size >= 2**13:
            # shard the largest free, divisible dim over 'data'
            order = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
            for i in order:
                if base[i] is None and leaf.shape[i] % n_data == 0:
                    base[i] = "data"
                    break
        # drop model-axis shards that do not divide
        for i, axis in enumerate(base):
            if axis is not None and leaf.shape[i] % mesh.shape[axis] != 0:
                base[i] = None
        return NamedSharding(mesh, P(*base[: leaf.ndim]))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_sharding(mesh: Mesh):
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh):
    """Place a params pytree onto the mesh per the partition rules."""
    shardings = params_shardings(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )

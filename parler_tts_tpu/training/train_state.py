"""Sharded train step: optax AdamW + pjit over the ('data', 'model') mesh.

Loss semantics replicate the reference's grad-accumulation-correct global
normalization (`/root/reference/training/run_parler_tts_training.py:916-918,
1034-1036`): per-device token-sum losses and token counts are psum'd across the
mesh (the TPU-native form of `accelerator.gather(...).sum()` + DDP all-reduce),
so the loss is exactly `sum_tokens(weighted CE) / K / global_token_count`
regardless of how the batch is sharded.

The reference freezes the text encoder by default (`freeze_text_encoder`,
training/arguments.py + run_parler_tts_training.py freeze_encoders) — here that
is an optax.multi_transform routing frozen subtrees to `set_to_zero`.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P  # noqa: F401 (P used in annotations)

from ..config import ParlerTTSConfig
from ..models.parler import ParlerTTS
from ..ops.losses import (
    chunked_per_codebook_cross_entropy,
    per_codebook_cross_entropy,
)
from ..parallel.mesh import batch_sharding, params_shardings, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


class Batch(NamedTuple):
    input_ids: jnp.ndarray           # (B, S_desc)
    attention_mask: jnp.ndarray      # (B, S_desc)
    prompt_input_ids: jnp.ndarray    # (B, S_p)
    prompt_attention_mask: jnp.ndarray
    labels: jnp.ndarray              # (B, T, K), -100 = padding


def make_optimizer(
    learning_rate: float = 9.5e-4,
    schedule: str = "constant_with_warmup",
    warmup_steps: int = 20_000,
    total_steps: int = 50_000,
    b1: float = 0.9,
    b2: float = 0.99,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    freeze_text_encoder: bool = True,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW + clip + LR schedule (reference recipe run_parler_tts_training.py:744-758,
    defaults from helpers/training_configs/starting_point_v1.json)."""
    if schedule == "constant_with_warmup":
        lr = optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.schedules.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    elif schedule == "cosine":
        lr = optax.schedules.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    elif schedule == "linear":
        lr = optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.schedules.linear_schedule(
                    learning_rate, 0.0, max(total_steps - warmup_steps, 1)
                ),
            ],
            [warmup_steps],
        )
    else:
        raise ValueError(f"unknown schedule {schedule}")

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay, mu_dtype=mu_dtype),
    )
    if freeze_text_encoder:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if str(getattr(path[0], "key", "")) == "text_encoder"
                else "train",
                params,
            )

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def make_train_step(
    model: ParlerTTS,
    tx: optax.GradientTransformation,
    mesh=None,
    loss_chunk_size: Optional[int] = None,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, dict]]:
    """Build the jitted (optionally mesh-sharded) train step.

    `loss_chunk_size`: fuse LM heads + CE chunk-by-chunk over T instead of
    materializing (B, K, T, V) logits — the loss tensor is the single largest
    allocation of the long-T step (see training/README.md fit table).
    """
    cfg: ParlerTTSConfig = model.config
    dcfg = cfg.decoder

    def loss_fn(params, batch: Batch, dropout_rng):
        out, dec_input_ids = model.apply(
            {"params": params},
            batch.input_ids,
            batch.attention_mask,
            batch.prompt_input_ids,
            batch.prompt_attention_mask,
            batch.labels,
            deterministic=False,
            return_hidden=loss_chunk_size is not None,
            rngs={"dropout": dropout_rng},
        )
        if loss_chunk_size is not None:
            sum_loss, num_items, per_cb_mean, _ = (
                chunked_per_codebook_cross_entropy(
                    out,
                    params["decoder"]["lm_heads"],
                    batch.labels,
                    dec_input_ids,
                    bos_token_id=dcfg.bos_token_id,
                    eos_token_id=dcfg.eos_token_id,
                    codebook_weights=dcfg.codebook_weights,
                    chunk_size=loss_chunk_size,
                    head_dtype=model.dtype,
                )
            )
        else:
            sum_loss, num_items, per_cb_mean, _ = per_codebook_cross_entropy(
                out,
                batch.labels,
                dec_input_ids,
                bos_token_id=dcfg.bos_token_id,
                eos_token_id=dcfg.eos_token_id,
                codebook_weights=dcfg.codebook_weights,
            )
        # Reference sum-reduction divides by num_codebooks (modeling:1955-1957)
        # then normalizes by the GLOBAL valid-token count (training:916-918).
        # Under pjit the batch is sharded over 'data'; XLA turns these
        # reductions into cross-device psums automatically.
        loss = sum_loss / dcfg.num_codebooks / jnp.maximum(num_items, 1.0)
        return loss, (per_cb_mean, num_items)

    def train_step(state: TrainState, batch: Batch, dropout_rng: jax.Array):
        (loss, (per_cb, num_items)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, dropout_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "num_items": num_items,
            "per_codebook_loss": per_cb,
        }
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(None, Batch(*([b_sh] * 5)), r_sh),
        out_shardings=None,
        donate_argnums=(0,),
    )


def state_shardings(state: TrainState, mesh, fsdp: bool = False) -> TrainState:
    """Sharding tree for a TrainState: params follow the partition rules
    (plus FSDP 'data'-axis sharding when `fsdp`); optimizer moments mirror
    their matching param's sharding (matched by shape); scalars replicate."""
    from ..parallel.mesh import fsdp_params_shardings

    param_sh = (
        fsdp_params_shardings(state.params, mesh)
        if fsdp
        else params_shardings(state.params, mesh)
    )
    r_sh = replicated(mesh)
    by_shape = {}
    for p, s in zip(jax.tree.leaves(state.params), jax.tree.leaves(param_sh)):
        by_shape[tuple(p.shape)] = s

    def moment_sharding(leaf):
        return by_shape.get(tuple(getattr(leaf, "shape", ())), r_sh)

    return TrainState(
        step=r_sh,
        params=param_sh,
        opt_state=jax.tree.map(moment_sharding, state.opt_state),
    )


def shard_train_state(state: TrainState, mesh, fsdp: bool = False) -> TrainState:
    """Place a TrainState onto the mesh."""
    sh = state_shardings(state, mesh, fsdp=fsdp)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)

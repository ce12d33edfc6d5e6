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
from jax.sharding import PartitionSpec as P

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
    microbatch_steps: Optional[int] = None,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, dict]]:
    """Build the jitted (optionally mesh-sharded) train step.

    `loss_chunk_size`: fuse LM heads + CE chunk-by-chunk over T instead of
    materializing (B, K, T, V) logits — the loss tensor is the single largest
    allocation of the long-T step (see training/README.md fit table).

    `microbatch_steps=G`: TRUE gradient accumulation with the reference's
    memory semantics (`run_parler_tts_training.py:1039-1046` accumulates G
    micro-batches under `no_sync`): the (B, ...) batch is split into G
    micro-batches and a `lax.scan` runs forward+backward per micro-batch,
    accumulating fp32 gradient sums — peak activation memory is ONE
    micro-batch's, at the cost of G sequential passes. Gradients equal the
    full-batch step exactly (up to fp32 summation order) because both divide
    the same raw loss-gradient sum by the same GLOBAL valid-token count
    (reference :916-918, :1034-1036); dropout draws a fresh fold of the step
    rng per micro-batch, exactly like G separate reference micro-steps.
    `None`/1 keeps the default single fused pass (faster whenever it fits).
    """
    cfg: ParlerTTSConfig = model.config
    dcfg = cfg.decoder

    def raw_loss_fn(params, batch: Batch, dropout_rng):
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
            sum_loss, num_items, per_cb_mean, per_cb_count = (
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
            sum_loss, num_items, per_cb_mean, per_cb_count = (
                per_codebook_cross_entropy(
                    out,
                    batch.labels,
                    dec_input_ids,
                    bos_token_id=dcfg.bos_token_id,
                    eos_token_id=dcfg.eos_token_id,
                    codebook_weights=dcfg.codebook_weights,
                )
            )
        # Reference sum-reduction divides by num_codebooks (modeling:1955-1957);
        # the GLOBAL valid-token normalization (training:916-918) is applied by
        # the caller so micro-batch gradients can be summed BEFORE dividing.
        # Under pjit the batch is sharded over 'data'; XLA turns these
        # reductions into cross-device psums automatically.
        return (
            sum_loss / dcfg.num_codebooks,
            (per_cb_mean, per_cb_count, num_items),
        )

    def loss_fn(params, batch: Batch, dropout_rng):
        raw, (per_cb_mean, _, num_items) = raw_loss_fn(params, batch, dropout_rng)
        return raw / jnp.maximum(num_items, 1.0), (per_cb_mean, num_items)

    def apply_grads(state: TrainState, grads, loss, num_items, per_cb):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "num_items": num_items,
            "per_codebook_loss": per_cb,
        }
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    def train_step(state: TrainState, batch: Batch, dropout_rng: jax.Array):
        (loss, (per_cb, num_items)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, dropout_rng)
        return apply_grads(state, grads, loss, num_items, per_cb)

    def train_step_micro(state: TrainState, batch: Batch, dropout_rng: jax.Array):
        g = microbatch_steps
        if batch.input_ids.shape[0] % g:
            raise ValueError(
                f"batch rows {batch.input_ids.shape[0]} not divisible by "
                f"microbatch_steps={g}"
            )
        micro = Batch(
            *(x.reshape((g, x.shape[0] // g) + x.shape[1:]) for x in batch)
        )
        if mesh is not None:
            # pin the intended layout: micro-step axis replicated, rows on
            # 'data' — otherwise GSPMD may split the old 'data' axis across
            # the new (G, B/G) pair and reshard every scan iteration
            mb_sh = jax.sharding.NamedSharding(mesh, P(None, "data"))
            micro = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, mb_sh), micro
            )
        rngs = jax.random.split(dropout_rng, g)
        params = state.params
        k = dcfg.num_codebooks
        carry0 = (
            jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            jnp.zeros((), jnp.float32),   # raw loss sum
            jnp.zeros((), jnp.float32),   # valid-token count
            jnp.zeros((k,), jnp.float32),  # per-codebook NLL sum
            jnp.zeros((k,), jnp.float32),  # per-codebook token count
        )

        def body(carry, xs):
            g_acc, sl, items, cb_sum, cb_cnt = carry
            mb, r = xs
            (raw, (cb_mean, cb_c, n)), grads = jax.value_and_grad(
                raw_loss_fn, has_aux=True
            )(params, mb, r)
            g_acc = jax.tree.map(
                lambda a, b: a + b.astype(jnp.float32), g_acc, grads
            )
            return (
                g_acc, sl + raw, items + n, cb_sum + cb_mean * cb_c,
                cb_cnt + cb_c,
            ), None

        (g_acc, sl, items, cb_sum, cb_cnt), _ = jax.lax.scan(
            body, carry0, (micro, rngs)
        )
        denom = jnp.maximum(items, 1.0)
        grads = jax.tree.map(
            lambda gr, p: (gr / denom).astype(p.dtype), g_acc, params
        )
        per_cb = cb_sum / jnp.maximum(cb_cnt, 1.0)
        return apply_grads(state, grads, sl / denom, items, per_cb)

    if microbatch_steps is not None and microbatch_steps > 1:
        train_step = train_step_micro

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)
    # sequence parallelism: labels (B, T, K) additionally shard T over 'seq'
    # (size-1 on pure DP/TP meshes, a no-op there); the decoder activations
    # inherit the T-sharding by propagation and GSPMD inserts the attention
    # collectives
    l_sh = (
        jax.sharding.NamedSharding(mesh, P("data", "seq"))
        if "seq" in mesh.shape
        else b_sh
    )
    return jax.jit(
        train_step,
        in_shardings=(None, Batch(b_sh, b_sh, b_sh, b_sh, l_sh), r_sh),
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

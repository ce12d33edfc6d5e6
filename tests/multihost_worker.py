"""Worker for the 2-process multi-host training test (run via subprocess).

Each process: jax.distributed.initialize over localhost (the DCN-coordination
analogue of the reference's `accelerate launch` DDP bootstrap,
run_parler_tts_training.py:112-120), 1 local CPU device, a ('data',) mesh over
both processes' devices, its OWN slice of the deterministic global batch, one
sharded train step. Prints `RESULT loss num_items` — the parent asserts both
ranks agree and that num_items equals the single-process global token count.
"""

import os
import sys


def main():
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nprocs)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root (package not installed)
    from test_training_step import tiny_config

    import numpy as np

    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.parallel import (
        host_local_to_global,
        make_mesh,
        maybe_init_distributed,
    )
    from parler_tts_tpu.training import TrainState, make_optimizer, make_train_step
    from parler_tts_tpu.training.data import DataCollatorParlerTTSWithPadding
    from parler_tts_tpu.training.run_training import data_iterator

    pi, pc = maybe_init_distributed()
    assert pc == nprocs, (pi, pc)
    assert jax.device_count() == nprocs
    mesh = make_mesh(n_data=nprocs, n_model=1)

    cfg = tiny_config()
    model = ParlerTTS(cfg)
    rng = np.random.default_rng(0)
    feats = [
        {
            "labels": rng.integers(0, 88, size=(12, 4)),
            "input_ids": list(rng.integers(0, 120, size=7)),
            "prompt_input_ids": list(rng.integers(0, 256, size=4)),
        }
        for _ in range(8)
    ]
    params = model.init(
        jax.random.key(0),
        np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
        np.zeros((1, 3), np.int32), np.ones((1, 3), np.int32),
        np.zeros((1, 2, 4), np.int32),
    )["params"]
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=2)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, tx, mesh=mesh)

    coll = DataCollatorParlerTTSWithPadding(label_bucket=32)
    global_bs = 4
    it = data_iterator(feats, coll, global_bs, seed=42, epoch=0,
                       process_index=pi, process_count=pc)
    local_batch = next(it)
    assert local_batch.labels.shape[0] == global_bs // pc
    batch = host_local_to_global(local_batch, mesh)
    state, metrics = step_fn(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])
    num_items = float(metrics["num_items"])
    print(f"RESULT {loss:.8f} {num_items:.1f}", flush=True)

    # the multi-host eval path: every process slices the same global eval
    # batch and reassembles global arrays against the mesh-sharded params
    from parler_tts_tpu.training.arguments import TrainingArguments
    from parler_tts_tpu.training.run_training import run_eval

    eval_loss = run_eval(
        model, state, coll, feats, TrainingArguments(per_device_eval_batch_size=2),
        None, 1, 0, mesh=mesh,
    )
    print(f"EVAL {eval_loss:.8f}", flush=True)

    # multi-host eval GENERATION (reference gathers generations across ranks,
    # run_parler_tts_training.py:1154-1206; here params are allgathered and
    # every rank generates the same deterministic samples): the audio
    # fingerprint must be rank-identical
    import dataclasses

    from parler_tts_tpu.codec.dac_model import DACModel
    from parler_tts_tpu.config import DACConfig
    from parler_tts_tpu.training.arguments import ModelArguments
    from parler_tts_tpu.training.run_training import run_eval_generation

    dac_cfg = DACConfig(
        num_codebooks=4, codebook_size=88, codebook_dim=4, latent_dim=32,
        encoder_dim=4, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        sampling_rate=8000, frame_rate=1000,
    )
    gen_model = model.clone(config=dataclasses.replace(cfg, audio_encoder=dac_cfg))
    dac = DACModel(dac_cfg)
    dac_params = dac.init(
        jax.random.key(1), np.zeros((1, 4, 2), np.int32), method="decode"
    )["params"]
    margs = ModelArguments(max_length=16, do_sample=False)
    targs = TrainingArguments(
        per_device_eval_batch_size=2,
        compute_clap_similarity_metric=False, compute_noise_level_metric=False,
    )
    fingerprint = {}

    def spy_log_pred(tracker, descs, prompts, trans, clips, sr, step):
        fingerprint["v"] = float(sum(np.abs(c).sum() for c in clips))

    import parler_tts_tpu.training.run_training as rt

    orig = rt.log_pred
    rt.log_pred = spy_log_pred
    try:
        run_eval_generation(
            gen_model, state, dac, dac_params, feats[:2], margs, targs,
            None, 1, 0, mesh=mesh,
        )
    finally:
        rt.log_pred = orig
    print(f"EVALGEN {fingerprint['v']:.6f}", flush=True)


if __name__ == "__main__":
    main()

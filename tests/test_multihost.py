"""Multi-host (2-process jax.distributed over localhost) training step.

TPU-native equivalent of the reference's multi-node DDP (SURVEY §2.4,
`training/README.md:196` trains on 4 nodes): two OS processes each contribute
one CPU device and HALF of the global batch; the psum-normalized loss and the
global valid-token count must be identical on both ranks AND equal to a
single-process run over the same global batch."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_step_invariants():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(here),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results, evals = [], []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out[-2000:]
        _, loss, items = lines[0].split()
        results.append((float(loss), float(items)))
        eval_lines = [l for l in out.splitlines() if l.startswith("EVAL ")]
        assert eval_lines, out[-2000:]
        evals.append(float(eval_lines[0].split()[1]))
    gens = []
    for out in outs:
        gen_lines = [l for l in out.splitlines() if l.startswith("EVALGEN")]
        assert gen_lines, out[-2000:]
        gens.append(float(gen_lines[0].split()[1]))
    # both ranks observe the SAME psum'd loss and global token count,
    # and the multi-host eval + eval-generation paths agree across ranks too
    assert results[0] == results[1], results
    assert evals[0] == evals[1] and np.isfinite(evals[0]), evals
    assert gens[0] == gens[1] and gens[0] > 0, gens

    # single-process ground truth over the same global batch
    from parler_tts_tpu.models.parler import ParlerTTS
    from parler_tts_tpu.training import TrainState, make_optimizer, make_train_step
    from parler_tts_tpu.training.data import DataCollatorParlerTTSWithPadding
    from parler_tts_tpu.training.run_training import data_iterator
    from test_training_step import tiny_config

    import jax

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
    step_fn = make_train_step(model, tx, mesh=None)
    batch = next(data_iterator(feats, DataCollatorParlerTTSWithPadding(label_bucket=32), 4,
                               seed=42, epoch=0))
    _, metrics = step_fn(state, jax.tree.map(np.asarray, batch), jax.random.key(1))
    # the distributed global token count must equal the single-process one
    assert float(metrics["num_items"]) == results[0][1]
    # loss agrees to fp tolerance (different reduction orders across devices)
    np.testing.assert_allclose(float(metrics["loss"]), results[0][0], rtol=2e-5)

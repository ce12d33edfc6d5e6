"""Checkpoint management: Orbax train-state checkpoints + rotation + resume.

TPU-native replacement for the reference's `accelerator.save_state` +
regex-based rotation (`/root/reference/training/utils.py:18-64`,
`run_parler_tts_training.py:1076-1100`). Directory naming keeps the reference's
`checkpoint-{step}-epoch-{epoch}` scheme so tooling carries over; weights can
also be exported back to HF-compatible layouts via utils/hf_bridge.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional, Tuple

CHECKPOINT_PATTERN = re.compile(r"^checkpoint-(\d+)-epoch-(\d+)$")


def checkpoint_dirs(output_dir: str) -> List[str]:
    if not os.path.isdir(output_dir):
        return []
    return [d for d in os.listdir(output_dir) if CHECKPOINT_PATTERN.match(d)]


def sorted_checkpoints(output_dir: str) -> List[str]:
    """Oldest-first, sorted by step (reference utils.py:35-48)."""
    dirs = checkpoint_dirs(output_dir)
    return sorted(dirs, key=lambda d: int(CHECKPOINT_PATTERN.match(d).group(1)))


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = sorted_checkpoints(output_dir)
    return os.path.join(output_dir, ckpts[-1]) if ckpts else None


def parse_checkpoint_name(path: str) -> Tuple[int, int]:
    m = CHECKPOINT_PATTERN.match(os.path.basename(path))
    if not m:
        raise ValueError(f"not a checkpoint dir: {path}")
    return int(m.group(1)), int(m.group(2))


def rotate_checkpoints(output_dir: str, save_total_limit: Optional[int]) -> None:
    """Delete oldest checkpoints beyond the retention limit (utils.py:51-64)."""
    if not save_total_limit or save_total_limit <= 0:
        return
    ckpts = sorted_checkpoints(output_dir)
    for d in ckpts[: max(0, len(ckpts) - save_total_limit)]:
        shutil.rmtree(os.path.join(output_dir, d), ignore_errors=True)


def save_train_state(state: Any, output_dir: str, step: int, epoch: int,
                     save_total_limit: Optional[int] = None) -> str:
    """Orbax-serialize the full TrainState (params + optimizer + step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}-epoch-{epoch}"))
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    rotate_checkpoints(output_dir, save_total_limit)
    return path


def restore_train_state(path: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by `save_train_state` (shape/dtype template
    from `jax.eval_shape` over the init fn, enabling sharded restore)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)


# ------------------------------------------------ codec-label stage checkpoints
def save_codec_checkpoint(output_dir: str, data: Any, step: int) -> None:
    """Resumable offline-tokenization shards (reference utils.py:67-98)."""
    import numpy as np

    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, f"codec-{step}.npy"), np.asarray(data, dtype=object),
            allow_pickle=True)


def load_all_codec_checkpoints(output_dir: str) -> List[Any]:
    import numpy as np

    files = sorted(
        (f for f in os.listdir(output_dir) if re.match(r"^codec-(\d+)\.npy$", f)),
        key=lambda f: int(re.match(r"^codec-(\d+)\.npy$", f).group(1)),
    )
    out = []
    for f in files:
        out.extend(np.load(os.path.join(output_dir, f), allow_pickle=True).tolist())
    return out


def get_last_codec_checkpoint_step(output_dir: str) -> int:
    if not os.path.isdir(output_dir):
        return 0
    steps = [
        int(m.group(1))
        for f in os.listdir(output_dir)
        if (m := re.match(r"^codec-(\d+)\.npy$", f))
    ]
    return max(steps) if steps else 0

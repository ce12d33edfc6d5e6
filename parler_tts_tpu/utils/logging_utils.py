"""Metrics/observability: scalar logging + wandb audio tables + profiler traces.

Parity with `/root/reference/training/utils.py:120-203` (log_metric / log_pred)
plus the first-class `jax.profiler` integration SURVEY.md §5 calls for (the
reference has no tracing at all — only wall-clock accounting).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger("parler_tts_tpu")


def log_metric(
    tracker,
    metrics: Dict,
    train_time: float,
    step: int,
    epoch: int,
    learning_rate: Optional[float] = None,
    prefix: str = "train",
) -> None:
    """Scalar logging with train/eval prefixes (reference utils.py:120-140)."""
    log_metrics = {}
    for k, v in metrics.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
            for i, vi in enumerate(list(v)):
                log_metrics[f"{prefix}/codebook_{i}_{k}"] = float(vi)
        else:
            log_metrics[f"{prefix}/{k}"] = float(v)
    log_metrics[f"{prefix}/time"] = train_time
    log_metrics[f"{prefix}/epoch"] = epoch
    if learning_rate is not None:
        log_metrics[f"{prefix}/learning_rate"] = learning_rate
    if tracker is not None:
        tracker.log(log_metrics, step=step)
    logger.info("step %d: %s", step, {k: round(v, 5) for k, v in log_metrics.items()})


def log_pred(
    tracker,
    pred_descriptions: List[str],
    pred_prompts: List[str],
    transcriptions: List[str],
    audios: List,
    sampling_rate: int,
    step: int,
    prefix: str = "eval",
    num_lines: int = 20,
    max_audios: int = 100,
) -> None:
    """wandb table of transcriptions + <=100 audio clips (utils.py:143-203)."""
    if tracker is None:
        return
    try:
        import wandb
    except ImportError:
        return
    table = wandb.Table(
        columns=["Target descriptions", "Target prompts", "Predicted transcriptions"],
        data=[
            [d, p, t]
            for d, p, t in zip(
                pred_descriptions[:num_lines], pred_prompts[:num_lines],
                transcriptions[:num_lines],
            )
        ],
    )
    payload = {f"{prefix}/predictions": table}
    for i, audio in enumerate(audios[:max_audios]):
        payload[f"{prefix}/audio_{i}"] = wandb.Audio(
            audio, sample_rate=sampling_rate, caption=pred_prompts[i] if i < len(pred_prompts) else ""
        )
    tracker.log(payload, step=step)


def init_tracker(project: str, run_name: Optional[str], config: Dict, report_to: str = "wandb"):
    if report_to != "wandb":
        return None
    try:
        import wandb

        wandb.init(project=project, name=run_name, config=config)
        return wandb
    except Exception:
        logger.warning("wandb unavailable; falling back to stdout logging")
        return None


# ------------------------------------------------------------------- profiling
@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Per-phase wall-clock accounting (reference's train_time/eval_time fields,
    run_parler_tts_training.py:785-786)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

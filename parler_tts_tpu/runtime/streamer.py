"""ParlerTTSStreamer: iterator API parity with the reference streamer.

The reference couples a transformers `BaseStreamer` to the generate thread via
a `Queue` (`/root/reference/parler_tts/streamer.py:11-147`). Here the producer
is the pipeline's jitted chunked decode loop running on a worker thread; the
consumer iterates waveform chunks exactly like the reference (`for audio in
streamer`), with the same `play_steps` / `stride` semantics and a `timeout` to
surface producer exceptions (streamer.py:37-39, 62-64).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


class ParlerTTSStreamer:
    """Iterate waveform chunks while generation runs.

    Example (mirrors INFERENCE.md:101-161):
        streamer = ParlerTTSStreamer(pipe, play_steps=86)
        streamer.start(desc_ids, desc_mask, prompt_ids, prompt_mask, seed=0)
        for chunk in streamer:
            play(chunk)
    """

    def __init__(
        self,
        pipeline,
        play_steps: int = 86,
        stride: Optional[int] = None,
        timeout: Optional[float] = None,
    ):
        self.pipeline = pipeline
        self.play_steps = play_steps
        self.stride = stride  # pipeline.stream computes the reference default
        self.timeout = timeout
        self.sampling_rate = pipeline.config.sampling_rate
        self.audio_queue: "queue.Queue" = queue.Queue()
        self.stop_signal = None
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def start(self, desc_ids, desc_mask, prompt_ids, prompt_mask, seed: int = 0):
        if np.asarray(desc_ids).shape[0] > 1:
            raise ValueError("ParlerTTSStreamer only supports batch size 1")

        def worker():
            try:
                for chunk in self.pipeline.stream(
                    desc_ids, desc_mask, prompt_ids, prompt_mask,
                    play_steps=self.play_steps, seed=seed,
                ):
                    self.audio_queue.put(chunk[0], timeout=self.timeout)
            except BaseException as e:  # surfaced on the consumer side
                self._error = e
            finally:
                self.audio_queue.put(self.stop_signal, timeout=self.timeout)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()
        return self

    def __iter__(self):
        return self

    def __next__(self):
        value = self.audio_queue.get(timeout=self.timeout)
        if self._error is not None:
            raise self._error
        if value is self.stop_signal:
            raise StopIteration()
        return value

    # ------------------------------------------------------------- PCM stream
    def pcm_stream(
        self, desc_ids, desc_mask, prompt_ids, prompt_mask,
        seed: int = 0, ring_capacity: int = 1 << 22,
    ):
        """Yield int16 PCM byte chunks through the native C++ ring buffer —
        the zero-copy hand-off an audio device callback would consume
        (float->PCM conversion and buffering run in the C++ extension,
        `native/audio_runtime.cpp`)."""
        from ..native import float_to_pcm16, make_ring_buffer

        ring = make_ring_buffer(ring_capacity)
        done = threading.Event()
        error: list = []

        def producer():
            try:
                for chunk in self.pipeline.stream(
                    desc_ids, desc_mask, prompt_ids, prompt_mask,
                    play_steps=self.play_steps, seed=seed,
                ):
                    data = float_to_pcm16(np.ascontiguousarray(chunk[0]))
                    off = 0
                    while off < len(data) and not done.is_set():
                        off += ring.push(data[off:])
            except BaseException as e:
                error.append(e)
            finally:
                done.set()

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while not (done.is_set() and ring.size() == 0):
                chunk = ring.pop(65536)
                if chunk:
                    yield chunk
                elif not done.is_set():
                    thread.join(timeout=0.005)
            if error:
                raise error[0]
        finally:
            done.set()

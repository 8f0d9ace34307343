"""Continuous batching scheduler for multi-request serving.

The reference serves one utterance at a time through a global mutable
context (SURVEY.md §5 hazards: ``Utils/Shared.py:13``); its only scale-out
is independent uvicorn workers. Here concurrent requests are micro-batched
onto the chip: a scheduler thread drains the request queue, groups
same-character requests within a small window, and executes them as one
SPMD batch (per-row masks handle heterogeneous lengths). Throughput scales
with batch size while the weight-read cost per decode step is amortized.
"""
from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..ops.sampling import SamplingConfig
from ..utils.metrics import metrics
from .engine import CharacterModel, ReferenceFeatures, TTSEngine

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    char: CharacterModel
    ref: ReferenceFeatures
    phones: np.ndarray
    bert: np.ndarray
    sampling: Optional[SamplingConfig]
    max_steps: Optional[int] = None
    min_steps: int = 0
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None


class ContinuousBatcher:
    def __init__(self, engine: TTSEngine, max_batch: int = 8,
                 window_ms: float = 8.0):
        self.engine = engine
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._lock = threading.Lock()

    # -- public -----------------------------------------------------------

    def start(self) -> None:
        with self._lock:
            if self._running:
                return
            self._running = True
            self._thread = threading.Thread(target=self._loop, daemon=True,
                                            name="tts-batcher")
            self._thread.start()

    def stop(self) -> None:
        with self._lock:
            self._running = False

    def synthesize(self, char: CharacterModel, ref: ReferenceFeatures,
                   phones: np.ndarray, bert: np.ndarray,
                   sampling: Optional[SamplingConfig] = None,
                   timeout: Optional[float] = None,
                   max_steps: Optional[int] = None,
                   min_steps: int = 0) -> np.ndarray:
        """Blocking submit; batches with concurrent callers."""
        self.start()
        req = _Request(char, ref, phones, bert, sampling,
                       max_steps=max_steps, min_steps=min_steps)
        self._q.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("batched synthesis timed out")
        if req.error is not None:
            raise req.error
        return req.result

    # -- scheduler --------------------------------------------------------

    def _collect(self) -> List[_Request]:
        try:
            first = self._q.get(timeout=0.25)
        except queue.Empty:
            return []
        batch = [first]
        # same-character requests arriving within the window join the batch
        t_end = self.window_s
        import time

        t0 = time.perf_counter()
        while len(batch) < self.max_batch:
            remain = t_end - (time.perf_counter() - t0)
            if remain <= 0:
                break
            try:
                nxt = self._q.get(timeout=remain)
            except queue.Empty:
                break
            if nxt.char.name == first.char.name:
                batch.append(nxt)
            else:  # different character: run it in the next batch
                self._q.put(nxt)
                break
        return batch

    def _loop(self) -> None:
        while self._running:
            batch = self._collect()
            if not batch:
                continue
            metrics.observe("batch_size", len(batch))
            try:
                outs = self.engine.synthesize_batch(
                    batch[0].char,
                    [(r.ref, r.phones, r.bert) for r in batch],
                    sampling=batch[0].sampling,
                    max_steps=batch[0].max_steps,
                    min_steps=batch[0].min_steps)
                for r, a in zip(batch, outs):
                    r.result = a
                    r.done.set()
            except BaseException as e:  # propagate to all waiters
                logger.exception("batched synthesis failed")
                for r in batch:
                    r.error = e
                    r.done.set()

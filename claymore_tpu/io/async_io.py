"""Asynchronous output pipeline.

Equivalent of the reference's background IO thread
(reference: Library/MnSystem/IO/IO.h:10-67 — a ManagedSingleton with one
worker thread consuming a job queue; ``insert_job`` enqueues, ``flush``
joins).  Frame dumps overlap with simulation exactly like the reference's
.bgeo writes overlap GPU compute.

A native C++ job-queue runtime (claymore_tpu/native) is used when built;
this Python thread pool is the always-available fallback — file IO releases
the GIL, so a Python worker thread achieves the same overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional


class AsyncIO:
    """Single background worker executing IO jobs in order."""

    _instance: Optional["AsyncIO"] = None

    def __init__(self):
        self._q: "queue.Queue[Optional[Callable[[], None]]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._errors = []

    @classmethod
    def instance(cls) -> "AsyncIO":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def _run(self):
        while True:
            job = self._q.get()
            if job is None:
                self._q.task_done()
                return
            try:
                job()
            except Exception as e:  # surface on flush
                self._errors.append(e)
            finally:
                self._q.task_done()

    def insert_job(self, fn: Callable[[], None]) -> None:
        """Enqueue an IO job (reference IO::insert_job, IO.h:56-60)."""
        self._q.put(fn)

    def flush(self) -> None:
        """Wait for all queued jobs (reference IO::flush, IO.h:62-66)."""
        self._q.join()
        if self._errors:
            err, self._errors = self._errors[0], []
            raise err


def insert_job(fn: Callable[[], None]) -> None:
    AsyncIO.instance().insert_job(fn)


def flush() -> None:
    AsyncIO.instance().flush()

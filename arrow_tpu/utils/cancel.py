"""Cancellation.

Reference: ``util/cancel.h`` StopToken/StopSource propagated through
plans (``ExecPlan::StopProducing``). The staged engine checks the token
between batches at every host-boundary (the natural preemption points of
a host-driven pipeline).
"""

from __future__ import annotations

import threading

__all__ = ["StopSource", "StopToken", "CancelledError"]


class CancelledError(RuntimeError):
    pass


class StopToken:
    def __init__(self, source: "StopSource"):
        self._source = source

    @property
    def stop_requested(self) -> bool:
        return self._source._stopped.is_set()

    def raise_if_stopped(self):
        if self.stop_requested:
            raise CancelledError(self._source._reason or "plan cancelled")


class StopSource:
    def __init__(self):
        self._stopped = threading.Event()
        self._reason = None

    def request_stop(self, reason: str = ""):
        self._reason = reason
        self._stopped.set()

    def token(self) -> StopToken:
        return StopToken(self)

"""Deferred data-dependent errors for checked kernels.

Reference model: Arrow's ``*_checked`` kernels abort execution with
``ArrowInvalid`` when a data-dependent error (integer overflow, divide by
zero, float domain error) occurs —
``cpp/src/arrow/compute/kernels/scalar_arithmetic.cc:339``.

A TPU program cannot abort mid-flight, so the TPU-native design is a
*deferred error flag*: kernels reduce the per-row error condition to one
scalar bool and report it through :func:`check`:

  * **eager** (concrete values): the flag is synced and the error raised
    immediately — full pyarrow call parity.
  * **tracing under an active** :func:`collect` **scope** (how the acero
    stage compiler wraps expression stages): the flag is recorded; the
    scope owner encodes all flags into one int32 code emitted as a jit
    output and raises host-side via :func:`raise_code` after execution.
    This mirrors the engine's existing join/grouper overflow flags.
  * **tracing with no scope**: error at trace time with advice — silently
    dropping a requested overflow check would be wrong, and there is no
    output channel to thread the flag through.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ArrowInvalid", "check", "check_optional", "collect",
           "ErrorScope", "raise_code"]


class ArrowInvalid(ValueError):
    """Data-dependent kernel error (the pyarrow.lib.ArrowInvalid analog)."""


_tls = threading.local()


def _current_scope() -> Optional["ErrorScope"]:
    return getattr(_tls, "scope", None)


class ErrorScope:
    """Collects (flag, message) pairs raised while tracing a stage."""

    def __init__(self):
        self.flags: List[Tuple[jax.Array, str]] = []

    def add(self, flag, message: str):
        self.flags.append((flag, message))

    def encode(self) -> jax.Array:
        """int32 scalar: 1-based index of the first tripped flag, 0 = ok."""
        code = jnp.int32(0)
        for i, (f, _) in reversed(list(enumerate(self.flags))):
            code = jnp.where(f, jnp.int32(i + 1), code)
        return code

    def messages(self) -> List[str]:
        return [m for _, m in self.flags]


class collect:
    """Context manager installing an :class:`ErrorScope` for this thread."""

    def __enter__(self) -> ErrorScope:
        self._prev = _current_scope()
        scope = ErrorScope()
        _tls.scope = scope
        return scope

    def __exit__(self, *exc):
        _tls.scope = self._prev
        return False


def raise_code(code, messages: List[str]) -> None:
    """Host-side: raise the message selected by a nonzero encoded code."""
    c = int(jax.device_get(code))
    if c:
        raise ArrowInvalid(messages[c - 1])


def check(flag, message: str) -> None:
    """Report a scalar bool error condition (True = error).

    Raises immediately when concrete; defers into the active scope while
    tracing; errors at trace time if there is no scope to carry the flag.
    """
    scope = _current_scope()
    if scope is not None:
        scope.add(flag, message)
        return
    if isinstance(flag, jax.core.Tracer):
        raise NotImplementedError(
            f"checked kernel condition '{message}' inside jit requires an "
            "arrow_tpu.utils.errors.collect() scope to carry the deferred "
            "error flag (acero stages install one automatically)")
    if bool(jax.device_get(flag)):
        raise ArrowInvalid(message)


def check_optional(flag, message: str) -> None:
    """Like :func:`check`, but a raw-jit caller without a scope skips the
    check instead of erroring. For *unchecked* kernels where Arrow still
    raises eagerly (int divide-by-zero, int negative power): eager calls
    and plan stages get parity, hand-jitted pipelines keep compiling.
    """
    scope = _current_scope()
    if scope is not None:
        scope.add(flag, message)
        return
    if isinstance(flag, jax.core.Tracer):
        return
    if bool(jax.device_get(flag)):
        raise ArrowInvalid(message)

"""Device-buffer lifetime control for the axon tunnel.

The axon PJRT relay (the only TPU path in this container) intermittently
poisons its client with a message-less INVALID_ARGUMENT on the second
fully compile-cached execution of the heading per-line chain
(ROUND3_NOTES.md). Step-barriering every device action — validated clean
on the repro corpus — still crashes inside the full workflow, so the
remaining asynchrony is buffer FREES: Python references to device arrays
(upload batches, previous groups' outputs) drop right after the next
group's programs are enqueued, sending deallocations into the relay while
it is executing. This module pins such arrays for the process lifetime
(``hold``) or until an explicitly quiet queue (``release``).

Enabled when the backend is the axon tunnel (or forced via
``CITLAB_HOLD_DEVICE_BUFFERS=1``/``0``). The held set stays small: one
uint8 page batch plus per-group outputs per pipeline stage invocation —
tens of MB per 100 pages against 16 GB of HBM.
"""
from __future__ import annotations

import os

_HELD: list = []
_AUTO: bool | None = None


def _enabled() -> bool:
    # resolved on EVERY call so runtime.set()/env precedence holds at any
    # point in the process (only the backend probe for 'auto' is cached —
    # the backend cannot change once initialized)
    from citlab_as_tpu.config import runtime
    val = runtime.get("hold_device_buffers")
    if val == "auto":
        global _AUTO
        if _AUTO is None:
            import jax
            _AUTO = jax.default_backend() != "cpu"
        return _AUTO
    return bool(val)


def hold(*arrays) -> None:
    """Pin device arrays (no-op when disabled or for None entries)."""
    if _enabled():
        _HELD.extend(a for a in arrays if a is not None)


def release() -> None:
    """Drop every pinned array. Call ONLY on a quiet queue (no programs
    executing or enqueued) — e.g. after a stage's final materialize."""
    _HELD.clear()


def held_count() -> int:
    return len(_HELD)

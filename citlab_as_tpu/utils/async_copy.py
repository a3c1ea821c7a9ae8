"""Async device->host copy prefetch.

The wave-pipelined driver's only real stalls are its readbacks: the axon
tunnel moves ~80-100 MB/s with a ~32 ms roundtrip floor, so a synchronous
``np.asarray`` at a pipeline barrier pays wire time that could have been
hidden behind host work. ``prefetch`` enqueues the device->host transfer
right after the producing program in the in-order queue (jax.Array
``copy_to_host_async``); when the barrier's ``np.asarray`` later runs, the
bytes are (usually) already on the host.

``CITLAB_PREFETCH=0`` disables it — the escape hatch for relay-race
bisection (an async transfer concurrent with later dispatches is the same
wire shape the round-3 INVALID_ARGUMENT bug keyed on; the round-4 soak
validates the default-on configuration).
"""
from __future__ import annotations

import os


def prefetch(*arrays) -> None:
    """Start async device->host copies for any jax.Arrays among ``arrays``
    (None / numpy / missing-API values are ignored)."""
    from citlab_as_tpu.config import runtime
    if not runtime.get("prefetch"):
        return
    for a in arrays:
        fn = getattr(a, "copy_to_host_async", None)
        if fn is not None:
            try:
                fn()
            except Exception:      # never let a prefetch break the pipeline
                pass

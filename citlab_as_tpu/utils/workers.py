"""Host-process fan-out for GIL-bound pipeline stages.

Reference: run_net_post_processing.py:61-82 (ProcessPoolExecutor over <=50-
image sublists), run_baseline_clustering.py:10-43 / run_textregion_
generation.py:10-35 (subprocess-per-XML with stdout scraping), and
run_gnn_clustering.py:327-337 / run_feature_generation.py:40-57
(mp.Process shards). TPU-native split: device work is batched in-process
(XLA, one program), but the pure-Python geometry/IO stages ARE GIL-bound,
so a process pool over item shards is the right host-side parallelism.
Unlike the reference there is no stdout scraping — results and skipped
items come back as values.

Worker startup costs a full interpreter spin-up (~2-3 s here — the site
hook imports jax at every Python start), so a pool only pays off when
per-item work x items / workers well exceeds that, i.e. real corpora on
multi-core hosts. On a single-core machine ``num_workers <= 1`` (the
default) is strictly faster.
"""
from __future__ import annotations

import logging
from concurrent.futures import ProcessPoolExecutor
from typing import Callable, List, Optional, Sequence, Tuple

from citlab_as_tpu.utils.misc import split_list

logger = logging.getLogger(__name__)

_WORKER_FN: Optional[Callable] = None


def _init_worker(fn_builder):
    """Each worker builds its callable once (e.g. loads params) and forces
    the CPU backend so spawned workers never fight over the TPU tunnel.
    Done via env var, NOT by importing jax here: the import costs seconds
    per worker and most host stages never touch jax."""
    global _WORKER_FN
    import os
    import sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "jax" in sys.modules:   # spawned fresh this normally can't happen
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    _WORKER_FN = fn_builder()


def _run_shard(items: Sequence) -> Tuple[List, List]:
    done, skipped = [], []
    for item in items:
        try:
            done.append((item, _WORKER_FN(item)))
        except Exception as e:
            logger.error("worker skipping %r: %s", item, e)
            skipped.append(item)
    return done, skipped


def run_sharded(fn_builder: Callable[[], Callable], items: Sequence,
                num_workers: int = 0, max_shard: int = 50):
    """Apply ``fn_builder()(item)`` to every item.

    ``num_workers`` <= 1 runs in-process (fn errors skip the item, like the
    reference's skipped_files contract). Otherwise shards of at most
    ``max_shard`` items are distributed over a ProcessPoolExecutor.
    Returns (results, skipped): results is a list of (item, value) in
    completion order.
    """
    if num_workers <= 1:
        _init_worker(fn_builder)
        return _run_shard(items)

    shards = split_list(list(items), max(
        num_workers, (len(items) + max_shard - 1) // max_shard))
    shards = [s for s in shards if s]
    results, skipped = [], []
    # spawn, not fork: the parent usually has JAX (multithreaded) loaded,
    # and forked children deadlock/crash in its runtime threads
    import multiprocessing
    with ProcessPoolExecutor(
            max_workers=num_workers, initializer=_init_worker,
            initargs=(fn_builder,),
            mp_context=multiprocessing.get_context("spawn")) as pool:
        for done, skip in pool.map(_run_shard, shards):
            results.extend(done)
            skipped.extend(skip)
    return results, skipped


class PersistentPool:
    """A worker pool that SURVIVES across calls — the wave-pipelined
    workflow driver maps each wave's host tail over it, and paying the
    ~2-3 s spawn+import cost per WAVE (as :func:`run_sharded` would) would
    erase the win. Workers build their callable once via ``fn_builder``
    (same contract as run_sharded) and process items with the log-and-skip
    contract.

    Reference analog: run_net_post_processing.py:61-82 keeps one
    ProcessPoolExecutor alive for the whole corpus; here the pool is
    additionally reused across pipeline waves.
    """

    def __init__(self, fn_builder: Callable[[], Callable], num_workers: int):
        import multiprocessing
        self.num_workers = num_workers
        self._pool = ProcessPoolExecutor(
            max_workers=num_workers, initializer=_init_worker,
            initargs=(fn_builder,),
            mp_context=multiprocessing.get_context("spawn"))

    def map_items(self, items: Sequence) -> Tuple[List, List]:
        """Apply the worker fn to every item (round-robin shards sized to
        the pool). Returns (results, skipped) like :func:`run_sharded`;
        results are (item, value) pairs in completion order."""
        if not items:
            return [], []
        shards = split_list(list(items), self.num_workers)
        shards = [s for s in shards if s]
        results, skipped = [], []
        for done, skip in self._pool.map(_run_shard, shards):
            results.extend(done)
            skipped.extend(skip)
        return results, skipped

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

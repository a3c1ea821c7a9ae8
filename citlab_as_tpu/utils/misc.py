"""Small list / batching helpers (reference: python_util/basic/{misc,list_util}.py)."""
from __future__ import annotations

from typing import Iterable, List, Sequence, TypeVar

T = TypeVar("T")


def split_list(lst: Sequence[T], n: int) -> List[List[T]]:
    """Split ``lst`` into ``n`` nearly equal contiguous chunks.

    Worker-sharding helper, semantics of python_util/basic/misc.py:4-13.
    Chunks differ in length by at most one; empty chunks are dropped.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    k, m = divmod(len(lst), n)
    out = [list(lst[i * k + min(i, m):(i + 1) * k + min(i + 1, m)]) for i in range(n)]
    return [c for c in out if c]


def chunk_list(lst: Sequence[T], max_chunk: int) -> List[List[T]]:
    """Split ``lst`` into chunks of at most ``max_chunk`` items (reference
    run_net_post_processing.py:61-71 shards image lists into <=50-item sublists)."""
    if max_chunk <= 0:
        raise ValueError("max_chunk must be positive")
    return [list(lst[i:i + max_chunk]) for i in range(0, len(lst), max_chunk)]


def filter_by_attribute(objects: Iterable[T], attr: str, value) -> List[T]:
    """Return objects whose ``attr`` equals ``value``."""
    return [o for o in objects if getattr(o, attr, None) == value]


def group_by_attribute(objects: Iterable[T], attr: str) -> dict:
    """Group objects into {attr value: [objects]} (the reference's
    list_util.filter_by_attribute semantics, python_util/basic/list_util.py:4)."""
    out: dict = {}
    for o in objects:
        out.setdefault(getattr(o, attr, None), []).append(o)
    return out


def flatten(nested: Iterable[Iterable[T]]) -> List[T]:
    return [x for sub in nested for x in sub]

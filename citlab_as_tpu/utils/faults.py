"""Per-page fault isolation: the log-and-skip contract.

Reference contract: a failing page is logged and skipped, never fatal to
the batch (run_baseline_clustering.py:39-42 ``skipped_files``,
feature_generation.py:855-911 ``skipped_pages``). The standalone CLIs and
the features stage already follow it (utils/workers.py:50-58,
stages/features.py); this module gives the production workflow drivers the
same contract: a :class:`SkippedPages` registry threaded through the wave
loops, so one corrupt XML or truncated image drops that page out of every
downstream stage instead of killing the whole batch.
"""
from __future__ import annotations

import logging
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)


class SkippedPages:
    """Registry of pages dropped by per-page guards.

    Keys are image paths (the workflow's canonical page identity). Each
    entry records the first stage that failed for the page; later stages
    never see it (the drivers filter their waves by :meth:`__contains__`).
    """

    def __init__(self):
        self._entries: List[dict] = []
        self._keys = set()

    def record(self, key: str, stage: str, exc: BaseException) -> None:
        logger.error("skipping page %r at stage %s: %s: %s",
                     key, stage, type(exc).__name__, exc)
        if key not in self._keys:
            self._keys.add(key)
            self._entries.append({"page": key, "stage": stage,
                                  "error": f"{type(exc).__name__}: {exc}"})

    def __contains__(self, key: str) -> bool:
        return key in self._keys

    def __len__(self) -> int:
        return len(self._entries)

    def as_list(self) -> List[dict]:
        return list(self._entries)

    def guard(self, key: str, stage: str, fn: Callable, default=None):
        """Run ``fn()``; on any exception record (key, stage) and return
        ``default`` instead of propagating."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - the skip contract
            self.record(key, stage, e)
            return default


def page_guard(on_page_error: Optional[Callable], key: str, stage: str,
               fn: Callable, default=None):
    """Stage-level guard hook: processors call this around per-page work.
    ``on_page_error=None`` keeps the historical raise-through behavior
    (single-page tools, tests asserting on errors); a callback — typically
    ``SkippedPages.record`` — switches the loop to log-and-skip."""
    if on_page_error is None:
        return fn()
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 - the skip contract
        on_page_error(key, stage, e)
        return default

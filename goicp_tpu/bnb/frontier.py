"""Host-side BnB frontier: structure-of-arrays cube store.

Replaces the reference's ``std::priority_queue<RotNode/TransNode>``
(``src/common.h:88-95,123-130``, ``fgoicp.cpp:34,117``) with a numpy SoA that
supports *batch* pops (the device evaluates hundreds of cubes per step, so a
one-at-a-time heap is the wrong shape) and incumbent-driven re-filtering
(≙ the queue rebuild at ``jly_goicp.cpp:533-543``).
"""

from __future__ import annotations

import numpy as np


class Frontier:
    """Cubes ``(center [K,3], span [K], lb [K], ub [K])``.

    Pops are best-first by ``(lb, ub)`` lexicographic — early in the search
    most lower bounds are exactly 0 (rotation uncertainty swallows every
    distance), so the inherited upper bound is the only signal separating
    promising regions from noise; a plain lb-heap degenerates to random pops.
    """

    def __init__(self):
        self.center = np.zeros((0, 3), np.float32)
        self.span = np.zeros((0,), np.float32)
        self.lb = np.zeros((0,), np.float32)
        self.ub = np.zeros((0,), np.float32)

    def __len__(self) -> int:
        return self.center.shape[0]

    def push(self, center, span, lb, ub=None):
        k = np.asarray(span).size
        if ub is None:
            ub = np.full(k, np.inf, np.float32)
        self.center = np.concatenate([self.center, np.asarray(center, np.float32).reshape(-1, 3)])
        self.span = np.concatenate([self.span, np.asarray(span, np.float32).reshape(-1)])
        self.lb = np.concatenate([self.lb, np.asarray(lb, np.float32).reshape(-1)])
        self.ub = np.concatenate([self.ub, np.asarray(ub, np.float32).reshape(-1)])

    def pop_best(self, k: int):
        """Remove and return the ``k`` best cubes by ``(lb, ub)``."""
        k = min(k, len(self))
        if k == 0:
            z = np.zeros((0,), np.float32)
            return np.zeros((0, 3), np.float32), z, z, z
        if k >= len(self):
            out = (self.center, self.span, self.lb, self.ub)
            self.__init__()
            return out
        idx = np.lexsort((self.ub, self.lb))[:k]
        keep = np.ones(len(self), bool)
        keep[idx] = False
        out = (self.center[idx], self.span[idx], self.lb[idx], self.ub[idx])
        self.center, self.span, self.lb, self.ub = (
            self.center[keep],
            self.span[keep],
            self.lb[keep],
            self.ub[keep],
        )
        return out

    def prune(self, threshold: float) -> int:
        """Drop cubes with ``lb >= threshold``; returns #dropped
        (≙ jly's queue re-filter on a new incumbent, ``jly_goicp.cpp:533-543``)."""
        keep = self.lb < threshold
        dropped = int((~keep).sum())
        if dropped:
            self.center, self.span, self.lb, self.ub = (
                self.center[keep],
                self.span[keep],
                self.lb[keep],
                self.ub[keep],
            )
        return dropped

    def min_lb(self) -> float:
        return float(self.lb.min()) if len(self) else float("inf")

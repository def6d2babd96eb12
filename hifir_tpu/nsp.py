"""Null-space filter for (nearly) singular systems.

Ref ``/root/reference/src/hif/NspFilter.hpp:63-195``: after ``M.solve`` the
solution is filtered against a known (left) null space — either the built-in
constant mode over an index range (subtract the mean) or a user callback.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["NspFilter"]


class NspFilter:
    """Constant-mode or user-defined null-space projector."""

    def __init__(self, start: int = 0, end: int = -1,
                 user_func: Optional[Callable[[np.ndarray], np.ndarray]] = None):
        self.start = start
        self.end = end
        self.user_func = user_func

    def filter(self, x: np.ndarray) -> np.ndarray:
        if self.user_func is not None:
            return self.user_func(x)
        end = x.shape[0] if self.end < 0 else self.end
        seg = x[self.start:end]
        x = np.array(x, copy=True)
        x[self.start:end] = seg - seg.mean()
        return x

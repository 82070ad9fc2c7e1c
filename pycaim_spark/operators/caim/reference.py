"""Paper-literal naive CAIM — the in-repo correctness oracle.

Written straight from Kurgan & Cios 2004 §2 with deliberate O(|B|²·S·n)
naivety and NO shared code with :mod:`.core` (different code path, same
spec — that independence is what makes the property tests meaningful,
SURVEY.md §5.2). Only for ≤ a few thousand rows.
"""

from __future__ import annotations

import numpy as np


def _quanta(x: np.ndarray, y_codes: np.ndarray, n_classes: int, bounds: list[float]):
    """Quanta matrix for full boundary scheme bounds = [d_0, ..., d_n]."""
    n_intervals = len(bounds) - 1
    q = np.zeros((n_intervals, n_classes), dtype=np.int64)
    for xi, yi in zip(x, y_codes):
        # interval r: (d_{r-1}, d_r]; the first interval also contains d_0.
        r = 0
        for t in range(1, n_intervals + 1):
            if xi <= bounds[t]:
                r = t - 1
                break
        q[r, yi] += 1
    return q


def _caim(q: np.ndarray) -> float:
    total = 0.0
    for r in range(q.shape[0]):
        m_r = q[r].sum()
        if m_r > 0:
            total += float(q[r].max()) ** 2 / float(m_r)
    return total / q.shape[0]


def naive_caim_fit(x, y) -> np.ndarray:
    """Greedy CAIM exactly as published; returns interior cuts (float64).

    Tie-break: equal CAIM scores keep the smallest candidate boundary
    (iteration ascends sorted candidates with a strict '>').
    """
    x = np.asarray(x, dtype=np.float64)
    classes, y_codes = np.unique(np.asarray(y), return_inverse=True)
    n_classes = len(classes)
    distinct = np.unique(x)
    if len(distinct) < 2:
        return np.empty(0, dtype=np.float64)
    lo, hi = float(distinct[0]), float(distinct[-1])
    candidates = [
        (float(distinct[i]) + float(distinct[i + 1])) / 2.0
        for i in range(len(distinct) - 1)
    ]

    accepted: list[float] = []
    global_caim = 0.0
    k = 1
    while True:
        best_val, best_b = -np.inf, None
        for b in candidates:
            if b in accepted:
                continue
            scheme = [lo, *sorted([*accepted, b]), hi]
            val = _caim(_quanta(x, y_codes, n_classes, scheme))
            if val > best_val:
                best_val, best_b = val, b
        if best_b is None:
            break
        if best_val > global_caim or k < n_classes:
            accepted.append(best_b)
            global_caim = best_val
            k += 1
        else:
            break
    return np.array(sorted(accepted), dtype=np.float64)

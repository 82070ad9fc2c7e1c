"""Vectorized CAIM greedy search over a (value, class)-count histogram.

Algorithm spec (Kurgan & Cios 2004, SURVEY.md §2.A):

- Quanta matrix: for cut scheme ``D = {d_0..d_n}`` forming n intervals
  ``(d_{r-1}, d_r]``, ``q_ir`` = #rows of class i in interval r.
- Criterion: ``CAIM(D) = (1/n) · Σ_r max_i(q_ir)² / M_+r``.
- Greedy: candidates are midpoints of consecutive distinct values; start
  with one interval; each round tentatively add every remaining candidate,
  keep the best; accept while the criterion improves OR fewer intervals
  than classes exist (guarantees ≥ S−1 interior cuts).

Spec decisions (documented, deterministic):

- Tie on equal best CAIM → the smallest candidate cut value wins (NumPy
  argmax first-occurrence over candidates ordered by value).
- Interval membership: value v → 1-based id = 1 + #{cuts < v}; a value
  exactly equal to a cut falls LEFT (matches the ``(prev, cut]``
  half-open-left paper intervals). Out-of-range values clamp into the
  first/last interval (cuts are interior only).

Complexity: per accepted cut one vectorized pass O(m·S) over the histogram
(prefix-sum split evaluation for every remaining candidate at once) — not
the O(|B|²·S) naive search. m = #distinct values, S = #classes.
"""

from __future__ import annotations

import numpy as np


def bucketize_value(v: float, cuts: np.ndarray) -> int:
    """1-based interval id for a value given sorted interior cuts."""
    return int(np.searchsorted(cuts, v, side="left")) + 1


def caim_value(bucket_class_counts: np.ndarray) -> float:
    """CAIM criterion from a quanta matrix of shape (n_intervals, S).

    Divides by the TOTAL interval count n (paper-faithful, Kurgan & Cios
    2004 eq. 2), not the non-empty count: an empty interval contributes a
    zero term to the sum but still counts in the denominator. During the
    greedy fit the distinction is moot (midpoint cuts never create empty
    intervals), but externally supplied cut schemes may contain them.
    """
    totals = bucket_class_counts.sum(axis=1)
    keep = totals > 0
    maxes = bucket_class_counts.max(axis=1)[keep]
    n = bucket_class_counts.shape[0]
    return float((maxes.astype(np.float64) ** 2 / totals[keep]).sum() / n)


def caim_greedy(
    values: np.ndarray,
    counts: np.ndarray,
    min_intervals: int | None = None,
) -> np.ndarray:
    """Fit CAIM cut points from a histogram.

    Parameters
    ----------
    values : (m,) float64, sorted strictly increasing distinct values.
    counts : (m, S) int64, per-(value, class) row counts.
    min_intervals : accept cuts unconditionally until this many intervals
        exist (paper: S, the number of classes). Defaults to S.

    Returns
    -------
    (k,) float64 sorted interior cut points (midpoints of consecutive
    distinct values). Empty when m < 2.
    """
    values = np.asarray(values, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.int64)
    m, n_classes = counts.shape
    if min_intervals is None:
        min_intervals = n_classes
    if m < 2:
        return np.empty(0, dtype=np.float64)

    # cum0[i] = per-class counts of values[:i]; segment [a, c) stats are
    # cum0[c] - cum0[a]. This is the whole trick: every candidate split of
    # every segment is a prefix-sum difference.
    cum0 = np.vstack([np.zeros((1, n_classes), dtype=np.int64), counts.cumsum(axis=0)])

    def seg_term(a: int, c: int) -> float:
        cls = cum0[c] - cum0[a]
        return float(cls.max()) ** 2 / float(cls.sum())

    splits: list[int] = []  # split after index j ⇒ cut between j and j+1
    global_caim = 0.0
    while True:
        bounds = [0, *[j + 1 for j in splits], m]
        k = len(bounds) - 1  # current interval count
        terms = [seg_term(bounds[i], bounds[i + 1]) for i in range(k)]

        best_caim = -np.inf
        best_j = -1
        for i in range(k):
            a, c = bounds[i], bounds[i + 1]
            if c - a < 2:
                continue  # no interior split point
            seg_cls = cum0[c] - cum0[a]
            # Left parts for split after j = a..c-2, all at once.
            left = cum0[a + 1 : c] - cum0[a]  # (c-a-1, S)
            right = seg_cls - left
            lt = left.sum(axis=1).astype(np.float64)
            rt = right.sum(axis=1).astype(np.float64)
            left_term = left.max(axis=1).astype(np.float64) ** 2 / lt
            right_term = right.max(axis=1).astype(np.float64) ** 2 / rt
            # Accumulate in interval order with a sequential fold — the
            # exact float-addition sequence of a per-interval loop — so
            # scores (and therefore argmax tie-breaks) are bit-identical
            # to the naive reference implementation.
            acc = np.zeros(c - a - 1, dtype=np.float64)
            for t in terms[:i]:
                acc = acc + t
            acc = acc + left_term
            acc = acc + right_term
            for t in terms[i + 1 :]:
                acc = acc + t
            caim_j = acc / (k + 1)
            local_best = int(np.argmax(caim_j))  # first occurrence = lowest cut
            if caim_j[local_best] > best_caim:
                best_caim = float(caim_j[local_best])
                best_j = a + local_best
        if best_j < 0:
            break  # no candidate splits remain
        if best_caim > global_caim or k < min_intervals:
            splits.append(best_j)
            splits.sort()
            global_caim = best_caim
        else:
            break

    return np.array(
        [(values[j] + values[j + 1]) / 2.0 for j in sorted(splits)],
        dtype=np.float64,
    )


def histogram_from_arrays(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray, list]:
    """Build the (values, counts) histogram from raw feature/label arrays.

    Labels are ordered by sorted unique value for determinism. Returns
    (values, counts, class_labels).
    """
    x = np.asarray(x, dtype=np.float64)
    classes, y_codes = np.unique(np.asarray(y), return_inverse=True)
    values, v_codes = np.unique(x, return_inverse=True)
    counts = np.zeros((len(values), len(classes)), dtype=np.int64)
    np.add.at(counts, (v_codes, y_codes), 1)
    return values, counts, list(classes)

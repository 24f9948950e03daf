"""Profile partitioning and padding buckets.

Two layers of work division:

- ``balanced_partitions``: contiguous, size-balanced partitions by prefix
  sums of per-profile weights — the tensor analogue of the reference's
  profile_reader partitioning (src/db/profile_reader.c:44-72 over
  profile byte sizes, limits ceiling NUM_THREADS=64).  Used to shard the
  DB across devices/hosts.
- ``bucket_by_core_size``: groups profiles into padded core-size buckets so
  batched kernels waste little work on padding (the reference has no
  analogue — its DP is per-profile sparse; dense batching makes padding
  economics matter, SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

import numpy as np


def balanced_partitions(weights: np.ndarray, nparts: int) -> list[range]:
    """Split indices 0..N-1 into <= nparts contiguous ranges with roughly
    equal total weight (greedy prefix walk against the ideal boundary)."""
    weights = np.asarray(weights, dtype=np.float64)
    n = len(weights)
    nparts = max(1, min(nparts, n))
    total = float(weights.sum())
    csum = np.concatenate([[0.0], np.cumsum(weights)])
    bounds = [0]
    for p in range(1, nparts):
        target = total * p / nparts
        # first index whose prefix sum reaches the target
        j = int(np.searchsorted(csum, target, side="left"))
        j = max(bounds[-1] + 1, min(j, n - (nparts - p)))
        bounds.append(j)
    bounds.append(n)
    return [range(bounds[i], bounds[i + 1]) for i in range(nparts)]


def pad_core_size(k: int, lane: int = 128) -> int:
    """Pad a core size up to a TPU-lane-friendly bucket boundary: small
    power-of-two steps below one lane, lane multiples above."""
    if k <= 8:
        return 8
    if k <= lane:
        p = 8
        while p < k:
            p *= 2
        return p
    return ((k + lane - 1) // lane) * lane


def bucket_by_core_size(
    core_sizes: np.ndarray, lane: int = 128
) -> dict[int, np.ndarray]:
    """Group profile indices by padded core size.

    Returns {kpad: sorted array of profile indices}.
    """
    core_sizes = np.asarray(core_sizes)
    buckets: dict[int, list[int]] = {}
    for i, k in enumerate(core_sizes):
        kp = pad_core_size(int(k), lane)
        buckets.setdefault(kp, []).append(i)
    return {k: np.asarray(v, dtype=np.int64) for k, v in sorted(buckets.items())}

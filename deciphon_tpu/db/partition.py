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
    equal total weight (greedy prefix walk against the ideal boundary).
    ``nparts`` is clamped to NUM_PARTITIONS_MAX, the reference's thread /
    partition ceiling (core/limits.h:8 via profile_reader_setup)."""
    from deciphon_tpu.utils.limits import NUM_PARTITIONS_MAX

    weights = np.asarray(weights, dtype=np.float64)
    n = len(weights)
    nparts = max(1, min(nparts, n, NUM_PARTITIONS_MAX))
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


def pack_profile_rows(
    core_sizes: np.ndarray,
    lane: int = 128,
    group: int = 16,
    small_group_kpad: int = 768,
    small_group: int = 8,
) -> list[tuple[int, int, np.ndarray]]:
    """Sorted-greedy row packing for the batched Viterbi kernel.

    Profiles sorted by core size DESCENDING are cut into rows of
    ``group`` consecutive profiles; each row's padded core width (kpad)
    is the lane-rounded maximum core in the row.  Sorted-contiguous
    cutting minimizes sum(rows * kpad) over all partitions into rows of
    a fixed size, and rows sharing (kpad, row width) merge into one
    kernel block.  Rows whose kpad exceeds ``small_group_kpad`` use the
    narrower ``small_group`` width: a lone huge profile (the 4096-core
    envelope limit, reference include/deciphon/core/limits.h:11) wastes
    half as many padding sublanes, and group-8 rows keep the fragment
    table VMEM-resident through kpad 1536 (viterbi_pallas.resident_ok —
    measured faster than streaming there).

    This is the tensor-era replacement for both the reference's balanced
    byte partitions (src/db/profile_reader.c:44-72) and the round-2
    per-profile tier buckets: padding efficiency on a Pfam-shaped
    lognormal core distribution goes 0.17 -> ~0.5.

    Returns a list of (kpad, group, profile-index array) blocks, largest
    cores first; every index appears exactly once.
    """
    core_sizes = np.asarray(core_sizes)
    order = np.argsort(-core_sizes, kind="stable")
    blocks: list[tuple[int, int, list[np.ndarray]]] = []
    i = 0
    n = len(order)
    while i < n:
        kmax = int(core_sizes[order[i]])
        kpad = max(lane, (kmax + lane - 1) // lane * lane)
        g = small_group if kpad > small_group_kpad else group
        row = order[i : i + g]
        if blocks and blocks[-1][0] == kpad and blocks[-1][1] == g:
            blocks[-1][2].append(row)
        else:
            blocks.append((kpad, g, [row]))
        i += g
    return [
        (kpad, g, np.concatenate(rows)) for kpad, g, rows in blocks
    ]


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

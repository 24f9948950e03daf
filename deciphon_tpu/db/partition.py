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


# Segmented-row tiers: (per-profile width W, segments per row nsegs).
# A row packs group*nsegs profiles, each in its own W-lane segment of a
# W*nsegs-lane kernel row (ops/viterbi_pallas.py segmented packing).
# Every W*nsegs product is a 128-multiple <= 768, so segmented rows stay
# fully VMEM-resident (regime A) at the default GROUP=16 width and keep
# the full 32-deep sequence stack (viterbi_pallas.resident_ok/nseq_cap).
SEG_TIERS: tuple[tuple[int, int], ...] = (
    (32, 8),   # K=256
    (64, 8),   # K=512
    (96, 8),   # K=768
    (128, 4),  # K=512
    (160, 4),  # K=640
    (192, 4),  # K=768
    (256, 3),  # K=768
    (320, 2),  # K=640
    (384, 2),  # K=768
)


def _block_shape(
    kmax: int, n: int, lane: int, group: int,
    small_group_kpad: int, small_group: int, seg: bool,
) -> tuple[float, tuple[int, int, int]]:
    """Best (padded work, (kpad, group, nsegs)) for a block of ``n``
    profiles whose largest core is ``kmax``.

    Candidates: the classic unsegmented row (per-profile width = lane-
    rounded kmax; narrow sublane group above ``small_group_kpad``), plus
    every segmented tier wide enough for kmax, including shrunk-nsegs
    variants whose lane-aligned W*nsegs row still fits the resident
    budget — so an underfull block can trade segment count for slot
    padding.  Ties prefer wider kernel rows (higher measured GCUPS)."""
    kpad_u = max(lane, (kmax + lane - 1) // lane * lane)
    g_u = small_group if kpad_u > small_group_kpad else group
    cands = [(kpad_u, g_u, 1)]
    if seg:
        for bound, smax in SEG_TIERS:
            if kmax <= bound:
                for s in range(2, smax + 1):
                    if (bound * s) % lane == 0:
                        cands.append((bound, group, s))

    def cost(c):
        w, g, s = c
        slots = g * s
        return ((n + slots - 1) // slots * slots * w, -w * s)

    best = min(cands, key=cost)
    return float(cost(best)[0]), best


def pack_profile_rows(
    core_sizes: np.ndarray,
    lane: int = 128,
    group: int = 16,
    small_group_kpad: int = 768,
    small_group: int = 8,
    seg: bool = True,
    block_penalty: float = 0.01,
) -> list[tuple[int, int, int, np.ndarray]]:
    """Minimum-padding block packing for the batched Viterbi kernel.

    Profiles sorted by core size DESCENDING are cut into contiguous
    blocks; each block's shape comes from ``_block_shape``: cores above
    the top SEG_TIER get the classic one-profile-per-sublane row whose
    per-profile padded width (kpad) is the lane-rounded block maximum,
    smaller cores pack ``nsegs`` profiles per sublane into kpad-lane
    segments of a kpad*nsegs-lane kernel row.  Block boundaries are
    chosen by an exact dynamic program over tier-crossing cut points
    minimizing total padded work + ``block_penalty`` * total work per
    block (each block is one kernel compile variant + dispatch, so the
    penalty trades padding efficiency against cold-start compiles).

    Sorted-contiguous blocks make within-block spread waste small; the
    DP also merges sparse tiers upward so a tiny DB doesn't pad out to
    128 slots per tier.  Rows whose unsegmented kpad exceeds
    ``small_group_kpad`` use the narrower ``small_group`` sublane width:
    a lone huge profile (the 4096-core envelope limit, reference
    include/deciphon/core/limits.h:11) wastes half as many padding
    sublanes, and group-8 rows keep the fragment table VMEM-resident
    through kpad 1536 (viterbi_pallas.resident_ok — measured faster
    than streaming there).

    This replaces the reference's balanced byte partitions
    (src/db/profile_reader.c:44-72) for the dense-tensor era: padding
    efficiency on the Pfam-shaped bench DB went 0.17 (round-2 tier
    buckets) -> 0.61 (round-3 sorted rows) -> ~0.85 (round-4 segmented
    rows, profile-axis only).

    Returns a list of (kpad, group, nsegs, profile-index array) blocks
    where kpad is the PER-PROFILE padded width (kernel rows are
    kpad * nsegs lanes wide); every index appears exactly once.
    """
    core_sizes = np.asarray(core_sizes)
    n = len(core_sizes)
    order = np.argsort(-core_sizes, kind="stable")
    if n == 0:
        return []
    sorted_cores = core_sizes[order]

    # candidate cut points: positions where the minimal grid width
    # changes (blocks made of whole grid-tiers are never beaten by
    # blocks splitting a tier: same W, strictly more slot padding)
    grid = [w for w, _ in SEG_TIERS] if seg else []
    kmax0 = int(sorted_cores[0])
    top = max(lane, (kmax0 + lane - 1) // lane * lane)
    grid = sorted(set(grid) | {w for w in range(lane, top + lane, lane)})

    def gridw(c: int) -> int:
        for w in grid:
            if c <= w:
                return w
        return grid[-1]

    widths = np.array([gridw(int(c)) for c in sorted_cores])
    cuts = [0] + (np.nonzero(widths[1:] != widths[:-1])[0] + 1).tolist()
    cuts.append(n)

    ncuts = len(cuts)
    penalty = block_penalty * float(np.sum(sorted_cores))
    best = [np.inf] * ncuts  # best[i] = min cost packing sorted[:cuts[i]]
    choice: list[tuple[int, tuple[int, int, int]] | None] = [None] * ncuts
    best[0] = 0.0
    for j in range(1, ncuts):
        for i in range(j):
            kmax = int(sorted_cores[cuts[i]])
            cost, shape = _block_shape(
                kmax, cuts[j] - cuts[i], lane, group,
                small_group_kpad, small_group, seg,
            )
            total = best[i] + cost + penalty
            if total < best[j]:
                best[j] = total
                choice[j] = (i, shape)
    blocks: list[tuple[int, int, int, np.ndarray]] = []
    j = ncuts - 1
    while j > 0:
        i, (kpad, g, s) = choice[j]
        blocks.append((kpad, g, s, order[cuts[i] : cuts[j]]))
        j = i
    blocks.reverse()
    return blocks


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

"""Pallas TPU kernel for the batched codon-frame Viterbi.

The speed-of-light path for the scan hot loop (replaces imm_dp_viterbi,
reference src/server/scan_thread.c:115-118).  One kernel instance scores
GROUP profiles (sublanes) x K core nodes (lanes) x NSEQ sequences (stacked
leading dim) in lockstep; the grid runs (profile-groups x seq-groups) with
sequences innermost so each group's fragment tables stay VMEM-resident
across the whole read batch — the direct fix for the reference's
re-read-the-DB-per-sequence design (scan_thread.c:96-99).

Performance notes (measured on v5e; see git history for the ablations):
  - cross-lane rotates (pltpu.roll) dominate the DP step: the D-chain
    prefix-cummax is log2(K) serial rolls per position.  Rolls have a
    large fixed cost, so NSEQ sequences are STACKED into one [NSEQ, GROUP,
    K] array and every roll/max processes all of them at once;
  - match fragment tables femis_m[1365, GROUP, K] are DMA'd manually into
    a persistent VMEM scratch once per profile group (single-buffered);
    per-position emission lookup is a dynamic row slice per sequence;
  - the 5-position DP lookback uses compile-time ring slots via a
    5-position-unrolled chunk loop (no dynamic ring indexing), with the
    lane-shifted copies of VM/VI/VD stored at write time;
  - final scores are captured with a running where(i == seq_len) select
    instead of per-position predicated stores;
  - sequence fragment indices are DMA'd to SMEM so row indices are scalar
    reads; special-state transitions are recomputed per sequence from its
    length in-kernel (protein_profile_setup semantics,
    src/model/protein_profile.c:155-216).

Two residency regimes cover the reference's full core-size envelope
(core_size <= 4096, include/deciphon/core/limits.h:11):

  - kpad <= RESIDENT_MAX_KPAD: the whole 1365-row fragment table fits in
    VMEM (regime A, the small-profile fast path);
  - kpad up to 4096 (regime B): only the 84 length-1..3 rows stay
    VMEM-resident (they cover 3 of the 5 lookback lengths every position);
    the length-4/5 rows — 94% of the table — stay in HBM and the two rows
    each sequence needs per position are gathered by dynamic row DMAs,
    double-buffered one position ahead (indices are already in SMEM for
    the whole chunk, so the fetch pipelines ahead of compute).  Demand is
    2*nseq rows/position = ~2.7 bytes per DP cell — well under HBM
    bandwidth at the kernel's measured cell rate.

Segmented lane packing (``nsegs > 1``): the lane axis splits into nsegs
independent segments of width W = K/nsegs, each holding a DIFFERENT
profile, so one kernel row scores group*nsegs profiles.  This kills the
128-lane padding floor for small cores (the round-3 bench's biggest
waste: a median-151-core Pfam DB ran at padding efficiency 0.61).  The
mechanics reuse the existing machinery:
  - the D-chain prefix scan and the k->k+1 core shift get segment-local
    additive NEG masks (lane % W < shift instead of lane < shift) and
    the scan stops at log2(W) rolls instead of log2(K) — segmentation
    makes the dominant roll chain CHEAPER per cell, not pricier;
  - per-profile scalars (specials N/J/C/E/B/R, insert/null emissions,
    final scores) widen from [nseq, group] to [nseq, nsegs*group] (lane
    index s*group + g) — same VPU tile count per op as unsegmented at
    equal K;
  - only the lane<->compact bridges are per-segment: the E-reduction
    (per-segment lane max), the B-entry broadcast, and ONE batched
    insert-emission broadcast per position (the 5 lookback rows bridge
    in a single [5, nseq, ncols] -> lanes op — bridging them per-l was
    the round-4 cost that made segmentation lose end-to-end).
All segments share each sequence's per-position fragment-row gather, so
match-table traffic is unchanged.  Segmented packing pays off only
under the fused whole-scan dispatch (extra blocks are free there);
docs/PERFORMANCE.md carries the A/B matrix.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deciphon_tpu.models.frame import FRAG_OFFSET, FRAG_SENTINEL
from deciphon_tpu.ops.viterbi_jax import NEG, ProfileBlock

GROUP = 16  # default profiles per kernel instance (sublane dim)
NSEQ = 32  # default sequences per kernel instance (stacked leading dim)
NTAB = FRAG_SENTINEL + 1  # 1365 fragment rows incl. -inf sentinel

# Largest padded core size whose full fragment table stays VMEM-resident
# (regime A) at the default GROUP width.  Above it the kernel switches to
# regime B: length-1..3 rows resident, length-4/5 rows streamed from HBM
# per position.  The real budget is the table footprint NTAB*group*K, so
# narrower rows stay resident deeper into the envelope (resident_ok).
RESIDENT_MAX_KPAD = 768
NRES_B = FRAG_OFFSET[4]  # 84 rows cover fragment lengths 1..3
STREAM_LENGTHS = (4, 5)


def resident_ok(kpad: int, group: int = GROUP, ntab: int = NTAB) -> bool:
    """Whether the full fragment table fits VMEM for this row shape:
    ntab * group * kpad * 4 B <= ~67 MB (leaves room for the DP rings
    inside the 100 MB scoped-vmem budget).  group-8 rows stay resident
    through kpad 1536 — measured faster than streaming there (v5e:
    100.9 vs 93.2 GCUPS at kpad 1024, 92.8 vs 89.5 at 1536).  Extended
    (IUPAC) tables are ntab ~3x bigger, so their residency cutoff drops
    proportionally."""
    return kpad * group * ntab <= RESIDENT_MAX_KPAD * GROUP * NTAB


def nseq_cap(kpad: int, group: int = GROUP) -> int:
    """Per-instance sequence-stack cap: the DP rings + stream buffers are
    O(nseq*group*K) of VMEM, so the stack shrinks as the (group x core)
    footprint grows and recovers when the profile rows are narrower."""
    budget = 1024 * GROUP // group  # group-lanes at the full stack
    if kpad <= budget:
        return NSEQ
    if kpad <= 2 * budget:
        return 16
    return 8

# trans plane order in the packed [P, NPLANES, GROUP, K] tensor
(P_ENTRY, P_MM_OUT, P_IM_OUT, P_DM_OUT, P_MI, P_II, P_ABASE, P_CDD) = range(8)
NPLANES = 8

# Sequence fragment indices stream through SMEM in double-buffered chunks
# of CPOS positions (255 = 51 quintets, so the 5-slot DP rings keep
# compile-time slot ids across chunk boundaries).  Fixed-size buffers
# decouple read length from scalar memory: 2 x nseq x WC x 4 bytes
# (~326 KiB at the 32-deep stack) regardless of L.
CPOS = 255
WC = 1280  # per-seq ints per chunk: CPOS*5 = 1275 used, padded to a
# whole number of 128-int units (HBM DMA minormost-dim alignment)
SEQROWS = 8  # chunk payload shaped [SEQROWS, nseq*WC/SEQROWS]: HBM tiling
# binds the LAST TWO dims, so sliced dims (seq-group, chunk) must lead
# and the trailing dims stay whole and tile-aligned
SLPAD = 128  # seqlen block [SEQROWS, SLPAD], row 0 carries the lengths


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _shift_lanes(x, sh: int, negmask=None):
    """Shift +sh along the lane (last) axis, filling with ~NEG.

    With a precomputed ``negmask`` ([1,1,K]: NEG on lanes < sh, else 0)
    the fill is a single vector add onto the rolled value instead of
    iota+compare+select — values are bounded well inside |NEG|, so
    "rolled + NEG" is as good as -inf to every downstream max."""
    rolled = pltpu.roll(x, shift=sh, axis=x.ndim - 1)
    if negmask is not None:
        return rolled + negmask
    return jnp.where(_lane_iota(x.shape) < sh, NEG, rolled)


def _cummax_lanes(x, k: int, negmasks=None, join=jnp.maximum):
    # Hillis-Steele doubling scan: exact for any associative join
    # (max for Viterbi, logaddexp for forward) — adjacent windows are
    # disjoint at every step.
    sh = 1
    while sh < k:
        m = negmasks[sh] if negmasks is not None else None
        x = join(x, _shift_lanes(x, sh, m))
        sh *= 2
    return x


def _kernel_semiring(name: str):
    """(pairwise join, lane reduce) — max = Viterbi, logsumexp = forward."""
    if name == "max":
        return jnp.maximum, lambda x: jnp.max(x, axis=-1)
    assert name == "logsumexp"

    def reduce_lse(x):
        m = jnp.max(x, axis=-1, keepdims=True)
        return m[..., 0] + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1))

    return jnp.logaddexp, reduce_lse


def _kernel(
    seqinfo_ref,  # HBM [SG, NCH, SEQROWS, NSEQ*WC/SEQROWS] int32
    seqlen_ref,  # HBM [SG, SEQROWS, SLPAD] int32 (row 0 holds lengths)
    femis_m_hbm,  # HBM [P, NTAB, GROUP, K]
    femis_in_ref,  # VMEM [1, NTAB, 2, nsegs*GROUP]: insert + null tables
    trans_ref,  # VMEM [1, NPLANES, GROUP, K]
    alt_ref,  # VMEM [1, SG, NSEQ, nsegs*GROUP]
    null_ref,  # VMEM [1, SG, NSEQ, nsegs*GROUP]
    femis_m,  # scratch VMEM [nres, GROUP, K] (persists across grid steps)
    ring_cs,  # scratch VMEM [5, NSEQ, GROUP, K]: lane-shifted
    #   max(VM+mm_out, VI+im_out, VD+dm_out) — the whole core in-flow
    ring_ic,  # scratch VMEM [5, NSEQ, GROUP, K]: max(VM+mi, VI+ii)
    ring_s,  # scratch VMEM [5, 8, NSEQ, nsegs*GROUP]: specials
    out_acc,  # scratch VMEM [2, NSEQ, nsegs*GROUP]: (alt, null) capture
    eidx_smem,  # scratch SMEM [2, SEQROWS, NSEQ*WC/SEQROWS] int32
    seqlen_smem,  # scratch SMEM [SEQROWS, SLPAD] int32
    femis_sem,
    eidx_sem,  # DMA semaphore pair, one per chunk buffer
    seqlen_sem,
    *args,  # regime B: stream_buf VMEM [2, NSTR, nseq, group, K],
    #   stream_sem DMA[(2, NSTR, nseq)]
    K: int,
    nseq: int,
    nch: int,
    multi_hits: bool,
    hmmer3_compat: bool,
    n_stream: int = 0,
    semiring: str = "max",
    group: int = GROUP,
    dchain: str = "scan",
    nsegs: int = 1,
    ablate: str = "none",
    spans: tuple | None = None,
):
    join, reduce_k = _kernel_semiring(semiring)
    if n_stream:
        stream_buf, stream_sem = args
    p_id = pl.program_id(0)
    s_id = pl.program_id(1)
    nres = femis_m.shape[0]
    segw = K // nsegs  # per-profile lane width (== K when unsegmented)
    ncols = nsegs * group  # per-profile columns of the compact arrays

    def eidx_dma(c, buf):
        return pltpu.make_async_copy(
            seqinfo_ref.at[s_id, c], eidx_smem.at[buf], eidx_sem.at[buf]
        )

    sl_dma = pltpu.make_async_copy(
        seqlen_ref.at[s_id], seqlen_smem, seqlen_sem
    )
    sl_dma.start()
    eidx_dma(0, 0).start()

    # match fragment tables -> VMEM, once per profile group (the sequence
    # axis is innermost, so the scratch stays valid for the whole batch).
    # Regime B keeps only the first `nres` (length-1..3) rows resident.
    @pl.when(s_id == 0)
    def _():
        dma = pltpu.make_async_copy(
            femis_m_hbm.at[p_id, pl.ds(0, nres)], femis_m, femis_sem
        )
        dma.start()
        dma.wait()

    def eidx_at(buf, qq, local, l):
        """Scalar SMEM read: fragment index for (seq qq, chunk-local
        position `local`, lookback length l)."""
        return eidx_smem[
            buf, qq // per_row, (qq % per_row) * WC + local * 5 + (l - 1)
        ]

    def stream_issue(buf, local, sslot):
        """Start the length-4/5 row gathers for chunk-local position
        ``local`` into stream double-buffer slot ``sslot``."""
        for li, l in enumerate(STREAM_LENGTHS[-n_stream:]):
            for qq in range(nseq):
                idx = eidx_at(buf, qq, local, l)
                pltpu.make_async_copy(
                    femis_m_hbm.at[p_id, idx],
                    stream_buf.at[sslot, li, qq],
                    stream_sem.at[sslot, li, qq],
                ).start()

    def stream_wait(sslot):
        for li in range(n_stream):
            for qq in range(nseq):
                pltpu.make_async_copy(
                    femis_m_hbm.at[p_id, 0],
                    stream_buf.at[sslot, li, qq],
                    stream_sem.at[sslot, li, qq],
                ).wait()

    sl_dma.wait()

    # per-sequence special transitions from each sequence length
    # (protein_profile_setup closed forms)
    if multi_hits:
        q = 0.5
        log_q = float(np.log(0.5))
        log_1q = float(np.log(0.5))
    else:
        q = 0.0
        log_q = NEG
        log_1q = 0.0

    seq_lens = [seqlen_smem[0, qq] for qq in range(nseq)]
    per_row = nseq // SEQROWS  # sequences per SMEM chunk row
    # positions actually needed: the batch's longest sequence (the
    # length bucket only sizes the eidx transfer; compute stops exactly
    # at the data)
    max_len = seq_lens[0]
    for sl in seq_lens[1:]:
        max_len = jnp.maximum(max_len, sl)
    total_q = (max_len + 4) // 5  # quintets overall

    def specials_of(slen):
        Lf = slen.astype(jnp.float32)
        denom = jnp.log(Lf + 2.0 + q / (1.0 - q))
        nn = jnp.log(Lf) - denom
        nb = jnp.log(2.0 + q / (1.0 - q)) - denom
        rr = jnp.log(Lf) - jnp.log(Lf + 1.0)
        if hmmer3_compat:
            nn = jnp.float32(0.0)
        return nn, nb, rr

    sp_list = [specials_of(s) for s in seq_lens]
    # [NSEQ, 1] column vectors broadcasting against [NSEQ, GROUP]
    t_NN = jnp.stack([s[0] for s in sp_list])[:, None]
    t_NB = jnp.stack([s[1] for s in sp_list])[:, None]
    t_RR = jnp.stack([s[2] for s in sp_list])[:, None]
    t_CC = t_JJ = t_NN
    t_CT = t_JB = t_NB
    t_EJ = jnp.float32(log_q)
    t_EC = jnp.float32(log_1q)
    seq_len_vec = jnp.stack(seq_lens)[:, None]  # [NSEQ, 1] int32

    entry = trans_ref[0, P_ENTRY]
    mm_out = trans_ref[0, P_MM_OUT]
    im_out = trans_ref[0, P_IM_OUT]
    dm_out = trans_ref[0, P_DM_OUT]
    mi = trans_ref[0, P_MI]
    ii = trans_ref[0, P_II]
    a_base = trans_ref[0, P_ABASE]
    cdd = trans_ref[0, P_CDD]

    negk = jnp.full((nseq, group, K), NEG, dtype=jnp.float32)
    negg = jnp.full((nseq, ncols), NEG, dtype=jnp.float32)
    # loop-invariant additive fill masks for lane shifts (one per power
    # of two + the write shift); [1,1,K] broadcasts over seqs/sublanes.
    # Segmented rows mask per segment (lane % segw) so neither the core
    # k->k+1 shift nor the D-chain scan leaks across profile boundaries.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    lane_in_seg = (
        lane if nsegs == 1 else jax.lax.rem(lane, jnp.int32(segw))
    )
    shifts = {1}
    sh = 1
    while sh < segw:
        shifts.add(sh)
        sh *= 2
    negmasks = {
        s: jnp.where(lane_in_seg < s, jnp.float32(NEG), jnp.float32(0.0))
        for s in sorted(shifts)
    }

    # Slotspan mode (``spans`` static): one PROFILE occupies several
    # consecutive sublane slots at lane width K, so the huge-core tail
    # packs at ~its true size instead of one max-core-wide slot per
    # profile (the 0.38-efficiency tail block, docs/PERFORMANCE.md).
    # spans[s] is the span-group id of slot s; slots sharing an id hold
    # consecutive K-node chunks of one profile.  Cross-slot carries:
    #   - the core k->k+1 shift injects lane K-1 of slot s-1 into lane 0
    #     of continuation slot s (M/D advance across the chunk cut);
    #   - the D-chain prefix adds a span-masked Hillis-Steele scan of
    #     per-slot totals over the SUBLANE axis (exact prefix across
    #     chunks);
    #   - VE becomes a span-wide allreduce so every slot of a profile
    #     carries the profile's value and the specials stay replicated.
    # debug ablation of individual span features: ablate="span:a,b"
    # disables the named carries (wrong numerics, HW triage only)
    span_off = (
        set(ablate.split(":", 1)[1].split(","))
        if ablate.startswith("span:") else set()
    )
    if spans is not None:
        assert nsegs == 1, "slotspan and lane segmentation are exclusive"
        spans_np = np.asarray(spans)
        cont_list = [
            s > 0 and spans_np[s] == spans_np[s - 1] for s in range(group)
        ]

        def slot_mask(flags, shape, axis=1):
            """Boolean [*, group, *] mask from a static per-slot flag
            list, composed from iota comparisons (pallas kernels cannot
            capture array constants)."""
            subl = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
            m = None
            for s, f in enumerate(flags):
                if f:
                    eq = subl == s
                    m = eq if m is None else (m | eq)
            if m is None:
                m = subl < 0  # all-false
            return m

        def slot_add(flags, shape):
            """Additive mask: 0.0 on flagged slots, NEG elsewhere."""
            return jnp.where(
                slot_mask(flags, shape), jnp.float32(0.0),
                jnp.float32(NEG),
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, group, K), 2)
        lane0_cont = slot_mask(cont_list, (1, group, K)) & (lane == 0)
        # masks are built at FULL [1, group, K]: a [1, group, 1] mask
        # broadcast-added over lanes mislowers on hardware (silently
        # wrong values, deterministic; interpret exact) — same 1-lane
        # shape class Mosaic refuses to concat on
        cont_add = slot_add(cont_list, (1, group, K))

        def span_ok(sh: int) -> list[bool]:
            return [
                s >= sh and spans_np[s] == spans_np[s - sh]
                for s in range(group)
            ]

        # All span ops run on STANDARD shapes — full [nseq, group, K]
        # sublane rolls or 2D [nseq, group] lane rolls.  The first cut
        # used [nseq, group, 1] slot vectors; Mosaic refuses sublane
        # CONCAT on those ("offset mismatch on non-concat dimension")
        # and silently MISLOWERS sublane rolls on them (hardware-only
        # wrong scores, varying across runs — interpret was exact).

        def span_shifted_full(x, sh: int):
            """[nseq, group, K]: slot s receives slot s-sh's row, NEG
            where s-sh is outside the slot's span (span_ok also kills
            the rotate wrap, since s >= sh is part of it)."""
            rolled = pltpu.roll(x, shift=sh, axis=1)
            return rolled + slot_add(span_ok(sh), (1, group, K))

        def carry_prev_last_lane(x):
            """[nseq, group, K]: every lane gets slot s-1's lane K-1
            (the cross-chunk boundary value); callers mask to lane 0 of
            continuation slots.  The lane roll by 1 makes lane 0 hold
            old lane K-1 (wrap is exactly the boundary value); the
            following max-broadcast is unnecessary since callers select
            lane 0 only."""
            return pltpu.roll(
                pltpu.roll(x, shift=1, axis=1), shift=1, axis=2
            )

        def span_prefix_excl(a):
            """Exclusive within-span semiring scan of per-slot lane
            totals, broadcast on lanes: [nseq, group, K] -> same shape;
            NEG at span starts."""
            tot = jnp.broadcast_to(
                reduce_k(a)[:, :, None], (nseq, group, K)
            )
            x = tot
            sh = 1
            while sh < group:
                x = join(x, span_shifted_full(x, sh))
                sh *= 2
            # exclusive: previous slots only (cont_add NEGs span starts
            # and the span_ok mask in the roll killed the wrap)
            return pltpu.roll(x, shift=1, axis=1) + cont_add

        def lane_add(flags):
            """[1, group] additive mask over the 2D lane axis."""
            li = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)
            m = None
            for s, f in enumerate(flags):
                if f:
                    eq = li == s
                    m = eq if m is None else (m | eq)
            if m is None:
                m = li < 0
            return jnp.where(m, jnp.float32(0.0), jnp.float32(NEG))

        def span_allreduce(x):
            """[nseq, group] (slots on LANES in 2D layout): replace each
            slot with its span's total.

            Composed as exclusive-prefix + self + exclusive-suffix so
            every slot is counted exactly once — a bidirectional
            butterfly would overlap windows and double-count under the
            logsumexp semiring (max would hide it)."""
            pre, suf = x, x
            sh = 1
            while sh < group:
                ok = span_ok(sh)
                ok_up = [
                    s + sh < group and ok[s + sh] for s in range(group)
                ]
                pre = join(
                    pre,
                    pltpu.roll(pre, shift=sh, axis=1) + lane_add(ok),
                )
                suf = join(
                    suf,
                    pltpu.roll(suf, shift=group - sh, axis=1)
                    + lane_add(ok_up),
                )
                sh *= 2
            up_cont = [
                s + 1 < group and spans_np[s + 1] == spans_np[s]
                for s in range(group)
            ]
            return join(
                x,
                join(
                    pltpu.roll(pre, shift=1, axis=1)
                    + lane_add(cont_list),
                    pltpu.roll(suf, shift=group - 1, axis=1)
                    + lane_add(up_cont),
                ),
            )

    def seg_bcast(x):
        """Compact per-profile [..., ncols] -> lanes [..., group, segw]
        per segment, concatenated to [..., group, K].  Accepts leading
        batch dims so callers can bridge SEVERAL compact rows in one
        relayout+broadcast chain (the per-row chain has a large fixed
        cost; the position loop batches the 5 lookback insert rows)."""
        lead = x.shape[:-1]
        nd = x.ndim
        if nsegs == 1:
            return jnp.broadcast_to(x[..., None], lead + (group, K))
        return jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.expand_dims(
                        jax.lax.slice_in_dim(
                            x, s * group, (s + 1) * group, axis=nd - 1
                        ),
                        -1,
                    ),
                    lead + (group, segw),
                )
                for s in range(nsegs)
            ],
            axis=-1,
        )

    def seg_reduce(x):
        """Lanes [nseq, group, K] -> compact [nseq, ncols] per-segment
        lane reduction."""
        if nsegs == 1:
            return reduce_k(x)
        return jnp.concatenate(
            [
                reduce_k(
                    jax.lax.slice_in_dim(
                        x, s * segw, (s + 1) * segw, axis=2
                    )
                )
                for s in range(nsegs)
            ],
            axis=-1,
        )

    for slot in range(5):
        ring_cs[slot] = negk
        ring_ic[slot] = negk
        ring_s[slot] = jnp.full((8, nseq, ncols), NEG, dtype=jnp.float32)
    # the B->M entry term is folded into ring_cs at write time; seed the
    # virtual position-0 slot with S->B->entry (VB[0] = t_NB; t_NB is
    # per-sequence, identical across profiles/segments).  Mosaic can't
    # reshape [nseq,1]->[nseq,1,1]; go through [nseq,GROUP] first.
    vb0 = jnp.broadcast_to(t_NB, (nseq, group))
    ring_cs[0] = vb0[:, :, None] + entry
    out_acc[0] = negg
    out_acc[1] = negg

    # specials row ids inside ring_s
    S_B, S_N, S_J, S_C, S_E, S_R = range(6)

    def position(i, j, buf, local, npos):
        """One DP position for all NSEQ sequences; j = i mod 5 is
        compile-time so every ring access uses a static slot.  ``i`` is
        a dynamic scalar; ``local`` is the row within the SMEM chunk
        buffer ``buf``; ``npos`` is the number of positions computed in
        this chunk (bounds the stream prefetch)."""
        if n_stream:
            # jnp.int32 casts keep the x64-mode weak int64 out of rem
            sslot = jax.lax.rem(jnp.int32(local), jnp.int32(2))
            stream_wait(sslot)
            nxt = local + 1

            @pl.when(nxt < npos)
            def _():
                stream_issue(buf, nxt, jax.lax.rem(jnp.int32(nxt), jnp.int32(2)))

        accM = accI = accN = accJ = accC = accR = None
        # one gather per (seq, lookback) serves insert + null emissions;
        # gathered up front so ONE batched seg_bcast bridges all 5
        # insert rows to lanes (per-l bridges were 5 relayout+broadcast
        # chains per position — a fixed cost that dominated at small K)
        lookback_idxs = [
            [eidx_at(buf, qq, local, l) for qq in range(nseq)]
            for l in range(1, 6)
        ]
        if ablate in ("emis_in", "emis"):
            # ABLATION ONLY: static row replaces the per-seq gathers —
            # wrong numerics; bounds what cheaper insert/null emission
            # lookups could recover (benchmarks/dchain_ablation.py)
            em_in_rows = [
                jnp.broadcast_to(
                    femis_in_ref[0, 0][None], (nseq, 2, ncols)
                )
            ] * 5
        else:
            em_in_rows = [
                jnp.stack([femis_in_ref[0, idx] for idx in idxs])
                for idxs in lookback_idxs
            ]  # each [nseq, 2, ncols]
        em_i_lanes = seg_bcast(
            jnp.stack([r[:, 0] for r in em_in_rows])
        )  # [5, nseq, group, K]
        for l in range(1, 6):
            slot = (j - l) % 5
            idxs = lookback_idxs[l - 1]
            if ablate in ("emis_m", "emis"):
                # ABLATION ONLY: static row, wrong numerics — bounds the
                # per-seq match-row gather cost
                em_m = jnp.broadcast_to(
                    femis_m[0][None], (nseq, group, K)
                )
            elif n_stream and l > 5 - n_stream:
                # streamed length: rows were DMA'd seq-stacked already
                em_m = stream_buf[sslot, l - (6 - n_stream)]
            elif n_stream:
                # the -inf sentinel row (never decisive: invalid
                # lookbacks are already NEG through the rings and
                # start gates) lies outside the resident slice —
                # clamp the match gather to stay in bounds
                em_m = jnp.stack(
                    [femis_m[jnp.minimum(idx, nres - 1)] for idx in idxs]
                )
            else:
                em_m = jnp.stack([femis_m[idx] for idx in idxs])

            def acc(prev, cand):
                # first lookback step assigns; later steps join-accumulate
                return cand if prev is None else join(prev, cand)

            # ring_cs already holds join(core in-flow, B + entry)
            accM = acc(accM, ring_cs[slot] + em_m)
            accI = acc(accI, ring_ic[slot] + em_i_lanes[l - 1])

        # Specials batched over the lookback axis: the per-l form was
        # ~80 sub-tile [nseq, ncols] ops per position (pure fixed cost —
        # the 21%-of-time "insert/null path" in the small-K ablation);
        # stacking the 5 ring_s slots and null rows runs the same math
        # as ~16 ops at 5x payload + 4 leading-axis reduces.
        sp5 = jnp.stack(
            [ring_s[(j - l) % 5] for l in range(1, 6)]
        )  # [5, 8, nseq, ncols]
        en5 = jnp.stack(
            [em_in_rows[l - 1][:, 1] for l in range(1, 6)]
        )  # [5, nseq, ncols]
        # start gate per lookback: position i-l == 0  ->  l == i
        li = jax.lax.broadcasted_iota(jnp.int32, (5, 1, 1), 0) + 1
        start5 = jnp.where(li == i, 0.0, NEG)

        if semiring == "max":
            def red5(x):
                return jnp.max(x, axis=0)
        else:
            def red5(x):
                m = jnp.max(x, axis=0)
                # entries are finite (NEG, not -inf): x - m <= 0 always
                return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=0))

        accN = red5(join(sp5[:, S_N], start5) + t_NN + en5)
        accJ = red5(
            join(sp5[:, S_E] + t_EJ, sp5[:, S_J]) + t_JJ + en5
        )
        accC = red5(
            join(sp5[:, S_E] + t_EC, sp5[:, S_C]) + t_CC + en5
        )
        accR = red5(join(sp5[:, S_R] + t_RR, start5) + en5)

        # mute D-chain: VD = cdd + cumjoin(VM + a_base) shifted one lane
        if dchain == "off":
            # ABLATION ONLY (benchmarks/dchain_ablation.py): wrong
            # numerics — times the kernel with the prefix scan elided to
            # bound what any D-chain optimization could ever recover
            VD = negk
        else:
            a = accM + a_base
            b = _cummax_lanes(a, segw, negmasks, join)
            if spans is not None and "prefix" not in span_off:
                # exact prefix across slot chunks: per-slot totals run a
                # span-masked sublane scan; the exclusive carry joins
                # into every lane of continuation slots
                b = join(b, span_prefix_excl(a))
            b_sh = _shift_lanes(b, 1, negmasks[1])
            if spans is not None and "dcarry" not in span_off:
                b_sh = jnp.where(
                    lane0_cont, carry_prev_last_lane(b), b_sh
                )
            VD = jnp.maximum(  # numeric clamp, not a semiring op
                cdd + b_sh, NEG
            )

        VE = seg_reduce(join(accM, VD))  # [NSEQ, ncols]
        if spans is not None and "vered" not in span_off:
            # every slot of a profile carries the profile's E value so
            # the specials (and final scores) stay slot-replicated
            VE = span_allreduce(VE)
        VB = join(
            accN + t_NB,
            join(VE + t_EJ + t_JB, accJ + t_JB),
        )
        VT = join(VE + t_EC + t_CT, accC + t_CT)

        hit_end = i == seq_len_vec  # [NSEQ, 1]
        out_acc[0] = jnp.where(hit_end, VT, out_acc[0])
        out_acc[1] = jnp.where(hit_end, accR, out_acc[1])

        core = join(
            accM + mm_out,
            join(accI + im_out, VD + dm_out),
        )
        core_sh = _shift_lanes(core, 1, negmasks[1])
        if spans is not None and "ccarry" not in span_off:
            core_sh = jnp.where(
                lane0_cont, carry_prev_last_lane(core), core_sh
            )
        ring_cs[j] = join(
            core_sh,
            seg_bcast(VB) + entry,
        )
        ring_ic[j] = join(accM + mi, accI + ii)
        # ordering matches the S_B..S_R row ids
        ring_s[j] = jnp.stack(
            [VB, accN, accJ, accC, VE, accR, negg, negg], axis=0
        )

    def chunk(c, _):
        buf = jax.lax.rem(jnp.int32(c), jnp.int32(2))
        eidx_dma(c, buf).wait()

        @pl.when(c + 1 < nch)
        def _():
            eidx_dma(c + 1, jax.lax.rem(jnp.int32(c + 1), jnp.int32(2))).start()

        # partial last chunk: stop at the batch's longest sequence
        q_hi = jnp.clip(total_q - c * (CPOS // 5), 0, CPOS // 5)
        npos = q_hi * 5

        if n_stream:
            # prime the stream pipeline for this chunk's first position
            # (later positions are prefetched one position ahead)
            @pl.when(npos > 0)
            def _():
                stream_issue(buf, 0, 0)

        def quintet(qi, _):
            base = c * CPOS + qi * 5
            for jj in range(5):
                # 255 = 0 mod 5, so ring slot ids stay compile-time
                position(
                    base + jj + 1, (jj + 1) % 5, buf, qi * 5 + jj, npos
                )
            return ()

        jax.lax.fori_loop(0, q_hi, quintet, (), unroll=False)
        return ()

    # positions beyond L are harmless: their emissions read zero-filled
    # eidx (a real fragment index) but outputs are only captured at
    # i == seq_len <= L
    jax.lax.fori_loop(0, nch, chunk, (), unroll=False)

    alt_ref[0, s_id] = out_acc[0]
    null_ref[0, s_id] = out_acc[1]


def _pad_dims(B: int, K: int, group: int = GROUP, nsegs: int = 1):
    """(Kp, Bp, P): lane-tile-padded PER-PROFILE width and slot-padded
    profile count.

    The kernel's lane axis (nsegs * Kp) is the minormost dim of the
    HBM->VMEM DMA blocks, so it must be a whole number of 128-lane tiles
    on real hardware.  Unsegmented rows round the profile width itself;
    segmented rows require the caller to pick (Kp, nsegs) whose product
    is already lane-aligned (db/partition.py's tier table does)."""
    if nsegs == 1:
        Kp = max(128, ((K + 127) // 128) * 128)
    else:
        # smallest per-profile width >= K whose nsegs-wide row is a
        # whole number of 128-lane tiles
        import math

        step = 128 // math.gcd(nsegs, 128)
        Kp = ((K + step - 1) // step) * step
    slots = group * nsegs
    Bp = ((B + slots - 1) // slots) * slots
    return Kp, Bp, Bp // slots


def _assemble_cols(a: np.ndarray, P: int, nsegs: int, group: int):
    """Per-profile [Bp, *t] -> [P, *t, nsegs*group] compact columns
    (lane index s*group + g, matching the kernel's per-profile arrays)."""
    t = a.shape[1:]
    nt = len(t)
    a = a.reshape((P, nsegs, group) + t)
    perm = (0,) + tuple(3 + i for i in range(nt)) + (1, 2)
    return a.transpose(perm).reshape((P,) + t + (nsegs * group,)).copy()


def _pack_trans(getarr, Bp: int, Kp: int, group: int = GROUP,
                nsegs: int = 1):
    """[P, NPLANES, group, nsegs*Kp] transition planes from [Bp, Kp]
    per-profile vectors supplied by ``getarr(name)`` (already profile-
    and core-padded).  The D-chain prefix sums (cdd) are computed per
    profile, so segmentation keeps them segment-local by construction."""
    P = Bp // (group * nsegs)
    dd = getarr("dd_in")
    # Dead DD links clamp to a MODERATE floor, not ~NEG: the telescoped
    # D-chain (VD = cdd + cummax(VM + md - cdd)) relies on cdd
    # cancellation, and a -1e24-scale link turns every post-link term
    # into a +-1e24 pair whose f32 rounding can swallow the real scores
    # entirely.  At -1e4 a single dead link still outweighs any real
    # path by thousands of nats while cumsums stay in f32's exact-add
    # range; k dead links cost ~k*1e4 — astronomically dead either way.
    # (Numerical-robustness hardening; NOT the cause of the open
    # group-8 hardware deviation documented in docs/PERFORMANCE.md.)
    dd_safe = np.maximum(dd, -1e4)
    dd_safe[:, 0] = 0.0
    cdd = np.cumsum(dd_safe, axis=1, dtype=np.float64).astype(np.float32)
    md = getarr("md_in")
    md_next = np.concatenate(
        [md[:, 1:], np.full((Bp, 1), NEG, np.float32)], axis=1
    )
    cdd_next = np.concatenate([cdd[:, 1:], cdd[:, -1:]], axis=1)
    a_base = np.maximum(md_next - cdd_next, NEG)

    def out_of(name):
        # destination-indexed trans[k] (from node k-1) -> source-indexed
        a = getarr(name)
        return np.concatenate(
            [a[:, 1:], np.full((Bp, 1), NEG, np.float32)], axis=1
        )

    planes = np.stack(
        [
            getarr("entry"), out_of("mm_in"), out_of("im_in"),
            out_of("dm_in"), getarr("mi"), getarr("ii"), a_base, cdd,
        ],
        axis=1,
    )  # [Bp, NPLANES, Kp]
    # [Bp, NPLANES, Kp] -> [P, NPLANES, group, nsegs*Kp]
    return (
        planes.reshape(P, nsegs, group, NPLANES, Kp)
        .transpose(0, 3, 2, 1, 4)
        .reshape(P, NPLANES, group, nsegs * Kp)
        .copy()
    )


def pack_block(block: ProfileBlock, group: int = GROUP, nsegs: int = 1):
    """Host-side packing of a ProfileBlock into kernel layout.

    Returns (femis_m [P,NTAB,group,nsegs*K], femis_in
    [P,NTAB,2,nsegs*group] (insert + null tables), trans
    [P,NPLANES,group,nsegs*K], B) with the profile axis padded to
    group*nsegs slot multiples.  ``nsegs > 1`` packs nsegs profiles per
    sublane row, each in its own K-lane segment.
    """
    fm = np.asarray(block.fm, np.float32)
    fi = np.asarray(block.fi, np.float32)
    fn = np.asarray(block.fn, np.float32)
    B, K, ntab = fm.shape  # ntab: NTAB base-4, taller for IUPAC tables
    Kp, Bp, P = _pad_dims(B, K, group, nsegs)
    if Kp != K:
        fm = np.concatenate(
            [fm, np.full((B, Kp - K, ntab), NEG, np.float32)], axis=1
        )

    def padB(a):
        if a.shape[0] == Bp:
            return a
        pad = np.full((Bp - a.shape[0],) + a.shape[1:], NEG, a.dtype)
        return np.concatenate([a, pad], axis=0)

    def padK(a):
        # pad a [B, K] per-node vector out to [B, Kp]
        if a.shape[1] == Kp:
            return a
        return np.concatenate(
            [a, np.full((a.shape[0], Kp - a.shape[1]), NEG, a.dtype)],
            axis=1,
        )

    femis_m = (
        padB(fm).reshape(P, nsegs, group, Kp, ntab)
        .transpose(0, 4, 2, 1, 3)
        .reshape(P, ntab, group, nsegs * Kp)
        .copy()
    )
    femis_in = _assemble_cols(
        np.stack([padB(fi), padB(fn)], axis=1), P, nsegs, group
    )  # [P, 2, NTAB, nsegs*group] -> want [P, NTAB, 2, nsegs*group]
    femis_in = femis_in.transpose(0, 2, 1, 3).copy()

    def arrK(name):
        return padK(padB(np.asarray(getattr(block, name), np.float32)))

    trans = _pack_trans(arrK, Bp, Kp, group, nsegs)
    return femis_m, femis_in, trans, B


def pack_block_compact(profiles, kpad: int | None = None,
                       group: int = GROUP, nsegs: int = 1):
    """Host side of the DEVICE-SYNTHESIS packing: compact per-node
    emission inputs instead of full fragment tables.

    Ships exp(codon marginal) [Bp, Kp, 125] + background q [Bp, Kp, 5]
    (plus the insert/null pairs) — ~10.5x smaller than the NTAB-wide
    tables — and lets ops/tables.synth_fragment_tables build the tables
    on device as MXU one-hot matmuls.  Replaces the host dgemm that imm
    runs per frame state at press time (reference
    src/model/protein_model.c:247-254).

    Returns (margp, qp, inm, inq, trans, B, eps).
    """
    B = len(profiles)
    K = max(p.core_size for p in profiles)
    if kpad is not None:
        assert kpad >= K
        K = kpad
    Kp, Bp, P = _pad_dims(B, K, group, nsegs)
    margp = np.zeros((Bp, Kp, 125), np.float32)
    qp = np.zeros((Bp, Kp, 5), np.float32)
    inm = np.zeros((Bp, 2, 125), np.float32)
    inq = np.zeros((Bp, 2, 5), np.float32)
    arrs = {
        name: np.full((Bp, Kp), NEG, np.float32)
        for name in (
            "entry", "mm_in", "im_in", "dm_in", "md_in", "dd_in", "mi", "ii"
        )
    }
    for b, p in enumerate(profiles):
        k = p.core_size
        # zero probabilities on padding nodes -> log 0 -> NEG on device,
        # matching the host path's NEG fill
        margp[b, :k] = np.exp(p.match_marg)
        qp[b, :k] = np.exp(p.match_q)
        inm[b, 0] = np.exp(p.insert_marg)
        inq[b, 0] = np.exp(p.insert_q)
        inm[b, 1] = np.exp(p.null_marg)
        inq[b, 1] = np.exp(p.null_q)
        for name, arr in arrs.items():
            arr[b, :k] = np.maximum(
                np.asarray(getattr(p, name), np.float64), NEG
            )
    trans = _pack_trans(lambda n: arrs[n], Bp, Kp, group, nsegs)
    eps = float(profiles[0].cfg.epsilon)
    return margp, qp, inm, inq, trans, B, eps


def plan_spans(core_sizes, W: int, group: int = 8):
    """Greedy slotspan layout for huge-core profiles: sorted descending,
    each profile takes ceil(core/W) CONSECUTIVE slots (never crossing a
    row boundary); rows hold ``group`` slots.

    Returns a list of rows; each row is a list of (profile_pos, chunk,
    nchunks) per occupied slot, where profile_pos indexes core_sizes.
    """
    core_sizes = np.asarray(core_sizes)
    order = sorted(range(len(core_sizes)), key=lambda i: -core_sizes[i])
    rows: list[list[tuple[int, int, int]]] = []
    cur: list[tuple[int, int, int]] = []
    for i in order:
        span = max(1, -(-int(core_sizes[i]) // W))
        if span > group:
            raise ValueError(
                f"core {core_sizes[i]} needs {span} > {group} slots at "
                f"W={W}"
            )
        if len(cur) + span > group:
            rows.append(cur)
            cur = []
        cur.extend((i, c, span) for c in range(span))
    if cur:
        rows.append(cur)
    return rows


def pack_span_row(profiles, row, W: int, group: int = 8):
    """Device-synthesis packing of ONE slotspan row (plan_spans entry).

    Each slot holds a W-node CHUNK of its profile; transition planes are
    derived at full profile length (so the D-chain cumsum and the
    dest->src shifts stay continuous across chunk cuts) and then sliced
    into slots.  Returns (femis_m [1,ntab,group,W], femis_in
    [1,ntab,2,group], trans [1,NPLANES,group,W], spans, col_sel,
    profile_ids) — spans/col_sel are the kernel's static layout tuples.
    """
    from deciphon_tpu.ops.tables import synth_fragment_tables

    names = ("entry", "mm_in", "im_in", "dm_in", "md_in", "dd_in",
             "mi", "ii")
    margp = np.zeros((group, W, 125), np.float32)
    qp = np.zeros((group, W, 5), np.float32)
    inm = np.zeros((group, 2, 125), np.float32)
    inq = np.zeros((group, 2, 5), np.float32)
    trans = np.full((NPLANES, group, W), NEG, np.float32)
    spans = []
    col_sel = []
    profile_ids = []
    eps = float(profiles[row[0][0]].cfg.epsilon)
    sid = 0
    per_profile_planes: dict[int, np.ndarray] = {}
    for s, (pi, c, span) in enumerate(row):
        if c == 0:
            spans.append(sid)
            sid += 1
            col_sel.append(s)
            profile_ids.append(pi)
        else:
            spans.append(spans[-1])
        p = profiles[pi]
        k = p.core_size
        Kfull = span * W
        if pi not in per_profile_planes:
            arrs = {
                n: np.full((1, Kfull), NEG, np.float32) for n in names
            }
            for n in names:
                arrs[n][0, :k] = np.maximum(
                    np.asarray(getattr(p, n), np.float64), NEG
                )
            per_profile_planes[pi] = _pack_trans(
                lambda n: arrs[n], 1, Kfull, group=1, nsegs=1
            )[0]  # [NPLANES, 1, Kfull]
        trans[:, s, :] = per_profile_planes[pi][:, 0, c * W : (c + 1) * W]
        lo, hi = c * W, min(k, (c + 1) * W)
        if hi > lo:
            margp[s, : hi - lo] = np.exp(p.match_marg[lo:hi])
            qp[s, : hi - lo] = np.exp(p.match_q[lo:hi])
        inm[s, 0] = np.exp(p.insert_marg)
        inq[s, 0] = np.exp(p.insert_q)
        inm[s, 1] = np.exp(p.null_marg)
        inq[s, 1] = np.exp(p.null_q)
    # pad unused slots with unique span ids (no continuation carries)
    while len(spans) < group:
        spans.append(sid)
        sid += 1
    fm = synth_fragment_tables(
        jnp.asarray(margp.reshape(-1, 125)),
        jnp.asarray(qp.reshape(-1, 5)), eps=eps,
    )  # [group*W, NTAB]
    femis_m = jnp.transpose(
        fm.reshape(1, group, W, NTAB), (0, 3, 1, 2)
    )  # [1, NTAB, group, W]
    fin = synth_fragment_tables(
        jnp.asarray(inm.reshape(-1, 125)),
        jnp.asarray(inq.reshape(-1, 5)), eps=eps,
    )
    femis_in = jnp.transpose(
        fin.reshape(1, group, 2, NTAB), (0, 3, 2, 1)
    )  # [1, NTAB, 2, group]
    return (
        femis_m, femis_in, jnp.asarray(trans[None]),
        tuple(spans), tuple(col_sel), profile_ids,
    )


def run_block_raw(
    femis_m, femis_in, trans, seqinfo, seqlens,
    *, K: int, P: int, nseq: int,
    multi_hits: bool, hmmer3_compat: bool, interpret: bool,
    n_stream: int = 0, semiring: str = "max", group: int = GROUP,
    dchain: str = "scan", nsegs: int = 1, nres: int | None = None,
    ablate: str = "none", spans: tuple | None = None,
):
    """Unjitted kernel launch: trace-composable so callers can fuse
    multiple launches into one jitted dispatch if they choose.

    The fragment-table height is taken from the inputs (base-4 tables
    are NTAB rows; extended IUPAC tables are taller); ``nres`` is the
    VMEM-resident row count under streaming (defaults to the base-4
    length-1..3 prefix NRES_B — extended-table callers pass their own).
    """
    SG, nch = seqinfo.shape[0], seqinfo.shape[1]
    ntab = femis_in.shape[1]
    kernel = functools.partial(
        _kernel, K=K, nseq=nseq, nch=nch,
        multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
        n_stream=n_stream, semiring=semiring, group=group,
        dchain=dchain, nsegs=nsegs, ablate=ablate, spans=spans,
    )
    grid = (P, SG)
    if n_stream == 0:
        nres = ntab
    elif nres is None:
        nres = NRES_B
    ncols = nsegs * group
    stream_scratch = (
        [
            pltpu.VMEM((2, n_stream, nseq, group, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_stream, nseq)),
        ]
        if n_stream
        else []
    )
    out_shape = [
        jax.ShapeDtypeStruct((P, SG, nseq, ncols), jnp.float32),
        jax.ShapeDtypeStruct((P, SG, nseq, ncols), jnp.float32),
    ]
    alt, null = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # seqinfo -> SMEM DMA
            pl.BlockSpec(memory_space=pltpu.HBM),  # seqlens -> SMEM DMA
            pl.BlockSpec(memory_space=pltpu.HBM),  # femis_m -> VMEM DMA
            pl.BlockSpec(
                (1, ntab, 2, ncols), lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NPLANES, group, K), lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SG, nseq, ncols), lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SG, nseq, ncols), lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((nres, group, K), jnp.float32),
            pltpu.VMEM((5, nseq, group, K), jnp.float32),
            pltpu.VMEM((5, nseq, group, K), jnp.float32),
            pltpu.VMEM((5, 8, nseq, ncols), jnp.float32),
            pltpu.VMEM((2, nseq, ncols), jnp.float32),
            pltpu.SMEM((2, SEQROWS, nseq * WC // SEQROWS), jnp.int32),
            pltpu.SMEM((SEQROWS, SLPAD), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ]
        + stream_scratch,
        # the fragment table + DP rings exceed Mosaic's default 16 MiB
        # scoped-vmem budget once NSEQ*K grows; v5e/v5p have 128 MiB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seqinfo, seqlens, femis_m, femis_in, trans)
    return alt, null


_run = functools.partial(
    jax.jit,
    static_argnames=(
        "multi_hits", "hmmer3_compat", "interpret", "K", "P", "nseq",
        "n_stream", "semiring", "group", "dchain", "nsegs", "nres",
        "ablate", "spans",
    ),
)(run_block_raw)


def run_scores_raw(
    femis_m, femis_in, trans, seqinfo, seqlens,
    *, K: int, P: int, nseq: int, nprofiles: int,
    multi_hits: bool, hmmer3_compat: bool, interpret: bool,
    n_stream: int = 0, semiring: str = "max", group: int = GROUP,
    dchain: str = "scan", nsegs: int = 1, nres: int | None = None,
    ablate: str = "none", spans: tuple | None = None,
    col_sel: tuple | None = None,
):
    """Kernel + output epilogue in ONE traceable function.

    The epilogue (transpose [P,SG,nseq,ncols] -> [rows, profiles],
    profile-column trim) used to run as 3 eager ops per output — each a
    separate dispatch, which over a remote-execution relay cost more
    wall time per scan than the kernels themselves once the block count
    grew.  Fused under one jit, each block is exactly one dispatch.

    The SEQUENCE-row trim ([:nseqs]) deliberately stays OUT of the jit:
    rows only vary with batch size, and keeping them out means a 173-
    read batch reuses the 192-read executable instead of recompiling
    the whole kernel for a different static slice bound.  Padding rows
    belong to length-0 sequences whose scores stay exactly NEG, so the
    LRT gate can never select them.
    """
    alt, null = run_block_raw(
        femis_m, femis_in, trans, seqinfo, seqlens,
        K=K, P=P, nseq=nseq,
        multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
        interpret=interpret, n_stream=n_stream, semiring=semiring,
        group=group, dchain=dchain, nsegs=nsegs, nres=nres,
        ablate=ablate, spans=spans,
    )
    SG = alt.shape[1]
    ncols = nsegs * group

    def epi(x):
        flat = jnp.transpose(x, (1, 2, 0, 3)).reshape(
            SG * nseq, P * ncols
        )
        if col_sel is not None:
            # slotspan rows: a profile's score is replicated across its
            # slots; take each profile's first-slot column
            return flat[:, np.asarray(col_sel)]
        return flat[:, :nprofiles]

    return epi(alt), epi(null)


_run_scores = functools.partial(
    jax.jit,
    static_argnames=(
        "multi_hits", "hmmer3_compat", "interpret", "K", "P", "nseq",
        "nprofiles", "n_stream", "semiring", "group", "dchain", "nsegs",
        "nres", "ablate", "spans", "col_sel",
    ),
)(run_scores_raw)


class BlockMeta(typing.NamedTuple):
    """Static per-block kernel parameters for the fused scan dispatch.
    ``seq_slot`` indexes which packed sequence tier (by nseq stack) this
    block consumes."""

    K: int
    P: int
    nseq: int
    nprofiles: int
    n_stream: int
    group: int
    nsegs: int
    nres: int
    seq_slot: int
    spans: tuple | None = None  # slotspan layout (see plan_spans)
    col_sel: tuple | None = None  # profile first-slot columns


def fused_scores_raw(
    tensors, seqinfos, seqlens,
    *, metas: tuple, multi_hits: bool, hmmer3_compat: bool,
    interpret: bool, semiring: str = "max", dchain: str = "scan",
):
    """Every block's kernel + epilogue in ONE traced function — one
    device dispatch per scan instead of one per block.

    Over a remote-execution relay each dispatch costs a host round trip
    and the device idles between kernels; with ~9 blocks per Pfam-shaped
    DB those gaps dominated the warm scan.  Fusing lets the device run
    block after block back-to-back.  The price is a monolithic compile
    keyed on the whole block mix (``metas`` is static) — acceptable
    because a pressed DB's block mix is fixed, the persistent cache
    (utils/jaxcache.py) makes it one-time per machine, and the relay
    serializes per-module compiles anyway so N small compiles cost about
    the same wall time as one big one.

    ``tensors``: [(femis_m, femis_in, trans)] per block;
    ``seqinfos``/``seqlens``: packed sequence tiers, indexed by each
    meta's ``seq_slot``.  Returns ONE (alt, null) pair: every block's
    [rows, nprofiles] matrix concatenated along the profile axis in
    input order (columns split by the metas' nprofiles).  Concatenating
    ON DEVICE matters as much as fusing the kernels: per-block outputs
    meant 2×nblocks host pulls serialized after the program finished —
    ~90 ms relay latency each, which cost more than the compute
    (measured 1.48 s vs 0.61 s warm scan).  Rows are NOT trimmed to the
    true batch (see run_scores_raw); blocks whose sequence tier rounds
    to fewer rows pad with NEG.
    """
    if len(tensors) != len(metas):
        raise ValueError(
            f"{len(tensors)} tensor triples vs {len(metas)} metas"
        )
    outs = []
    for (fm, fin, tr), m in zip(tensors, metas, strict=True):
        outs.append(
            run_scores_raw(
                fm, fin, tr, seqinfos[m.seq_slot], seqlens[m.seq_slot],
                K=m.K, P=m.P, nseq=m.nseq, nprofiles=m.nprofiles,
                multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
                interpret=interpret, n_stream=m.n_stream,
                semiring=semiring, group=m.group, dchain=dchain,
                nsegs=m.nsegs, nres=m.nres,
                spans=m.spans, col_sel=m.col_sel,
            )
        )
    rows = max(a.shape[0] for a, _ in outs)

    def padrows(x):
        if x.shape[0] == rows:
            return x
        return jnp.pad(
            x, ((0, rows - x.shape[0]), (0, 0)), constant_values=NEG
        )

    alt = jnp.concatenate([padrows(a) for a, _ in outs], axis=1)
    null = jnp.concatenate([padrows(n) for _, n in outs], axis=1)
    return alt, null


fused_scores = functools.partial(
    jax.jit,
    static_argnames=(
        "metas", "multi_hits", "hmmer3_compat", "interpret", "semiring",
        "dchain",
    ),
)(fused_scores_raw)


def pick_nseq(nseqs: int, cap: int = NSEQ) -> int:
    """Smallest supported per-instance sequence stack >= the batch (bigger
    stacks amortize the cross-lane roll fixed cost; measured on v5e:
    8->37, 16->43, 32->46.5 GCUPS — but padding a 2-seq batch to 32 would
    waste 16x).  SMEM chunking makes the stack independent of read
    length."""
    n = 8
    while n < min(nseqs, cap):
        n *= 2
    return n


def make_seqinfo(
    eidx: np.ndarray, seq_len: np.ndarray, nseq: int = 0,
    sg_multiple: int = 1,
):
    """Pack [S, L, 5] end-fragment indices into the kernel's chunked
    [SG, nchunks, nseq*WC] layout plus a [SG, nseq] length array.
    Returns (seqinfo, seqlens, S).

    ``sg_multiple`` pads the sequence-group axis to a multiple (so SG
    shards evenly over a mesh 'seqs' axis); padding groups hold length-0
    sequences that never capture output."""
    eidx = np.asarray(eidx, np.int32)
    S, L, five = eidx.shape
    assert five == 5
    if not nseq:
        nseq = pick_nseq(S)
    nch = max(1, (L + CPOS - 1) // CPOS)
    Sp = ((S + nseq - 1) // nseq) * nseq
    SG = Sp // nseq
    SG = (SG + sg_multiple - 1) // sg_multiple * sg_multiple
    seqinfo = np.zeros((SG, nch, nseq, WC), np.int32)
    seqlens = np.zeros((SG, SEQROWS, SLPAD), np.int32)
    rows = np.zeros((S, nch * CPOS, 5), np.int32)
    rows[:, :L] = eidx
    lens = np.asarray(seq_len, np.int32)
    for s in range(S):
        seqinfo[s // nseq, :, s % nseq, : CPOS * 5] = rows[s].reshape(
            nch, CPOS * 5
        )
        seqlens[s // nseq, 0, s % nseq] = lens[s]
    # padding sequences: seq_len 0 never captures output
    return (
        seqinfo.reshape(SG, nch, SEQROWS, nseq * WC // SEQROWS),
        seqlens,
        S,
    )


class PallasBlock:
    """A profile block packed + resident on device for repeated scans.

    ``n_stream`` picks the residency regime (None = by kpad: regime A for
    kpad <= RESIDENT_MAX_KPAD, else regime B streaming lengths 4-5).
    ``group`` is the sublane row width (16 default; 8 halves the padding
    cost of huge-core rows).  ``nsegs`` packs that many profiles per
    sublane along the lane axis (segmented rows for small cores)."""

    def __init__(self, block: ProfileBlock, n_stream: int | None = None,
                 group: int = GROUP, nsegs: int = 1,
                 nres: int | None = None):
        femis_m, femis_in, trans, B = pack_block(block, group, nsegs)
        self._init(
            jnp.asarray(femis_m), jnp.asarray(femis_in),
            jnp.asarray(trans), B, group, n_stream, nsegs, nres,
        )

    def _init(self, femis_m, femis_in, trans, B, group, n_stream, nsegs=1,
              nres=None, spans=None, col_sel=None):
        self.femis_m = femis_m
        self.femis_in = femis_in
        self.trans = trans
        self.nprofiles = B
        self.group = group
        self.nsegs = nsegs
        self.spans = spans
        self.col_sel = col_sel
        self.kpad = femis_m.shape[-1]  # kernel lane width (nsegs * segw)
        self.segw = self.kpad // nsegs  # per-profile padded width
        self.ngroups = femis_m.shape[0]
        self.ntab = femis_m.shape[1]
        if n_stream is None:
            n_stream = (
                0 if resident_ok(self.kpad, self.group, self.ntab) else 2
            )
        self.n_stream = n_stream
        # VMEM-resident row count under streaming: the length-1..3 table
        # prefix (3 of the 5 lookbacks every position).  NRES_B for the
        # base-4 layout; extended-table callers pass their base's prefix.
        self.nres = NRES_B if nres is None else nres

    @classmethod
    def from_profiles(cls, profiles, kpad: int | None = None,
                      group: int = GROUP, n_stream: int | None = None,
                      nsegs: int = 1):
        """Build with fragment tables synthesized ON DEVICE (MXU one-hot
        matmuls over the compact per-node inputs, ops/tables.py) instead
        of host dgemm + a 10.5x-bigger host->device upload.  The
        production path for TPU scans; numerics differ from the host
        f64 tables only by f32 product/sum rounding (~1e-7 relative).
        ``kpad`` is the PER-PROFILE padded width (the kernel row is
        nsegs * kpad lanes wide)."""
        from deciphon_tpu.ops.tables import synth_fragment_tables

        margp, qp, inm, inq, trans, B, eps = pack_block_compact(
            profiles, kpad, group, nsegs
        )
        Bp, Kp = margp.shape[0], margp.shape[1]
        P = Bp // (group * nsegs)
        fm = synth_fragment_tables(
            jnp.asarray(margp.reshape(-1, 125)),
            jnp.asarray(qp.reshape(-1, 5)),
            eps=eps,
        )
        femis_m = jnp.transpose(
            fm.reshape(P, nsegs, group, Kp, NTAB), (0, 4, 2, 1, 3)
        ).reshape(P, NTAB, group, nsegs * Kp)
        fin = synth_fragment_tables(
            jnp.asarray(inm.reshape(-1, 125)),
            jnp.asarray(inq.reshape(-1, 5)),
            eps=eps,
        )
        femis_in = jnp.transpose(
            fin.reshape(P, nsegs, group, 2, NTAB), (0, 4, 3, 1, 2)
        ).reshape(P, NTAB, 2, nsegs * group)
        self = object.__new__(cls)
        self._init(
            femis_m, femis_in, jnp.asarray(trans), B, group, n_stream,
            nsegs,
        )
        return self

    @classmethod
    def from_span_rows(cls, profiles, W: int = 1024, group: int = 8):
        """Slotspan blocks for huge-core profiles: each profile occupies
        ceil(core/W) consecutive sublane slots of a W-lane row, with
        cross-slot carries in-kernel — so a 4096-core outlier costs 4
        slots at W=1024 instead of widening a whole 8-slot row to 4096
        lanes (the 0.38-efficiency tail block).  One block per row (the
        slot layout is a static kernel parameter).  Returns a list of
        (PallasBlock, profile_positions)."""
        rows = plan_spans([p.core_size for p in profiles], W, group)
        out = []
        for row in rows:
            fm, fin, tr, spans, col_sel, pids = pack_span_row(
                profiles, row, W, group
            )
            blk = object.__new__(cls)
            blk._init(
                fm, fin, tr, len(pids), group, None, 1, None,
                spans=spans, col_sel=col_sel,
            )
            out.append((blk, pids))
        return out

    def scores(
        self,
        seqinfo,
        seqlens,
        nseqs: int,
        multi_hits: bool = True,
        hmmer3_compat: bool = False,
        interpret: bool = False,
        semiring: str = "max",
        dchain: str = "scan",
        trim_rows: bool = True,
        ablate: str = "none",
    ):
        """(alt [S, B], null [S, B]) device arrays for a packed seq batch.
        semiring="logsumexp" runs the forward algorithm in the same
        kernel (max -> logaddexp / LSE swap).  dchain="off" is an
        ablation-only timing mode with wrong numerics.

        The kernel and its output epilogue (the compact column index
        s*group+g matches packing order b = (p*nsegs+s)*group+g, so one
        transpose+reshape recovers profiles in block order) run as ONE
        jitted dispatch.  ``trim_rows=False`` skips the eager [:nseqs]
        row trim and returns all SG*nseq rows — batch-padding rows are
        exactly NEG; bulk callers (ScanEngine) trim at their host sync
        instead of paying one more dispatch per block here."""
        # layout fixed by make_seqinfo: [SG, nch, SEQROWS, nseq*WC/SEQROWS]
        nseq = seqinfo.shape[2] * seqinfo.shape[3] // WC
        alt, null = _run_scores(
            self.femis_m, self.femis_in, self.trans,
            seqinfo, seqlens,
            K=self.kpad, P=self.ngroups, nseq=nseq,
            nprofiles=self.nprofiles,
            multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
            interpret=interpret, n_stream=self.n_stream,
            semiring=semiring, group=self.group, dchain=dchain,
            nsegs=self.nsegs, nres=self.nres, ablate=ablate,
            spans=self.spans, col_sel=self.col_sel,
        )
        if trim_rows and alt.shape[0] != nseqs:
            alt = alt[:nseqs]
            null = null[:nseqs]
        return alt, null


def viterbi_scores_pallas(
    block: ProfileBlock,
    eidx: np.ndarray,  # [S, L, 5] int32
    seq_len: np.ndarray,  # [S] int32
    multi_hits: bool = True,
    hmmer3_compat: bool = False,
    interpret: bool = False,
    semiring: str = "max",
):
    """Drop-in (stateless) replacement for viterbi_jax.viterbi_scores.

    For repeated scans over the same profiles use PallasBlock directly —
    this convenience wrapper re-packs and re-uploads the tables each call.
    """
    pb = PallasBlock(block)
    seqinfo, seqlens, S = make_seqinfo(
        eidx, seq_len, nseq=pick_nseq(len(seq_len), nseq_cap(pb.kpad))
    )
    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S,
        multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
        interpret=interpret, semiring=semiring,
    )
    return np.asarray(alt), np.asarray(null)

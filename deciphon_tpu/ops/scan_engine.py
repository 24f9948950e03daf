"""Batched scan engine: sequences x profile-database -> LRT hits + products.

The compute core of the scan workload, replacing the reference's per-thread
rescan loop (src/server/scan.c:227-258 + scan_thread.c:86-129) with a
two-pass batched design:

  pass 1 (hot, device): profiles packed into sorted-greedy rows of a
    shared padded core size (db/partition.pack_profile_rows) and kept
    resident in device memory; sequences sorted by length so each kernel
    stack stops at its own longest read; every (seq, profile) pair scored
    by the batched JAX/Pallas Viterbi.  All blocks are dispatched
    asynchronously and synced once, then the LRT filter is applied
    (xmath.h:236-247, threshold 10.0 per scan.c:221).
  pass 2 (rare): only LRT survivors are re-run with traceback — a jitted
    backpointer DP (ops/viterbi_trace.py, ~5-10x the numpy oracle) — and
    decoded into match strings; hits are rare by construction, mirroring
    the reference's gate placement (scan_thread.c:121-129).
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from deciphon_tpu.db.format import TensorDB
from deciphon_tpu.db.partition import pack_profile_rows
from deciphon_tpu.models import codec
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.utils import trace, xmath
from deciphon_tpu.ops.emissions import fragment_indices

# Largest padded core size the Pallas kernel supports — the reference's
# full envelope (PROTEIN_MODEL_CORE_SIZE_MAX, core/limits.h:11).  Up to
# RESIDENT_MAX_KPAD the fragment table is fully VMEM-resident (regime A);
# above that the kernel streams length-4/5 emission rows from HBM
# (regime B, viterbi_pallas.py) with a smaller per-instance sequence
# stack.  Bigger profiles (none exist in HMMER-land) fall back to the
# XLA engine.
PALLAS_MAX_KPAD = 4096

# Slotspan tail packing: profiles with core > SPAN_THRESH take
# ceil(core/SPAN_W) consecutive sublane slots of a SPAN_W-lane group-8
# row (viterbi_pallas.plan_spans) instead of one max-core-wide slot
# each.  896 is the widest classic group-8 tier below SPAN_W.
SPAN_W = 1024
SPAN_THRESH = 896


@dataclass(frozen=True)
class ScanParams:
    """Mirrors sched_scan flags + the scan threshold (scan.c:221).

    ``algo`` extends the reference (which only runs Viterbi,
    scan_thread.c:115-118): "forward" scores every (seq, profile) pair
    with the forward algorithm — the same kernels under the logsumexp
    semiring — so logliks/LRT measure TOTAL path mass instead of the
    best path.  Hit match strings still decode the Viterbi path (the
    forward semiring has no single path to decode)."""

    multi_hits: bool = True
    hmmer3_compat: bool = False
    lrt_threshold: float = 10.0
    algo: str = "viterbi"  # "viterbi" | "forward"

    @property
    def semiring(self) -> str:
        if self.algo not in ("viterbi", "forward"):
            raise ValueError(f"unknown algo {self.algo!r}")
        return "logsumexp" if self.algo == "forward" else "max"


@dataclass
class SeqRecord:
    seq_id: int
    name: str
    data: str


@dataclass
class Hit:
    seq_id: int
    seq_idx: int
    profile_idx: int
    accession: str
    alt_loglik: float
    null_loglik: float
    lrt: float
    path: list[tuple[int, int]]
    match: str


@dataclass
class BestHit:
    """Per-read best profile, from the device-side reduction path."""

    seq_id: int
    profile_idx: int
    accession: str
    alt_loglik: float
    null_loglik: float
    lrt: float


class _SharedPull:
    """One host pull shared by many column views (the fused dispatch
    returns every block's scores as one concatenated device matrix)."""

    __slots__ = ("dev", "_np")

    def __init__(self, dev):
        self.dev = dev
        self._np = None

    def numpy(self) -> np.ndarray:
        if self._np is None:
            self._np = np.asarray(self.dev)
            self.dev = None  # free the device reference after the pull
        return self._np


class _Cols:
    """Lazy [rows, lo:hi] column slice of a _SharedPull; ``np.asarray``
    triggers (at most) one device->host transfer for ALL blocks."""

    __slots__ = ("parent", "lo", "hi")

    def __init__(self, parent: _SharedPull, lo: int, hi: int):
        self.parent = parent
        self.lo = lo
        self.hi = hi

    def __array__(self, dtype=None, copy=None):
        a = self.parent.numpy()[:, self.lo : self.hi]
        if dtype is not None and a.dtype != np.dtype(dtype):
            if copy is False:
                raise ValueError(
                    "dtype conversion requires a copy (copy=False given)"
                )
            a = a.astype(dtype)
        elif copy:
            a = a.copy()
        return a


class _Block:
    """One kernel dispatch unit: profiles sharing (kpad, group, nsegs).

    ``kpad`` is the PER-PROFILE padded width; segmented blocks
    (nsegs > 1) pack nsegs profiles per sublane into a kpad*nsegs-lane
    kernel row.  Device/host tensor forms are built lazily and cached;
    the base-5 (IUPAC) forms are dropped after each scan that needed
    them — ambiguous reads are rare and the tables are ~3x the base-4
    size.
    """

    __slots__ = (
        "chunk", "kpad", "group", "nsegs", "host", "pallas", "jaxdev",
        "iupac_host", "iupac_dev", "span_row",
    )

    def __init__(self, chunk: np.ndarray, kpad: int, group: int,
                 nsegs: int = 1, span_row=None):
        self.chunk = chunk
        self.kpad = kpad
        self.group = group
        self.nsegs = nsegs
        # slotspan row plan (viterbi_pallas.plan_spans entry): huge-core
        # profiles spanning ceil(core/kpad) sublane slots of one row
        self.span_row = span_row
        self.host = None  # host ProfileBlock (base 4)
        self.pallas = None  # PallasBlock | ShardedPallasBlock
        self.jaxdev = None  # device ProfileBlock for the XLA engine
        self.iupac_host = None  # host base-5 ProfileBlock
        self.iupac_dev = None  # device base-5 form (engine-dependent)

    @property
    def klanes(self) -> int:
        """Kernel lane width (the VMEM/nseq budget unit)."""
        return self.kpad * self.nsegs

    @property
    def row_lane_units(self) -> int:
        """Dispatched (sublane-slot x lane) units — the padded-work
        accounting unit (bench.py padding_efficiency)."""
        if self.span_row is not None:
            return self.group * self.kpad  # one row per span block
        slots = self.group * self.nsegs
        rows = -(-len(self.chunk) // slots) * slots
        return rows * self.kpad


def pad_seq_len(L: int) -> int:
    """Pad sequence length to a power-of-two count of kernel streaming
    chunks (255 positions each).

    The kernel compiles per (core bucket, chunk count) and each sequence
    stack stops computing at its own longest read, so padding costs only
    index-transfer bytes; power-of-two chunk tiers bound the number of
    compile variants at log(max read length)."""
    from deciphon_tpu.ops.viterbi_pallas import CPOS

    nch = max(1, -(-L // CPOS))
    tier = 1
    while tier < nch:
        tier *= 2
    return tier * CPOS


class ScanEngine:
    """Scans sequences against a TensorDB."""

    def __init__(
        self,
        db: TensorDB,
        params: ScanParams = ScanParams(),
        lane: int = 128,
        progress=None,
        use_pallas: bool | None = None,
        pallas_interpret: bool = False,
        traceback: str = "jax",  # "jax" (fast) | "oracle" (numpy)
        mesh=None,  # jax.sharding.Mesh('seqs', 'profiles') -> SPMD scan
        subset=None,  # profile indices to scan (share-nothing sharding)
    ):
        if use_pallas is None:
            import jax

            use_pallas = jax.default_backend() == "tpu"
        self.mesh = mesh
        self.db = db
        self.params = params
        self.progress = progress
        self.use_pallas = use_pallas
        self.pallas_interpret = pallas_interpret
        self.traceback = traceback
        # DCP_FUSE_SCAN=1 (default) fuses every block's kernel into ONE
        # jitted dispatch per scan (viterbi_pallas.fused_scores).  The
        # round-5 interleaved on-chip A/Bs (benchmarks/fuse_ab.py,
        # seg_ab.py, docs/PERFORMANCE.md):
        #   - unsegmented, fused vs per-block: EQUAL warm (39.9 vs 40.5
        #     GCUPS, within the run spread) — per-block queues all
        #     single-dispatch blocks before one sync, so relay gaps are
        #     already amortized at ~7 blocks;
        #   - segmented packing under per-block dispatch LOSES (21.4
        #     GCUPS: 12 blocks x ~90 ms relay round trips dominate);
        #   - segmented + fused WINS every round: 40.7 vs 38.1 GCUPS at
        #     profile-axis padding efficiency 0.705 vs 0.649.
        # So the default pairs fusion WITH segmentation; the price is a
        # serial monolith compile (one-time per machine via the
        # persistent cache; the per-block path cold-starts ~4x faster
        # when compiles are fresh).  Same numerics on every path
        # (tests/test_scan_engine.py pins fused == per-block).
        self.fuse = (
            use_pallas
            and mesh is None
            and os.environ.get("DCP_FUSE_SCAN", "1") != "0"
        )
        self._blocks: list[_Block] = []
        self._kpad_of: dict[int, int] = {}
        # subset = one share-nothing DB partition (the reference's
        # scale-out unit: N workers x contiguous size-balanced slices,
        # src/db/profile_reader.c:44-72 via db/partition.py)
        subset = None if subset is None else np.asarray(subset, np.int64)
        self.subset = subset
        sizes = db.core_sizes if subset is None else db.core_sizes[subset]
        if use_pallas:
            # Per-row DP packing: each sorted sublane row gets its own
            # lane-rounded width; huge-core rows use half-width sublane
            # groups so the 4096-envelope tail wastes less.  Segmented
            # tiers pack several small cores per row; they pay off ONLY
            # under the fused single-dispatch (the extra blocks cost one
            # relay round trip each under per-block dispatch —
            # 21.4 vs 40.7 GCUPS either side of the r5 A/B,
            # docs/PERFORMANCE.md), so DCP_SEG defaults to follow
            # ``fuse`` and can be forced either way explicitly.
            seg_env = os.environ.get("DCP_SEG")
            seg = (seg_env == "1") if seg_env is not None else self.fuse
            # Slotspan rows for the huge-core tail (cores > SPAN_THRESH):
            # each profile takes ceil(core/SPAN_W) consecutive sublane
            # slots of a SPAN_W-lane row with cross-slot carries
            # in-kernel — measured 1.56x the classic one-slot-per-
            # profile tail row on-chip at half the dispatched lanes,
            # bit-exact (benchmarks/span_tail.py).  Also brings the row
            # under the VMEM residency ceiling (no HBM streaming).
            # Single-chip only (mesh blocks keep the classic packing);
            # DCP_SPAN=0 disables.
            span_idx = np.array([], np.int64)
            if (
                mesh is None
                and os.environ.get("DCP_SPAN", "1") != "0"
                and sizes.max(initial=0) > SPAN_THRESH
            ):
                from deciphon_tpu.ops import viterbi_pallas as vp

                local = np.flatnonzero(sizes > SPAN_THRESH)
                span_idx = local
                rows = vp.plan_spans(sizes[local], SPAN_W, group=8)
                for row in rows:
                    pids = list(dict.fromkeys(t[0] for t in row))
                    gidx = local[pids]
                    if subset is not None:
                        gidx = subset[gidx]
                    # remap row entries to positions within this block's
                    # profile list
                    pos = {pi: i for i, pi in enumerate(pids)}
                    rrow = tuple(
                        (pos[pi], c, span) for pi, c, span in row
                    )
                    blk = _Block(
                        gidx, SPAN_W, 8, span_row=rrow
                    )
                    self._blocks.append(blk)
                    for gi, k in zip(gidx, sizes[local[pids]]):
                        self._kpad_of[int(gi)] = max(
                            lane, -(-int(k) // lane) * lane
                        )
            keep = (
                np.flatnonzero(~np.isin(np.arange(len(sizes)), span_idx))
                if len(span_idx)
                else np.arange(len(sizes))
            )
            packed = [
                (kpad, group, nsegs, keep[idxs])
                for kpad, group, nsegs, idxs in pack_profile_rows(
                    sizes[keep], lane=lane, seg=seg
                )
            ] if len(keep) else []
        else:
            # XLA engine has no sublane-row structure; group is notional
            packed = pack_profile_rows(
                sizes, lane=lane, small_group_kpad=1 << 30, seg=False
            )
        for kpad, group, nsegs, idxs in packed:
            if subset is not None:
                idxs = subset[idxs]
            blk = _Block(idxs, kpad, group, nsegs)
            self._blocks.append(blk)
            for gi in idxs:
                self._kpad_of[int(gi)] = kpad

    def _block(self, blk: _Block) -> vj.ProfileBlock:
        """Host (numpy) tensor block for this chunk."""
        if blk.host is None:
            profiles = [self.db.profile(int(i)) for i in blk.chunk]
            # span blocks pack cores wider than kpad; any non-span
            # consumer (XLA fallback) pads to the max core instead
            kp = None if blk.span_row is not None else blk.kpad
            blk.host = vj.build_profile_block(profiles, kpad=kp)
        return blk.host

    def _iupac_block(self, blk: _Block, codes: tuple) -> vj.ProfileBlock:
        """Host extended (IUPAC exact-subset) tensor block over base
        4+len(codes), built lazily: only scans whose reads actually
        contain ambiguity codes pay for it."""
        if blk.iupac_host is None:
            blk.iupac_host = {}
        if codes not in blk.iupac_host:
            profiles = [self.db.profile(int(i)) for i in blk.chunk]
            # span blocks pack cores wider than kpad; the IUPAC form
            # (XLA fallback, see _iupac_scores) pads to the max core
            kp = None if blk.span_row is not None else blk.kpad
            blk.iupac_host[codes] = vj.build_profile_block(
                profiles, kpad=kp, codes=codes
            )
        return blk.iupac_host[codes]

    def _pallas_block(self, blk: _Block):
        if blk.pallas is None:
            if self.mesh is not None:
                from deciphon_tpu.parallel.pallas_scan import (
                    ShardedPallasBlock,
                )

                blk.pallas = ShardedPallasBlock(
                    self._block(blk), self.mesh, group=blk.group,
                    nsegs=blk.nsegs,
                )
            elif blk.span_row is not None:
                from deciphon_tpu.ops import viterbi_pallas as vp

                profiles = [self.db.profile(int(i)) for i in blk.chunk]
                fm, fin, tr, spans, col_sel, pids = vp.pack_span_row(
                    profiles, blk.span_row, blk.kpad, blk.group
                )
                assert pids == list(range(len(profiles)))
                pb = object.__new__(vp.PallasBlock)
                pb._init(
                    fm, fin, tr, len(profiles), blk.group, None, 1,
                    None, spans=spans, col_sel=col_sel,
                )
                blk.pallas = pb
            else:
                from deciphon_tpu.ops import viterbi_pallas as vp

                # fragment tables synthesized on device (MXU) from the
                # compact per-node marginals — skips the host dgemm and
                # ships ~10x fewer bytes (ops/tables.py)
                blk.pallas = vp.PallasBlock.from_profiles(
                    [self.db.profile(int(i)) for i in blk.chunk],
                    kpad=blk.kpad, group=blk.group, nsegs=blk.nsegs,
                )
            blk.host = None  # host copy no longer needed on this path
        return blk.pallas

    def _jax_block(self, blk: _Block) -> vj.ProfileBlock:
        """Device-resident block for the XLA engine path (upload once)."""
        if blk.jaxdev is None:
            import jax.numpy as jnp

            blk.jaxdev = vj.ProfileBlock(
                *(jnp.asarray(a) for a in self._block(blk))
            )
        return blk.jaxdev

    def _iupac_scores(self, blk: _Block, codes: tuple, eidx, slen):
        """Queue an exact-subset IUPAC dispatch for one block (base
        4+len(codes) fragment tables).

        Single-chip TPU scans run the Pallas kernel on the extended
        tables (the table height is a kernel input; taller-than-VMEM
        tables stream their length-4/5 rows from HBM exactly like the
        base-4 regime B), so an ambiguous-read batch stays within ~the
        pure-ACGT rate instead of dropping to the XLA engine.  The mesh
        path keeps the XLA fallback."""
        p = self.params
        if blk.iupac_dev is None:
            blk.iupac_dev = {}
        if (
            self.use_pallas
            and self.mesh is None
            and blk.kpad <= PALLAS_MAX_KPAD
            # span blocks take the XLA fallback for ambiguous reads
            # (rare by construction; the extended-table span packing
            # isn't built)
            and blk.span_row is None
        ):
            import jax.numpy as jnp

            from deciphon_tpu.models.frame import frag_layout
            from deciphon_tpu.ops import viterbi_pallas as vp

            if codes not in blk.iupac_dev:
                base = 4 + len(codes)
                blk.iupac_dev[codes] = vp.PallasBlock(
                    self._iupac_block(blk, codes),
                    group=blk.group, nsegs=blk.nsegs,
                    nres=int(frag_layout(base)[0][4]),
                )
            pb = blk.iupac_dev[codes]
            nseq = vp.pick_nseq(
                len(slen), vp.nseq_cap(blk.klanes, blk.group)
            )
            seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=nseq)
            return pb.scores(
                jnp.asarray(seqinfo), jnp.asarray(seqlens), S,
                multi_hits=p.multi_hits,
                hmmer3_compat=p.hmmer3_compat,
                interpret=self.pallas_interpret,
                trim_rows=False,  # gate trims at host sync
                semiring=p.semiring,
            )
        if self.mesh is not None:
            from deciphon_tpu.parallel import pallas_scan as ps

            if codes not in blk.iupac_dev:
                blk.iupac_dev[codes] = ps.put_sharded_block(
                    self.mesh, self._iupac_block(blk, codes)
                )
            return ps.sharded_viterbi_scores(
                self.mesh, self._iupac_block(blk, codes), eidx, slen,
                multi_hits=p.multi_hits,
                hmmer3_compat=p.hmmer3_compat,
                dev_block=blk.iupac_dev[codes],
                semiring=p.semiring,
            )
        import jax.numpy as jnp

        if codes not in blk.iupac_dev:
            blk.iupac_dev[codes] = vj.ProfileBlock(
                *(jnp.asarray(a) for a in self._iupac_block(blk, codes))
            )
        return vj.viterbi_scores(
            blk.iupac_dev[codes], eidx, slen,
            multi_hits=p.multi_hits, hmmer3_compat=p.hmmer3_compat,
            semiring=p.semiring,
        )

    def warmup(self, nseqs: int, max_len: int, workers: int = 8) -> float:
        """Warm the FULL per-block scan path a scan of ``nseqs`` reads up
        to ``max_len`` nt will take: device table synthesis, the Pallas
        kernel variant, the eager output epilogue (transpose / reshape /
        slice), and the device->host result pull.

        Each block's ``scores()`` is EXECUTED once on zero-filled dummy
        sequence arrays of the exact production shapes and the results
        are pulled to host — this populates the jit cache AND the
        per-shape eager-op executables (AOT ``.lower().compile()`` of the
        kernel alone left the first real scan recompiling the kernels
        serially, and warming ``_run`` alone still left ~30-50 s per
        block of first-call epilogue compiles over the device relay —
        the round-2/3 cold-start sink).  XLA compilation releases the
        GIL, so per-block warms overlap across the thread pool.  On a
        mesh the same warm runs through ShardedPallasBlock with the
        dummy batch sharded over 'seqs' (the round-3 no-op here left a
        multi-device daemon paying the full serial first-scan compile).
        Returns seconds spent."""
        import time

        if not self.use_pallas:
            return 0.0
        import concurrent.futures as cf
        import threading

        import jax.numpy as jnp
        from deciphon_tpu.ops import viterbi_pallas as vp

        # serialize overlapping warmups (the daemon prewarms on a thread
        # while spooling reads, then tops up with the real shapes — the
        # second call must wait, not race the lazy block builds)
        lock = self.__dict__.setdefault("_warm_lock", threading.Lock())
        t0 = time.perf_counter()
        Lp = pad_seq_len(max_len)
        nch = Lp // vp.CPOS
        seqs_mult = self.mesh.shape["seqs"] if self.mesh is not None else 1

        def dummy_batch(nseq: int):
            sg = (nseqs + nseq - 1) // nseq
            sg = (sg + seqs_mult - 1) // seqs_mult * seqs_mult
            seqinfo = jnp.zeros(
                (sg, nch, vp.SEQROWS, nseq * vp.WC // vp.SEQROWS),
                jnp.int32,
            )
            seqlens = jnp.ones((sg, vp.SEQROWS, vp.SLPAD), jnp.int32)
            return seqinfo, seqlens

        if self.fuse:
            # production scans run ONE fused dispatch — warm exactly it
            # (per-block warms would compile 9 modules never used again)
            blocks = [
                b for b in self._blocks if b.kpad <= PALLAS_MAX_KPAD
            ]
            with lock:
                tier_of: dict[int, int] = {}
                seqinfos, seqlens_list = [], []
                metas, tensors = [], []
                for blk in blocks:
                    pb = self._pallas_block(blk)
                    nseq = vp.pick_nseq(
                        nseqs, vp.nseq_cap(blk.klanes, blk.group)
                    )
                    if nseq not in tier_of:
                        tier_of[nseq] = len(seqinfos)
                        si, sl = dummy_batch(nseq)
                        seqinfos.append(si)
                        seqlens_list.append(sl)
                    metas.append(
                        vp.BlockMeta(
                            K=pb.kpad, P=pb.ngroups, nseq=nseq,
                            nprofiles=pb.nprofiles, n_stream=pb.n_stream,
                            group=pb.group, nsegs=pb.nsegs, nres=pb.nres,
                            seq_slot=tier_of[nseq],
                            spans=pb.spans, col_sel=pb.col_sel,
                        )
                    )
                    tensors.append((pb.femis_m, pb.femis_in, pb.trans))
                if tensors:
                    alt, null = vp.fused_scores(
                        tuple(tensors), tuple(seqinfos),
                        tuple(seqlens_list), metas=tuple(metas),
                        multi_hits=self.params.multi_hits,
                        hmmer3_compat=self.params.hmmer3_compat,
                        interpret=self.pallas_interpret,
                        semiring=self.params.semiring,
                    )
                    np.asarray(alt)
                    np.asarray(null)
            return time.perf_counter() - t0

        def warm_block(blk: _Block):
            pb = self._pallas_block(blk)
            nseq = vp.pick_nseq(nseqs, vp.nseq_cap(blk.klanes, blk.group))
            sg = (nseqs + nseq - 1) // nseq
            sg = (sg + seqs_mult - 1) // seqs_mult * seqs_mult
            seqinfo = jnp.zeros(
                (sg, nch, vp.SEQROWS, nseq * vp.WC // vp.SEQROWS),
                jnp.int32,
            )
            seqlens = jnp.ones((sg, vp.SEQROWS, vp.SLPAD), jnp.int32)
            if self.mesh is not None:
                seqinfo, seqlens = pb.put_seqs(
                    np.asarray(seqinfo), np.asarray(seqlens)
                )
            alt, null = pb.scores(
                seqinfo, seqlens, min(nseqs, sg * nseq),
                multi_hits=self.params.multi_hits,
                hmmer3_compat=self.params.hmmer3_compat,
                interpret=self.pallas_interpret,
                trim_rows=False,  # the production dispatch variant
                semiring=self.params.semiring,
            )
            np.asarray(alt)
            np.asarray(null)

        with lock, cf.ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [
                ex.submit(warm_block, blk)
                for blk in self._blocks
                if blk.kpad <= PALLAS_MAX_KPAD
            ]
            for f in futs:
                f.result()
        return time.perf_counter() - t0

    def scan(self, seqs: Sequence[SeqRecord]) -> list[Hit]:
        """Score all (seq, profile) pairs; return LRT-passing hits with
        traceback + decoded match strings, ordered (seq, profile).

        Set DCP_PROFILE_DIR to capture a jax.profiler trace of pass 1;
        throughput (GCUPS) is logged per scan either way."""
        with trace.device_trace("scan"):
            return self._scan(seqs)

    def best_hits(self, seqs: Sequence[SeqRecord]) -> list[BestHit]:
        """Per-read best profile via DEVICE-SIDE reduction: each block's
        [S, B] score matrices reduce to [S] (argmax over the profile
        axis) before leaving the device, so the host transfer shrinks by
        the DB width.  On the fused path every block's columns live in
        ONE concatenated device matrix; a single jitted reduction over
        the static block boundaries returns [nblocks, S] vectors — one
        dispatch + one O(nblocks*S) pull, never the full [S, total]
        matrix (a ~20k-profile Pfam x 1k reads would be an 80 MB pull).
        On a mesh the reduction crosses profile shards as an XLA
        collective (the production form of the round-2 demo's pmax
        merge, parallel/sharded_scan.py).  No traceback — use ``scan``
        for products."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        @jax.jit
        def block_best(alt, null):
            lrt = -2.0 * (null - alt)
            lrt = jnp.where(alt > vj.NEG / 2, lrt, -jnp.inf)
            bi = jnp.argmax(lrt, axis=1)
            rows = jnp.arange(alt.shape[0])
            return bi, lrt[rows, bi], alt[rows, bi], null[rows, bi]

        @partial(jax.jit, static_argnums=(2,))
        def fused_best(alt, null, bounds):
            # per-block argmax over a shared concatenated matrix; the
            # ragged block widths make this a static unrolled loop
            rows = jnp.arange(alt.shape[0])
            outs = []
            for lo, hi in bounds:
                a, n = alt[:, lo:hi], null[:, lo:hi]
                lrt = jnp.where(a > vj.NEG / 2, -2.0 * (n - a), -jnp.inf)
                bi = jnp.argmax(lrt, axis=1)
                outs.append((bi, lrt[rows, bi], a[rows, bi], n[rows, bi]))
            return tuple(
                jnp.stack([o[j] for o in outs]) for j in range(4)
            )

        with trace.device_trace("best_hits"):
            encoded, pending = self._queue_dispatches(seqs)
            reduced = []
            # group fused-path column views by their shared device matrix
            fused_groups: dict[int, list] = {}
            for entry in pending:
                seq_ids, blk, _, alt, null = entry
                if isinstance(alt, _Cols) and alt.parent.dev is not None:
                    fused_groups.setdefault(
                        id(alt.parent), []
                    ).append(entry)
                else:
                    reduced.append(
                        (seq_ids, blk, block_best(alt, null))
                    )
            for entries in fused_groups.values():
                alt_dev = entries[0][3].parent.dev
                null_dev = entries[0][4].parent.dev
                bounds = tuple((e[3].lo, e[3].hi) for e in entries)
                bis, lrts, alts, nulls = fused_best(
                    alt_dev, null_dev, bounds
                )
                for j, (seq_ids, blk, _, _, _) in enumerate(entries):
                    reduced.append(
                        (seq_ids, blk,
                         (bis[j], lrts[j], alts[j], nulls[j]))
                    )
        self._finish_scan()
        best: dict[int, BestHit] = {}
        for seq_ids, blk, (bi, lrt, alt, null) in reduced:
            bi = np.asarray(bi)
            lrt = np.asarray(lrt)
            alt = np.asarray(alt)
            null = np.asarray(null)
            if self.progress is not None:
                self.progress.consume(len(seq_ids) * len(blk.chunk))
            for i, si in enumerate(seq_ids):
                if not np.isfinite(lrt[i]):
                    continue
                cur = best.get(si)
                if cur is None or lrt[i] > cur.lrt:
                    gi = int(blk.chunk[int(bi[i])])
                    best[si] = BestHit(
                        seq_id=seqs[si].seq_id,
                        profile_idx=gi,
                        accession=self.db.profile(gi).accession,
                        alt_loglik=float(alt[i]),
                        null_loglik=float(null[i]),
                        lrt=float(lrt[i]),
                    )
        return [best[si] for si in sorted(best)]

    def _scan(self, seqs: Sequence[SeqRecord]) -> list[Hit]:
        encoded, pending = self._queue_dispatches(seqs)
        return self._gate_and_traceback(seqs, encoded, pending)

    def _queue_dispatches(self, seqs: Sequence[SeqRecord]):
        # Split reads into classes by their set of IUPAC ambiguity codes:
        # pure-ACGT reads take the Pallas fast path; each distinct code
        # set scores on the XLA engine over EXACT base-(4+D) subset
        # tables (models/frame.fragment_table_codes) — the subset-exact
        # refinement of the reference's imm_dna_iupac scan alphabet
        # (hmm.c:72-73).  Each class sorts by length DESCENDING so
        # same-stack reads share a length profile and each kernel stack
        # stops at its own max.
        from deciphon_tpu.models.alphabet import encode_extended

        encoded = []
        classes: dict[tuple, list[int]] = {}
        for si, rec in enumerate(seqs):
            enc, cds = encode_extended(rec.data)
            encoded.append(enc)
            classes.setdefault(cds, []).append(si)

        p = self.params
        counters = trace.ScanCounters()
        # (seq_ids, blk, codes, alt_dev, null_dev): every dispatch queued
        # before any host sync so device compute pipelines across blocks
        pending: list[tuple[list[int], _Block, tuple, object, object]] = []
        used_iupac = False
        for codes in sorted(classes):
            seq_ids = sorted(
                classes[codes], key=lambda si: -len(encoded[si])
            )
            base = 4 + len(codes)
            Lp = pad_seq_len(max(len(encoded[si]) for si in seq_ids))
            eidx = np.stack(
                [
                    vj.end_fragment_indices(
                        fragment_indices(encoded[si], pad_to=Lp, base=base),
                        base=base,
                    )
                    for si in seq_ids
                ]
            )
            slen = np.array([len(encoded[si]) for si in seq_ids], np.int32)
            seqinfo_of: dict[int, tuple] = {}  # nseq stack -> packed batch
            len_sum = int(slen.sum())
            fuse_blocks: list[_Block] = []
            for blk in self._blocks:
                counters.consume(
                    len_sum, int(self.db.core_sizes[blk.chunk].sum())
                )
                if codes:
                    used_iupac = True
                    alt, null = self._iupac_scores(blk, codes, eidx, slen)
                elif (
                    self.fuse
                    and blk.kpad <= PALLAS_MAX_KPAD
                ):
                    fuse_blocks.append(blk)
                    continue
                elif self.use_pallas and blk.kpad <= PALLAS_MAX_KPAD:
                    from deciphon_tpu.ops import viterbi_pallas as vp

                    nseq = vp.pick_nseq(
                        len(seq_ids), vp.nseq_cap(blk.klanes, blk.group)
                    )
                    if nseq not in seqinfo_of:
                        import jax
                        import jax.numpy as jnp

                        seqinfo, seqlens, S = vp.make_seqinfo(
                            eidx, slen, nseq=nseq,
                            sg_multiple=(
                                self.mesh.shape["seqs"] if self.mesh else 1
                            ),
                        )
                        # upload once per sequence stack, not per block
                        if self.mesh is not None:
                            from jax.sharding import (
                                NamedSharding, PartitionSpec,
                            )

                            ssh = NamedSharding(
                                self.mesh, PartitionSpec("seqs")
                            )
                            seqinfo_of[nseq] = (
                                jax.device_put(seqinfo, ssh),
                                jax.device_put(seqlens, ssh),
                                S,
                            )
                        else:
                            seqinfo_of[nseq] = (
                                jnp.asarray(seqinfo), jnp.asarray(seqlens), S
                            )
                    seqinfo, seqlens, S = seqinfo_of[nseq]
                    # trim_rows=False: one dispatch per block; padded
                    # rows are exactly NEG and trimmed at host sync
                    alt, null = self._pallas_block(blk).scores(
                        seqinfo, seqlens, S,
                        multi_hits=p.multi_hits,
                        hmmer3_compat=p.hmmer3_compat,
                        interpret=self.pallas_interpret,
                        trim_rows=False,
                        semiring=p.semiring,
                    )
                elif self.mesh is not None:
                    from deciphon_tpu.parallel import pallas_scan as ps

                    # upload the sharded block once, reuse across batches
                    if blk.jaxdev is None:
                        blk.jaxdev = ps.put_sharded_block(
                            self.mesh, self._block(blk)
                        )
                    alt, null = ps.sharded_viterbi_scores(
                        self.mesh, self._block(blk), eidx, slen,
                        multi_hits=p.multi_hits,
                        hmmer3_compat=p.hmmer3_compat,
                        dev_block=blk.jaxdev,
                        semiring=p.semiring,
                    )
                else:
                    alt, null = vj.viterbi_scores(
                        self._jax_block(blk), eidx, slen,
                        multi_hits=p.multi_hits,
                        hmmer3_compat=p.hmmer3_compat,
                        semiring=p.semiring,
                    )
                pending.append((seq_ids, blk, codes, alt, null))
            if fuse_blocks:
                pending.extend(
                    self._fused_dispatch(fuse_blocks, eidx, slen, seq_ids)
                )
        self._counters = counters
        self._used_iupac = used_iupac
        return encoded, pending

    def _fused_dispatch(
        self, blocks: list[_Block], eidx, slen, seq_ids: list[int]
    ) -> list[tuple]:
        """One jitted dispatch covering every eligible block's kernel +
        epilogue (viterbi_pallas.fused_scores).  Sequence batches pack
        once per distinct nseq stack and blocks reference their tier by
        static index."""
        import jax.numpy as jnp

        from deciphon_tpu.ops import viterbi_pallas as vp

        p = self.params
        tier_of: dict[int, int] = {}
        seqinfos, seqlens_list = [], []
        metas, tensors = [], []
        for blk in blocks:
            pb = self._pallas_block(blk)
            nseq = vp.pick_nseq(
                len(seq_ids), vp.nseq_cap(blk.klanes, blk.group)
            )
            if nseq not in tier_of:
                si, sl, _ = vp.make_seqinfo(eidx, slen, nseq=nseq)
                tier_of[nseq] = len(seqinfos)
                seqinfos.append(jnp.asarray(si))
                seqlens_list.append(jnp.asarray(sl))
            metas.append(
                vp.BlockMeta(
                    K=pb.kpad, P=pb.ngroups, nseq=nseq,
                    nprofiles=pb.nprofiles, n_stream=pb.n_stream,
                    group=pb.group, nsegs=pb.nsegs, nres=pb.nres,
                    seq_slot=tier_of[nseq],
                    spans=pb.spans, col_sel=pb.col_sel,
                )
            )
            tensors.append((pb.femis_m, pb.femis_in, pb.trans))
        alt_cat, null_cat = vp.fused_scores(
            tuple(tensors), tuple(seqinfos), tuple(seqlens_list),
            metas=tuple(metas),
            multi_hits=p.multi_hits, hmmer3_compat=p.hmmer3_compat,
            interpret=self.pallas_interpret,
            semiring=p.semiring,
        )
        alt_sh, null_sh = _SharedPull(alt_cat), _SharedPull(null_cat)
        pending, lo = [], 0
        for blk, m in zip(blocks, metas, strict=True):
            hi = lo + m.nprofiles
            pending.append(
                (seq_ids, blk, (), _Cols(alt_sh, lo, hi),
                 _Cols(null_sh, lo, hi))
            )
            lo = hi
        return pending

    def _finish_scan(self) -> None:
        """Post-sync bookkeeping shared by scan/best_hits."""
        if self._used_iupac:
            # extended tables are ~3x the base-4 footprint; drop them so
            # a single ambiguous read doesn't pin the whole DB twice
            for blk in self._blocks:
                blk.iupac_host = None
                blk.iupac_dev = None
        self._counters.report()

    def _gate_and_traceback(
        self, seqs: Sequence[SeqRecord], encoded: list, pending: list
    ) -> list[Hit]:
        p = self.params
        # single host-sync pass: LRT gate, then pass-2 traceback of the
        # survivors batched by (kpad, length-bucket, codes) — one jitted
        # backpointer dispatch per group instead of one per hit
        survivors: list[tuple] = []
        for seq_ids, blk, codes, alt, null in pending:
            # [:len(seq_ids)]: drop batch-padding rows (trim_rows=False
            # dispatches return all SG*nseq rows)
            alt = np.asarray(alt, dtype=np.float64)[: len(seq_ids)]
            null = np.asarray(null, dtype=np.float64)[: len(seq_ids)]
            lrt = xmath.lrt(null, alt)
            ok = np.isfinite(lrt) & (lrt >= p.lrt_threshold)
            ok &= alt > vj.NEG / 2
            if self.progress is not None:
                self.progress.consume(len(seq_ids) * len(blk.chunk))
            for si_local, bi in np.argwhere(ok):
                si = seq_ids[int(si_local)]
                gi = int(blk.chunk[int(bi)])
                survivors.append(
                    (
                        si, gi, codes,
                        float(alt[si_local, bi]),
                        float(null[si_local, bi]),
                        float(lrt[si_local, bi]),
                    )
                )
        hits = self._traceback_all(seqs, encoded, survivors)
        self._finish_scan()
        hits.sort(key=lambda h: (h.seq_idx, h.profile_idx))
        return hits

    def _traceback_all(
        self, seqs: Sequence[SeqRecord], encoded: list, survivors: list
    ) -> list[Hit]:
        """Pass-2 traceback of all LRT survivors.

        Default path batches survivors by (kpad, length-bucket, codes)
        and runs ONE jitted backpointer DP per group (the reference
        tracebacks per hit, scan_thread.c:125-129 — fine at production
        thresholds, serial at permissive ones)."""
        hits: list[Hit] = []
        if self.traceback == "oracle":
            for si, gi, codes, alt, null, lrt in survivors:
                prof = self.db.profile(gi)
                res = vr.viterbi_alt(
                    prof, encoded[si],
                    multi_hits=self.params.multi_hits,
                    hmmer3_compat=self.params.hmmer3_compat,
                    codes=codes,
                )
                hits.append(
                    self._hit(seqs[si], si, gi, prof, alt, null, lrt, res)
                )
            return hits
        from deciphon_tpu.ops import viterbi_trace as vtr

        groups: dict[tuple, list] = {}
        for item in survivors:
            si, gi = item[0], item[1]
            key = (
                self._kpad_of[gi],
                pad_seq_len(len(encoded[si])),
                item[2],
            )
            groups.setdefault(key, []).append(item)
        for (kpad, Lp, codes), items in groups.items():
            profs = [self.db.profile(gi) for _, gi, *_ in items]
            results = vtr.viterbi_alt_batch(
                profs,
                [encoded[si] for si, *_ in items],
                multi_hits=self.params.multi_hits,
                hmmer3_compat=self.params.hmmer3_compat,
                kpad=kpad, pad_to=Lp, codes=codes,
            )
            for (si, gi, _, alt, null, lrt), prof, res in zip(
                items, profs, results
            ):
                hits.append(
                    self._hit(seqs[si], si, gi, prof, alt, null, lrt, res)
                )
        return hits

    def _hit(self, rec, si, profile_idx, prof, alt, null, lrt, res) -> Hit:
        match = codec.render_match(codec.match_steps(prof, rec.data, res.path))
        return Hit(
            seq_id=rec.seq_id,
            seq_idx=si,
            profile_idx=profile_idx,
            accession=prof.accession,
            alt_loglik=alt,
            null_loglik=null,
            lrt=lrt,
            path=res.path,
            match=match,
        )

"""Batched scan engine: sequences x profile-database -> LRT hits + products.

The compute core of the scan workload, replacing the reference's per-thread
rescan loop (src/server/scan.c:227-258 + scan_thread.c:86-129) with a
two-pass batched design:

  pass 1 (hot, device): profiles grouped into padded core-size buckets and
    chunked into blocks resident in device memory; sequences grouped into
    padded length buckets; every (seq, profile) pair scored by the batched
    JAX/Pallas Viterbi; LRT filter (xmath.h:236-247, threshold 10.0 per
    scan.c:221).
  pass 2 (rare): only LRT survivors are re-run with traceback — a jitted
    backpointer DP (ops/viterbi_trace.py, ~5-10x the numpy oracle) — and
    decoded into match strings; hits are rare by construction, mirroring
    the reference's gate placement (scan_thread.c:121-129).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Sequence

import numpy as np

from deciphon_tpu.db.format import TensorDB
from deciphon_tpu.db.partition import bucket_by_core_size
from deciphon_tpu.models import codec
from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.utils import trace
from deciphon_tpu.ops.emissions import fragment_indices

# Largest padded core size the Pallas kernel supports — the reference's
# full envelope (PROTEIN_MODEL_CORE_SIZE_MAX, core/limits.h:11).  Up to
# RESIDENT_MAX_KPAD the fragment table is fully VMEM-resident (regime A);
# above that the kernel streams length-4/5 emission rows from HBM
# (regime B, viterbi_pallas.py) with a smaller per-instance sequence
# stack.  Bigger profiles (none exist in HMMER-land) fall back to the
# XLA engine.
PALLAS_MAX_KPAD = 4096


@dataclass(frozen=True)
class ScanParams:
    """Mirrors sched_scan flags + the scan threshold (scan.c:221)."""

    multi_hits: bool = True
    hmmer3_compat: bool = False
    lrt_threshold: float = 10.0


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


def pad_seq_len(L: int) -> int:
    """Pad sequence length to a whole number of kernel streaming chunks.

    The kernel compiles per (core bucket, chunk count) and stops
    computing at the batch's true longest read, so padding costs only
    index-transfer bytes — buckets are plain 255-position chunk
    multiples (every read <= 255 nt shares one compile per core
    bucket)."""
    from deciphon_tpu.ops.viterbi_pallas import CPOS

    return max(CPOS, (L + CPOS - 1) // CPOS * CPOS)


class ScanEngine:
    """Scans sequences against a TensorDB."""

    def __init__(
        self,
        db: TensorDB,
        params: ScanParams = ScanParams(),
        block_size: int = 64,
        lane: int = 128,
        progress=None,
        use_pallas: bool | None = None,
        pallas_interpret: bool = False,
        traceback: str = "jax",  # "jax" (fast) | "oracle" (numpy)
        mesh=None,  # jax.sharding.Mesh('seqs', 'profiles') -> SPMD scan
    ):
        if use_pallas is None:
            import jax

            use_pallas = jax.default_backend() == "tpu"
        self.mesh = mesh
        self.db = db
        self.params = params
        self.block_size = block_size
        self.progress = progress
        self.use_pallas = use_pallas
        self.pallas_interpret = pallas_interpret
        self.traceback = traceback
        # entry = [chunk, host ProfileBlock|None, kpad, PallasBlock|None,
        #          device ProfileBlock|None, iupac host block|None,
        #          iupac device block|None]
        self._blocks: list[list] = []
        self._kpad_of: dict[int, int] = {}
        # The Pallas kernel rounds K up to whole 128-lane tiles anyway, so
        # on TPU all sub-128 cores share one K=128 bucket — fewer compiles
        # (one per (kpad, length-bucket) pair) and fuller blocks.
        core_pad = (
            np.maximum(db.core_sizes, lane) if use_pallas else db.core_sizes
        )
        for kpad, idxs in bucket_by_core_size(core_pad, lane).items():
            for i in range(0, len(idxs), block_size):
                chunk = idxs[i : i + block_size]
                self._blocks.append([chunk, None, kpad, None, None, None, None])
                for gi in chunk:
                    self._kpad_of[int(gi)] = kpad

    def _block(self, entry) -> vj.ProfileBlock:
        """Host (numpy) tensor block for this chunk."""
        chunk, block, kpad = entry[0], entry[1], entry[2]
        if block is None:
            profiles = [self.db.profile(int(i)) for i in chunk]
            block = vj.build_profile_block(profiles, kpad=kpad)
            entry[1] = block
        return block

    def _iupac_block(self, entry) -> vj.ProfileBlock:
        """Host base-5 (IUPAC-N) tensor block, built lazily: only scans
        whose reads actually contain ambiguity codes pay for it."""
        if entry[5] is None:
            profiles = [self.db.profile(int(i)) for i in entry[0]]
            entry[5] = vj.build_profile_block(
                profiles, kpad=entry[2], base=5
            )
        return entry[5]

    def _pallas_block(self, entry):
        if entry[3] is None:
            if self.mesh is not None:
                from deciphon_tpu.parallel.pallas_scan import (
                    ShardedPallasBlock,
                )

                entry[3] = ShardedPallasBlock(self._block(entry), self.mesh)
            else:
                from deciphon_tpu.ops import viterbi_pallas as vp

                entry[3] = vp.PallasBlock(self._block(entry))
            entry[1] = None  # host copy no longer needed on this path
        return entry[3]

    def _jax_block(self, entry) -> vj.ProfileBlock:
        """Device-resident block for the XLA engine path (upload once)."""
        if entry[4] is None:
            import jax.numpy as jnp

            entry[4] = vj.ProfileBlock(
                *(jnp.asarray(a) for a in self._block(entry))
            )
        return entry[4]

    def scan(self, seqs: Sequence[SeqRecord]) -> list[Hit]:
        """Score all (seq, profile) pairs; return LRT-passing hits with
        traceback + decoded match strings, ordered (seq, profile).

        Set DCP_PROFILE_DIR to capture a jax.profiler trace of pass 1;
        throughput (GCUPS) is logged per scan either way."""
        with trace.device_trace("scan"):
            return self._scan(seqs)

    def _scan(self, seqs: Sequence[SeqRecord]) -> list[Hit]:
        # length-bucket the sequences; reads containing IUPAC ambiguity
        # codes (N etc., encoded 4) bucket separately — they score via
        # the XLA engine against base-5 (N-marginal) fragment tables,
        # while pure-ACGT reads stay on the Pallas fast path.  Mirrors
        # the reference's imm_dna_iupac scan alphabet (hmm.c:72-73).
        from deciphon_tpu.models.alphabet import encode_iupac

        by_len: dict[tuple[int, bool], list[int]] = {}
        encoded = []
        for si, rec in enumerate(seqs):
            enc = encode_iupac(rec.data)
            encoded.append(enc)
            iupac = bool(np.any(enc >= 4))
            by_len.setdefault((pad_seq_len(len(enc)), iupac), []).append(si)

        hits: list[Hit] = []
        p = self.params
        counters = trace.ScanCounters()
        for (lp, iupac), seq_ids in sorted(by_len.items()):
            base = 5 if iupac else 4
            eidx = np.stack(
                [
                    vj.end_fragment_indices(
                        fragment_indices(encoded[si], pad_to=lp, base=base),
                        base=base,
                    )
                    for si in seq_ids
                ]
            )
            slen = np.array([len(encoded[si]) for si in seq_ids], np.int32)
            seqinfo_of: dict[int, tuple] = {}  # nseq stack -> packed batch
            len_sum = int(slen.sum())
            for entry in self._blocks:
                chunk, kpad = entry[0], entry[2]
                counters.consume(
                    len_sum, int(self.db.core_sizes[chunk].sum())
                )
                if iupac:
                    # base-5 tables exceed the kernel's VMEM residency
                    # plan; the XLA engine gathers them from HBM with no
                    # layout constraint (ambiguous reads are rare)
                    if self.mesh is not None:
                        from deciphon_tpu.parallel import pallas_scan as ps

                        alt, null = ps.sharded_viterbi_scores(
                            self.mesh, self._iupac_block(entry), eidx, slen,
                            multi_hits=p.multi_hits,
                            hmmer3_compat=p.hmmer3_compat,
                        )
                    else:
                        import jax.numpy as jnp

                        if entry[6] is None:
                            entry[6] = vj.ProfileBlock(
                                *(
                                    jnp.asarray(a)
                                    for a in self._iupac_block(entry)
                                )
                            )
                        alt, null = vj.viterbi_scores(
                            entry[6], eidx, slen,
                            multi_hits=p.multi_hits,
                            hmmer3_compat=p.hmmer3_compat,
                        )
                elif self.use_pallas and kpad <= PALLAS_MAX_KPAD:
                    from deciphon_tpu.ops import viterbi_pallas as vp

                    nseq = vp.pick_nseq(len(seq_ids), vp.nseq_cap(kpad))
                    if nseq not in seqinfo_of:
                        import jax
                        import jax.numpy as jnp

                        seqinfo, seqlens, S = vp.make_seqinfo(
                            eidx, slen, nseq=nseq,
                            sg_multiple=(
                                self.mesh.shape["seqs"] if self.mesh else 1
                            ),
                        )
                        # upload once per (length bucket, stack), not
                        # per block
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
                    alt, null = self._pallas_block(entry).scores(
                        seqinfo, seqlens, S,
                        multi_hits=p.multi_hits,
                        hmmer3_compat=p.hmmer3_compat,
                        interpret=self.pallas_interpret,
                    )
                elif self.mesh is not None:
                    from deciphon_tpu.parallel import pallas_scan as ps

                    alt, null = ps.sharded_viterbi_scores(
                        self.mesh, self._block(entry), eidx, slen,
                        multi_hits=p.multi_hits,
                        hmmer3_compat=p.hmmer3_compat,
                    )
                else:
                    alt, null = vj.viterbi_scores(
                        self._jax_block(entry), eidx, slen,
                        multi_hits=p.multi_hits,
                        hmmer3_compat=p.hmmer3_compat,
                    )
                alt = np.asarray(alt, dtype=np.float64)
                null = np.asarray(null, dtype=np.float64)
                lrt = -2.0 * (null - alt)
                ok = np.isfinite(lrt) & (lrt >= p.lrt_threshold)
                ok &= alt > vj.NEG / 2
                if self.progress is not None:
                    self.progress.consume(len(seq_ids) * len(chunk))
                for si_local, bi in np.argwhere(ok):
                    si = seq_ids[int(si_local)]
                    gi = int(chunk[int(bi)])
                    hits.append(
                        self._traceback(
                            seqs[si], si, encoded[si], gi,
                            float(alt[si_local, bi]),
                            float(null[si_local, bi]),
                            float(lrt[si_local, bi]),
                        )
                    )
        counters.report()
        hits.sort(key=lambda h: (h.seq_idx, h.profile_idx))
        return hits

    def _traceback(
        self, rec: SeqRecord, si: int, enc: np.ndarray, profile_idx: int,
        alt: float, null: float, lrt: float,
    ) -> Hit:
        prof = self.db.profile(profile_idx)
        base = 5 if bool(np.any(enc >= 4)) else 4
        if self.traceback == "oracle":
            res = vr.viterbi_alt(
                prof, enc,
                multi_hits=self.params.multi_hits,
                hmmer3_compat=self.params.hmmer3_compat,
                base=base,
            )
        else:
            from deciphon_tpu.ops import viterbi_trace as vtr

            # pad nodes to the bucket and positions to the length bucket
            # so jit compiles once per (kpad, length-bucket) pair
            res = vtr.viterbi_alt(
                prof, enc,
                multi_hits=self.params.multi_hits,
                hmmer3_compat=self.params.hmmer3_compat,
                block_row=tuple(
                    vj.build_profile_block(
                        [prof], kpad=self._kpad_of[profile_idx], base=base
                    )
                ),
                pad_to=pad_seq_len(len(enc)),
                base=base,
            )
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

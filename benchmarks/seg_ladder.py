"""On-chip throughput ladder for SEGMENTED kernel rows.

Usage: python benchmarks/seg_ladder.py [W,nsegs ...]

For each (W, nsegs) tier: builds group*nsegs*ROWS profiles of core size
W-8, scores a 64x512-nt batch through PallasBlock, and reports effective
GCUPS on true (unpadded) cells next to the unsegmented alternative the
partition DP would otherwise pick (the same profiles padded to a whole
128-multiple row each).  This is the measurement behind SEG_TIERS: a
tier earns its place only if the segmented row beats the unsegmented
row on true-cell throughput.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from deciphon_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402

from deciphon_tpu.models.alphabet import DNA  # noqa: E402
from deciphon_tpu.models.h3reader import build_profile  # noqa: E402
from deciphon_tpu.models.h3writer import random_h3  # noqa: E402
from deciphon_tpu.ops import viterbi_jax as vj  # noqa: E402
from deciphon_tpu.ops import viterbi_pallas as vp  # noqa: E402
from deciphon_tpu.ops.emissions import fragment_indices  # noqa: E402

NSEQS = 64
L = 512
ROWS = 2  # profile rows per variant (nprof = group*nsegs*ROWS)


def batch():
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), L)) for _ in range(NSEQS)]
    Lp = (L + 254) // 255 * 255
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=Lp)
            )
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    return eidx, slen


def run(pb, eidx, slen, nprof):
    nseq = vp.pick_nseq(NSEQS, vp.nseq_cap(pb.kpad, pb.group))
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=nseq)
    seqinfo = jax.numpy.asarray(seqinfo)
    seqlens = jax.numpy.asarray(seqlens)
    alt, null = pb.scores(seqinfo, seqlens, S)
    a0 = np.asarray(alt)
    reps, inner = 3, 4
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            alt, null = pb.scores(seqinfo, seqlens, S)
        float(np.asarray(alt)[0, 0])
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, a0


def check(W: int, nsegs: int, group: int = vp.GROUP):
    core = W - 8
    nprof = group * nsegs * ROWS
    profiles = [
        build_profile(random_h3(s + 1, core, peak=0.8))
        for s in range(nprof)
    ]
    eidx, slen = batch()
    cells = float(NSEQS) * nprof * L * core * 3

    pb_seg = vp.PallasBlock.from_profiles(
        profiles, kpad=W, group=group, nsegs=nsegs
    )
    dt_seg, a_seg = run(pb_seg, eidx, slen, nprof)

    kpad_u = max(128, (core + 127) // 128 * 128)
    pb_u = vp.PallasBlock.from_profiles(profiles, kpad=kpad_u, group=group)
    dt_u, a_u = run(pb_u, eidx, slen, nprof)

    err = float(np.abs(a_seg - a_u).max())
    print(
        f"W={W:4d} s={nsegs} row={W*nsegs:4d} nprof={nprof:3d} "
        f"seg={cells/dt_seg/1e9:6.1f} GCUPS ({dt_seg*1e3:6.1f}ms)  "
        f"unseg[k{kpad_u}]={cells/dt_u/1e9:6.1f} GCUPS ({dt_u*1e3:6.1f}ms) "
        f"err={err:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    tiers = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
        (32, 8), (64, 8), (64, 4), (96, 8), (128, 4),
        (160, 4), (192, 2), (192, 4), (256, 2), (256, 3), (320, 2), (384, 2),
    ]
    print("backend", jax.default_backend(), flush=True)
    for w, s in tiers:
        check(w, s)

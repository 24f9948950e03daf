"""On-chip parity + throughput check for the regime-B (streaming) kernel.

Usage: python benchmarks/bigk_check.py [kpad ...]   (default: 1024 2048 4096)

For each kpad: builds a small block of random-HMM profiles at that core
size, scores a read batch with the Pallas kernel (regime picked by kpad),
checks parity against the XLA engine, and reports GCUPS (unpadded-cell
convention, bench.py) for the Pallas path.
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


def check(kpad: int, nprof: int = 16, nseqs: int = 16, L: int = 500):
    rng = np.random.default_rng(kpad)
    core = kpad - 24  # slightly under the pad boundary
    t0 = time.time()
    profiles = [
        build_profile(random_h3(s + 1, core, peak=0.8)) for s in range(nprof)
    ]
    block = vj.build_profile_block(profiles, kpad=kpad)
    t_build = time.time() - t0

    seqs = ["".join(rng.choice(list("ACGT"), L)) for _ in range(nseqs)]
    Lp = max(255, (L + 254) // 255 * 255)
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=Lp)
            )
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)

    t0 = time.time()
    # production row shape: group-8 rows above the group-16 residency
    # boundary (db/partition.pack_profile_rows)
    group = 8 if kpad > vp.RESIDENT_MAX_KPAD else vp.GROUP
    pb = vp.PallasBlock(block, group=group)
    nseq = vp.pick_nseq(nseqs, vp.nseq_cap(kpad, group))
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=nseq)
    seqinfo = jax.numpy.asarray(seqinfo)
    seqlens = jax.numpy.asarray(seqlens)
    alt, null = pb.scores(seqinfo, seqlens, S)
    alt0 = np.asarray(alt)
    null0 = np.asarray(null)
    t_compile = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        alt, null = pb.scores(seqinfo, seqlens, S)
    float(np.asarray(alt)[0, 0])
    dt = (time.time() - t0) / reps
    cells = float(nseqs) * nprof * L * core * 3
    gcups = cells / dt / 1e9

    # parity vs the XLA engine on a subsample (full XLA run at K=4096 on
    # the relay is slow)
    sub = slice(0, 4)
    ra, rn = vj.viterbi_scores(block, eidx[sub], slen[sub])
    ea = float(np.abs(alt0[sub] - np.asarray(ra)).max())
    en = float(np.abs(null0[sub] - np.asarray(rn)).max())
    print(
        f"kpad={kpad} n_stream={pb.n_stream} nseq={nseq} "
        f"GCUPS={gcups:.1f} dt={dt*1e3:.1f}ms err=({ea:.2e},{en:.2e}) "
        f"build={t_build:.1f}s warmup={t_compile:.1f}s",
        flush=True,
    )
    assert ea < 1e-2 and en < 1e-2, "PARITY FAILED"


if __name__ == "__main__":
    kpads = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    print("backend", jax.default_backend(), flush=True)
    for kp in kpads:
        check(kp)

"""Probe: sequence-stack depth for the huge-core (regime-B) tail block.

The Pfam bench's kpad-4096 tail block dominates per-scan device time;
nseq_cap currently pins it to a 16-deep stack (VMEM heuristic).  This
probe times a production-shaped tail block (8 profiles, group 8) over a
256-read batch at several stack depths to find the fastest one that
actually fits VMEM.

Usage: python benchmarks/tail_nseq.py [kpad] [nseq ...]
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
import jax.numpy as jnp  # noqa: E402

from deciphon_tpu.models.alphabet import DNA  # noqa: E402
from deciphon_tpu.models.h3reader import build_profile  # noqa: E402
from deciphon_tpu.models.h3writer import random_h3  # noqa: E402
from deciphon_tpu.ops import viterbi_jax as vj  # noqa: E402
from deciphon_tpu.ops import viterbi_pallas as vp  # noqa: E402
from deciphon_tpu.ops.emissions import fragment_indices  # noqa: E402

NSEQS = 256


def main(kpad: int, stacks: list[int]) -> None:
    rng = np.random.default_rng(3)
    cores = [965, 1024, 1123, 1532, 1532, 1543, 2048, kpad]
    profiles = [
        build_profile(random_h3(s + 1, min(c, kpad), peak=0.8))
        for s, c in enumerate(cores)
    ]
    lens = rng.integers(150, 500, NSEQS)
    lens = np.sort(lens)[::-1]
    Lp = 510
    seqs = ["".join(rng.choice(list("ACGT"), int(L))) for L in lens]
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=Lp)
            )
            for s in seqs
        ]
    )
    slen = np.asarray(lens, np.int32)
    pb = vp.PallasBlock.from_profiles(profiles, kpad=kpad, group=8)
    true_cells = 3.0 * float(sum(min(c, kpad) for c in cores)) * lens.sum()
    for nseq in stacks:
        try:
            seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=nseq)
            seqinfo = jnp.asarray(seqinfo)
            seqlens = jnp.asarray(seqlens)
            t0 = time.perf_counter()
            alt, null = pb.scores(seqinfo, seqlens, S)
            a0 = float(np.asarray(alt)[0, 0])
            warm = time.perf_counter() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(2):
                    alt, null = pb.scores(seqinfo, seqlens, S)
                float(np.asarray(alt)[0, 0])
                best = min(best, (time.perf_counter() - t0) / 2)
            print(
                f"kpad={kpad} nseq={nseq:2d} SG={NSEQS // nseq:2d} "
                f"dt={best * 1e3:7.1f}ms true={true_cells / best / 1e9:6.1f}"
                f" GCUPS warm={warm:.1f}s a0={a0:.3f}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — VMEM overflow reporting
            print(f"kpad={kpad} nseq={nseq:2d} FAILED: {type(e).__name__}:"
                  f" {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    kpad = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    stacks = [int(a) for a in sys.argv[2:]] or [8, 16, 32]
    print("backend", jax.default_backend(), flush=True)
    main(kpad, stacks)

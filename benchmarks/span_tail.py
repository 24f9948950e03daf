"""Slotspan tail microbench: huge-core profiles at W-lane span rows vs
the classic one-slot-per-profile row at kpad = max core.

The Pfam-shaped bench's dominant padding waste is the huge-core tail
block: 8 profiles (cores ~830-4096) each occupying one 4096-lane slot —
padding efficiency 0.386, 27% of all dispatched work
(docs/PERFORMANCE.md).  Slotspan rows pack each profile into
ceil(core/W) consecutive slots with cross-slot carries in-kernel,
halving the dispatched lanes AND bringing the row back under the
VMEM-residency ceiling (the 4096 row streams length-4/5 table rows from
HBM; a W=1024 group-8 row is fully resident).

Usage: python benchmarks/span_tail.py
"""

from __future__ import annotations

import json
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

CORES = [4096, 2048, 1024, 965, 923, 889, 856, 832]
NSEQS, L = 64, 512
W = 1024


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


def time_scores(run, sync):
    out = run()
    sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = run()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / 4)
    return best, out


def main() -> None:
    print("backend", jax.default_backend(), flush=True)
    profiles = [
        build_profile(random_h3(s + 1, k, peak=0.8))
        for s, k in enumerate(CORES)
    ]
    eidx, slen = batch()
    true_cells = 3.0 * NSEQS * L * float(sum(CORES))

    # classic tail: one slot per profile at kpad 4096, group 8, regime B
    pb_old = vp.PallasBlock.from_profiles(profiles, kpad=4096, group=8)
    nseq = vp.pick_nseq(NSEQS, vp.nseq_cap(pb_old.kpad, pb_old.group))
    si_o, sl_o, S_o = vp.make_seqinfo(eidx, slen, nseq=nseq)
    si_o, sl_o = jnp.asarray(si_o), jnp.asarray(sl_o)
    dt_old, out_old = time_scores(
        lambda: pb_old.scores(si_o, sl_o, S_o),
        lambda o: float(np.asarray(o[0])[0, 0]),
    )

    # slotspan: W=1024 rows; profiles span 4/2/1/... slots
    rows = vp.PallasBlock.from_span_rows(profiles, W=W, group=8)
    packs = []
    for pb, pids in rows:
        ns = vp.pick_nseq(NSEQS, vp.nseq_cap(pb.kpad, pb.group))
        si, sl, S = vp.make_seqinfo(eidx, slen, nseq=ns)
        packs.append((pb, pids, jnp.asarray(si), jnp.asarray(sl), S))

    def run_span():
        return [
            (pb.scores(si, sl, S), pids)
            for pb, pids, si, sl, S in packs
        ]

    dt_new, out_new = time_scores(
        run_span, lambda o: float(np.asarray(o[-1][0][0])[0, 0])
    )

    # parity: reassemble spans output in profile order
    alt_old = np.asarray(out_old[0])[:NSEQS]
    alt_new = np.full_like(alt_old, np.nan)
    for (a, _), pids in [(o, p) for (o, p) in out_new]:
        alt_new[:, pids] = np.asarray(a)[:NSEQS]
    err = float(np.abs(alt_new - alt_old).max())
    print(
        json.dumps(
            {
                "classic_k4096": {
                    "seconds": round(dt_old, 4),
                    "gcups_true": round(true_cells / dt_old / 1e9, 1),
                    "padded_lanes": 8 * 4096,
                },
                "slotspan_w1024": {
                    "seconds": round(dt_new, 4),
                    "gcups_true": round(true_cells / dt_new / 1e9, 1),
                    "padded_lanes": len(rows) * 8 * W,
                    "rows": len(rows),
                },
                "speedup": round(dt_old / dt_new, 2),
                "max_abs_err": err,
            }
        )
    )


if __name__ == "__main__":
    main()

"""A/B: segmented (DCP_SEG=1) vs unsegmented packing, end-to-end on-chip.

Round 4 defaulted segmentation OFF after the end-to-end A/B lost
(39.6 -> 37.4 GCUPS) despite per-tier microbench wins — the per-segment
bridge ops (seg_bcast/seg_reduce relayout chains) cost more than the
padded-work saving.  Round 5 batched the 5 per-lookback insert bridges
into one op (viterbi_pallas position loop); this harness re-runs the
decision on the same Pfam-shaped DB, interleaved rounds, min-of-N.

Usage:  python benchmarks/seg_ab.py  [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from deciphon_tpu.db.format import TensorDB, write_db  # noqa: E402
from deciphon_tpu.models.h3reader import build_profile  # noqa: E402
from deciphon_tpu.models.h3writer import random_h3  # noqa: E402
from deciphon_tpu.ops.scan_engine import (  # noqa: E402
    ScanEngine, ScanParams, SeqRecord,
)
from deciphon_tpu.utils import jaxcache  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    jaxcache.enable()
    rng = np.random.default_rng(42)
    sizes = bench.ragged_core_sizes(rng)
    profiles = (
        build_profile(random_h3(int(s) + 1, int(k), peak=0.8))
        for s, k in enumerate(sizes)
    )
    with tempfile.NamedTemporaryFile(suffix=".dtp") as fp:
        write_db(fp.name, profiles)
        db = TensorDB.load(fp.name)
    lens = rng.integers(150, 500, bench.PFAM_NSEQS)
    seqs = [
        SeqRecord(i, f"r{i}", "".join(rng.choice(list("ACGT"), int(L))))
        for i, L in enumerate(lens)
    ]
    true_cells = 3.0 * float(lens.sum()) * float(db.core_sizes.sum())

    engines = {}
    for mode in ("unseg", "seg"):
        os.environ["DCP_SEG"] = "1" if mode == "seg" else "0"
        eng = ScanEngine(db, ScanParams(lrt_threshold=10.0))
        t0 = time.perf_counter()
        eng.warmup(bench.PFAM_NSEQS, int(lens.max()))
        eng.scan(seqs)
        warm_s = time.perf_counter() - t0
        engines[mode] = eng
        nblk = len(eng._blocks)
        print(
            f"# {mode}: {nblk} blocks, warmup+first scan {warm_s:.1f}s",
            flush=True,
        )

    times: dict[str, list[float]] = {m: [] for m in engines}
    for r in range(rounds):
        for mode, eng in engines.items():
            t0 = time.perf_counter()
            eng.scan(seqs)
            dt = time.perf_counter() - t0
            times[mode].append(dt)
            print(f"# round {r} {mode}: {dt:.4f}s", flush=True)

    out = {}
    for mode, ts in times.items():
        best = min(ts)
        out[mode] = {
            "min_s": round(best, 4),
            "median_s": round(float(np.median(ts)), 4),
            "all_s": [round(t, 4) for t in ts],
            "gcups": round(true_cells / best / 1e9, 2),
            "nblocks": len(engines[mode]._blocks),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""A/B: fused single-dispatch scan vs per-block dispatches, on-chip.

VERDICT r4 #1: the r04 headline (warm Pfam-shaped scan) regressed 23.9
vs r03's 39.6 GCUPS on identical shapes and an identical kernel
(uniform_cups unchanged), so either the fused whole-scan dispatch
(DCP_FUSE_SCAN=1, default since r4) is slower than r3's per-block path
under the relay, or the single-sample bench timing was noise.  This
harness answers it directly: same DB, same reads, same process — one
engine per mode, min-of-N warm scans each, interleaved rounds so host
drift hits both modes equally.

Usage:  python benchmarks/fuse_ab.py  [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the Pfam-shaped DB builder)
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
    for mode in ("fused", "perblock"):
        os.environ["DCP_FUSE_SCAN"] = "1" if mode == "fused" else "0"
        eng = ScanEngine(db, ScanParams(lrt_threshold=10.0))
        t0 = time.perf_counter()
        eng.warmup(bench.PFAM_NSEQS, int(lens.max()))
        eng.scan(seqs)  # first scan: any residual compiles
        warm_s = time.perf_counter() - t0
        engines[mode] = eng
        print(f"# {mode}: warmup+first scan {warm_s:.1f}s", flush=True)

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
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Scan-throughput benchmark.

Measures the hot path — batched null+alt codon-frame Viterbi over a
profile block — on the default JAX backend (the real TPU chip under the
driver; CPU if forced) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Cell-updates are counted HMMER-GCUPS-style on *unpadded* sizes:
  cells = nseqs x nprofiles x seq_len x core_size x 3 (M/I/D) x 2 (null+alt
  hypotheses share the scan, counted once: x1).

The reference publishes no performance numbers (BASELINE.md), so
vs_baseline compares against this host's JAX-CPU run of the same engine —
a stand-in for the reference's optimized-C CPU worker on these shapes —
measured once and cached in benchmarks/cpu_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CPU_BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "benchmarks",
    "cpu_baseline.json",
)

# Pfam-like shapes, sized to finish fast even over a tunneled chip.
NPROFILES = int(os.environ.get("BENCH_NPROFILES", 256))
CORE_SIZE = int(os.environ.get("BENCH_CORE_SIZE", 128))
NSEQS = int(os.environ.get("BENCH_NSEQS", 64))
SEQ_LEN = int(os.environ.get("BENCH_SEQ_LEN", 512))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))

# The CPU baseline is a per-cell *rate*, measured once at a fixed small
# shape (CPU CUPS is shape-insensitive; re-measuring at bench shapes
# would cost CPU-minutes for the same number).
BASE_SHAPE = (64, 128, 32, 384)  # nprofiles, core, nseqs, seq_len


def build_problem():
    import jax

    from deciphon_tpu.models.alphabet import DNA
    from deciphon_tpu.models.h3reader import build_profile
    from deciphon_tpu.models.h3writer import random_h3
    from deciphon_tpu.ops import viterbi_jax as vj
    from deciphon_tpu.ops.emissions import fragment_indices

    rng = np.random.default_rng(0)
    profiles = [
        build_profile(random_h3(s + 1, CORE_SIZE, peak=0.8))
        for s in range(NPROFILES)
    ]
    block = vj.build_profile_block(profiles)
    seqs = ["".join(rng.choice(list("ACGT"), SEQ_LEN)) for _ in range(NSEQS)]
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=SEQ_LEN)
            )
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    return block, jax.numpy.asarray(eidx), jax.numpy.asarray(slen)


INNER = int(os.environ.get("BENCH_INNER", 8))


def run_engine(block, eidx, slen, repeats=REPEATS, use_pallas=None):
    """Time INNER back-to-back scan dispatches (amortizing relay latency,
    as a real scan pipelines blocks) and return seconds-per-dispatch."""
    import jax

    from deciphon_tpu.ops import viterbi_jax as vj

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        from deciphon_tpu.ops import viterbi_pallas as vp

        pb = vp.PallasBlock(block)
        seqinfo, seqlens, S = vp.make_seqinfo(
            np.asarray(eidx), np.asarray(slen)
        )
        seqinfo = jax.numpy.asarray(seqinfo)
        seqlens = jax.numpy.asarray(seqlens)

        def step():
            return pb.scores(seqinfo, seqlens, S)

    else:

        def step():
            return vj.viterbi_scores(block, eidx, slen)

    def sync(out):
        # device-to-host scalar transfer: a hard completion barrier even
        # under remote-execution relays where block_until_ready can
        # under-report
        return float(np.asarray(out[0][0, 0]))

    # warmup/compile
    out = step()
    sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(INNER):
            out = step()
        sync(out)
        times.append((time.perf_counter() - t0) / INNER)
    return min(times), out


def cells() -> float:
    return float(NSEQS) * NPROFILES * SEQ_LEN * CORE_SIZE * 3


def measure_cpu_baseline() -> float:
    """CUPS of the same engine pinned to CPU at BASE_SHAPE, cached."""
    if os.path.exists(CPU_BASELINE_PATH):
        with open(CPU_BASELINE_PATH) as fp:
            cached = json.load(fp)
        if cached.get("shape") == list(BASE_SHAPE):
            return float(cached["cups"])
    import subprocess

    code = (
        "import jax, json; jax.config.update('jax_platforms','cpu');"
        "import bench; b,e,s = bench.build_problem();"
        "dt,_ = bench.run_engine(b,e,s,repeats=1,use_pallas=False);"
        "print(json.dumps({'cups': bench.cells()/dt}))"
    )
    env = dict(os.environ)
    env["BENCH_NPROFILES"] = str(BASE_SHAPE[0])
    env["BENCH_CORE_SIZE"] = str(BASE_SHAPE[1])
    env["BENCH_NSEQS"] = str(BASE_SHAPE[2])
    env["BENCH_SEQ_LEN"] = str(BASE_SHAPE[3])
    env["BENCH_INNER"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    cups = float(json.loads(line)["cups"])
    os.makedirs(os.path.dirname(CPU_BASELINE_PATH), exist_ok=True)
    with open(CPU_BASELINE_PATH, "w") as fp:
        json.dump({"cups": cups, "shape": list(BASE_SHAPE)}, fp)
    return cups


def check_parity(block, eidx, slen, out) -> float:
    """Guard the reported number: kernel scores must match the XLA engine
    on a subsample (wrong-answer-fast must fail the bench)."""
    from deciphon_tpu.ops import viterbi_jax as vj

    sub_e = eidx[:4]
    sub_l = slen[:4]
    ref_alt, ref_null = vj.viterbi_scores(block, sub_e, sub_l)
    alt = np.asarray(out[0])[:4, :]
    err = float(
        max(
            np.abs(alt - np.asarray(ref_alt)).max(),
            np.abs(np.asarray(out[1])[:4] - np.asarray(ref_null)).max(),
        )
    )
    if err > 1e-2:
        raise SystemExit(f"bench parity FAILED: max err {err}")
    return err


# ---------------------------------------------------------------------------
# Pfam-shaped ragged bench (BASELINE.json configs 3-4): realistic core-size
# distribution through the FULL ScanEngine, reporting GCUPS + reads/sec +
# padding efficiency.  See docs/PERFORMANCE.md for the roofline context.
# ---------------------------------------------------------------------------

PFAM_NPROF = int(os.environ.get("BENCH_PFAM_NPROF", 384))
# 256 reads per scan batch: enough to amortize per-scan fixed costs
# (fused dispatch round trip, concatenated result pull), small enough
# that the per-scan seqinfo upload (~10.5 MB/kernel-tier per 1024
# reads) doesn't serialize ahead of compute on the tunneled relay —
# measured 2.05 ms/read at 256 vs 2.28 ms/read at 1024
# (BENCH_PFAM_NSEQS=1024; on directly-attached chips the bigger batch
# should win back its better stack packing).
PFAM_NSEQS = int(os.environ.get("BENCH_PFAM_NSEQS", 256))


def ragged_core_sizes(rng) -> np.ndarray:
    """Pfam-like core-size draw: lognormal (median ~150, sigma 0.8 — the
    bulk of Pfam-A lands in 30-600) clipped to the reference envelope,
    plus forced 1024/2048/4096 outliers so the HBM-streaming regime is in
    the measurement (PROTEIN_MODEL_CORE_SIZE_MAX, core/limits.h:11)."""
    tail = [1024, 2048, 4096] if PFAM_NPROF >= 64 else []
    sizes = np.exp(rng.normal(np.log(150.0), 0.8, PFAM_NPROF - len(tail)))
    sizes = np.clip(sizes, 16, 4096).astype(np.int64)
    return np.concatenate([sizes, tail]).astype(np.int64)


def pfam_bench():
    """(gcups, reads_per_sec, padding_efficiency, detail) on the ragged DB."""
    import tempfile

    from deciphon_tpu.db.format import TensorDB, write_db
    from deciphon_tpu.models.h3reader import build_profile
    from deciphon_tpu.models.h3writer import random_h3
    from deciphon_tpu.ops.scan_engine import (
        ScanEngine, ScanParams, SeqRecord, pad_seq_len,
    )

    rng = np.random.default_rng(42)
    sizes = ragged_core_sizes(rng)
    t0 = time.perf_counter()
    profiles = (
        build_profile(random_h3(int(s) + 1, int(k), peak=0.8))
        for s, k in enumerate(sizes)
    )
    with tempfile.NamedTemporaryFile(suffix=".dtp") as fp:
        write_db(fp.name, profiles)
        db = TensorDB.load(fp.name)
    press_s = time.perf_counter() - t0
    # short metagenomic-style reads, one 255-chunk length bucket
    lens = rng.integers(150, 500, PFAM_NSEQS)
    seqs = [
        SeqRecord(i, f"r{i}", "".join(rng.choice(list("ACGT"), int(L))))
        for i, L in enumerate(lens)
    ]
    engine = ScanEngine(db, ScanParams(lrt_threshold=10.0))
    # cold start = parallel AOT compile of every kernel variant + first
    # scan (table pack + upload + any traceback compiles)
    t0 = time.perf_counter()
    compile_s = engine.warmup(PFAM_NSEQS, int(lens.max()))
    engine.scan(seqs)
    cold_s = time.perf_counter() - t0
    # min-of-N warm scans: a single timing conflated host jitter with
    # engine speed (the r04 headline regressed 40% on an identical
    # kernel purely from one noisy measurement: r05 re-measures of the
    # same configs spread 0.51-1.12 s across relay sessions).  Seven
    # samples cost ~4 s and bound the headline's noise; all recorded.
    scan_times = []
    for _ in range(int(os.environ.get("BENCH_PFAM_REPEATS", 7))):
        t0 = time.perf_counter()
        engine.scan(seqs)
        scan_times.append(time.perf_counter() - t0)
    dt = min(scan_times)

    len_sum = int(lens.sum())
    true_cells = 3.0 * len_sum * float(db.core_sizes.sum())
    # padded work actually dispatched: per block, group-padded profile
    # rows x kpad lanes; per stack of nseq length-sorted reads, positions
    # computed = that stack's longest read (kernel stops per stack)
    from deciphon_tpu.ops import viterbi_pallas as vp

    slens = np.sort(lens)[::-1]

    def stack_positions(nseq: int) -> float:
        tot = 0.0
        for i in range(0, PFAM_NSEQS, nseq):
            m = int(slens[i : i + nseq].max())
            tot += nseq * ((m + 4) // 5 * 5)
        return tot

    padded = 0.0
    for blk in engine._blocks:
        nseq = vp.pick_nseq(PFAM_NSEQS, vp.nseq_cap(blk.klanes, blk.group))
        padded += 3.0 * blk.row_lane_units * stack_positions(nseq)
    detail = {
        "nprofiles": len(sizes),
        "core_min": int(sizes.min()),
        "core_median": int(np.median(sizes)),
        "core_max": int(sizes.max()),
        "nseqs": PFAM_NSEQS,
        "len_bucket": int(pad_seq_len(int(lens.max()))),
        "nblocks": len(engine._blocks),
        "seconds": dt,
        "scan_seconds_all": [round(t, 4) for t in scan_times],
        "press_seconds": press_s,
        "compile_seconds": compile_s,
        "cold_seconds": cold_s,
    }
    return true_cells / dt, PFAM_NSEQS / dt, true_cells / padded, detail


def main() -> None:
    import jax

    from deciphon_tpu.utils import jaxcache

    jaxcache.enable()  # persistent XLA cache across bench runs

    block, eidx, slen = build_problem()
    dt, out = run_engine(block, eidx, slen)
    err = check_parity(block, eidx, slen, out)
    uniform_cups = cells() / dt
    backend = jax.default_backend()

    if os.environ.get("BENCH_SKIP_PFAM"):
        cups, reads_per_sec, pad_eff, pfam_detail = uniform_cups, None, None, {}
    else:
        cups, reads_per_sec, pad_eff, pfam_detail = pfam_bench()

    try:
        if backend == "cpu":
            base = uniform_cups
        else:
            base = measure_cpu_baseline()
        vs = cups / base
    except Exception:  # noqa: BLE001 — baseline is best-effort
        vs = 1.0
    print(
        json.dumps(
            {
                "metric": "pfam_scan_cell_updates_per_sec",
                "value": cups,
                "unit": "CUPS",
                "vs_baseline": vs,
                "detail": {
                    "backend": backend,
                    "reads_per_sec": reads_per_sec,
                    "padding_efficiency": pad_eff,
                    "pfam": pfam_detail,
                    "uniform_cups": uniform_cups,
                    "uniform_shape": {
                        "nprofiles": NPROFILES,
                        "core_size": CORE_SIZE,
                        "nseqs": NSEQS,
                        "seq_len": SEQ_LEN,
                        "seconds": dt,
                    },
                    "parity_err_vs_xla": err,
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""D-chain roll-elision ablation (docs/PERFORMANCE.md).

The kernel's dominant per-position cost is the Hillis-Steele prefix
cummax over lanes — log2(K) serial pltpu.roll ops.  This harness bounds
what ANY D-chain optimization could recover by timing the kernel with
the scan elided entirely (dchain="off": VD pinned to NEG — wrong
numerics, timing only) against the production kernel, across core-size
tiers and sequence stacks.

Run on the real chip:  python benchmarks/dchain_ablation.py
Prints one JSON object; the verdict rule from VERDICT r2 #10: pursue a
blocked-scan variant only if the *upper bound* clears 75 GCUPS uniform.
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


def run_case(nprofiles, core, nseqs, seq_len, dchain, repeats=3, inner=8,
             ablate="none"):
    import jax
    import jax.numpy as jnp

    from deciphon_tpu.models.alphabet import DNA
    from deciphon_tpu.models.h3reader import build_profile
    from deciphon_tpu.models.h3writer import random_h3
    from deciphon_tpu.ops import viterbi_jax as vj
    from deciphon_tpu.ops import viterbi_pallas as vp
    from deciphon_tpu.ops.emissions import fragment_indices

    rng = np.random.default_rng(0)
    profiles = [
        build_profile(random_h3(s + 1, core, peak=0.8))
        for s in range(nprofiles)
    ]
    block = vj.build_profile_block(profiles)
    seqs = ["".join(rng.choice(list("ACGT"), seq_len)) for _ in range(nseqs)]
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=seq_len)
            )
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    pb = vp.PallasBlock(block)
    seqinfo, seqlens, S = vp.make_seqinfo(
        eidx, slen, nseq=vp.pick_nseq(nseqs, vp.nseq_cap(pb.kpad))
    )
    seqinfo = jnp.asarray(seqinfo)
    seqlens = jnp.asarray(seqlens)

    def step():
        return pb.scores(seqinfo, seqlens, S, dchain=dchain,
                         ablate=ablate)

    out = step()
    float(np.asarray(out[0][0, 0]))  # sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = step()
        float(np.asarray(out[0][0, 0]))
        times.append((time.perf_counter() - t0) / inner)
    cells = 3.0 * nseqs * nprofiles * seq_len * core
    return cells / min(times)


def main():
    from deciphon_tpu.utils import jaxcache

    jaxcache.enable()
    import sys

    cases = [
        # (nprofiles, core, nseqs, seq_len)
        (256, 128, 64, 512),
        (64, 512, 64, 512),
        (16, 2048, 16, 512),
    ]
    if "--small-k" in sys.argv:
        # the per-component op-mix split at the slow small-K tier
        # (VERDICT r5 #2): every ablation is wrong-numerics timing-only
        shape = (256, 128, 64, 512)
        out = {"shape": shape}
        for name, kw in (
            ("full", {}),
            ("no_dchain", dict(dchain="off")),
            ("no_emis_m", dict(ablate="emis_m")),
            ("no_emis_in", dict(ablate="emis_in")),
            ("no_emis", dict(ablate="emis")),
            ("no_dchain_no_emis", dict(dchain="off", ablate="emis")),
        ):
            out[name] = round(run_case(*shape, **{"dchain": "scan", **kw})
                              / 1e9, 2)
        print(json.dumps(out, indent=1))
        return
    out = {}
    for shape in cases:
        base = run_case(*shape, dchain="scan")
        off = run_case(*shape, dchain="off")
        key = f"{shape[0]}x{shape[1]}core_{shape[2]}x{shape[3]}nt"
        out[key] = {
            "scan_gcups": base / 1e9,
            "noscan_gcups": off / 1e9,
            "dchain_share": 1.0 - base / off,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Float-width matrix: the XLA engine in f64 must match the f64 oracle
tightly (the analogue of the reference CI's IMM_DOUBLE_PRECISION axis,
/root/reference/.github/workflows/test.yml).

Run with JAX_ENABLE_X64=1 (the CI f64 job does); skipped otherwise so the
default f32 suite stays representative of production.
"""

import os

import numpy as np
import pytest

x64 = os.environ.get("JAX_ENABLE_X64", "") not in ("", "0", "false")
pytestmark = pytest.mark.skipif(not x64, reason="JAX_ENABLE_X64 not set")


def test_f64_engine_matches_oracle_tightly():
    import jax

    jax.config.update("jax_enable_x64", True)
    from deciphon_tpu.models.alphabet import DNA
    from deciphon_tpu.models.profile import sample_profile
    from deciphon_tpu.ops import viterbi_jax as vj
    from deciphon_tpu.ops import viterbi_ref as vr
    from deciphon_tpu.ops.emissions import fragment_indices

    rng = np.random.default_rng(23)
    profs = [sample_profile(s + 1, int(rng.integers(2, 9))) for s in range(4)]
    block = vj.build_profile_block(profs, dtype=np.float64)
    assert block.fm.dtype == np.float64
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(8, 30))))
        for _ in range(4)
    ]
    lp = 32
    eidx = np.stack(
        [
            vj.end_fragment_indices(fragment_indices(DNA.encode(s), pad_to=lp))
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    alt, null = vj.viterbi_scores(block, eidx, slen)
    falt, fnull = vj.forward_scores(block, eidx, slen)
    for si, s in enumerate(seqs):
        enc = DNA.encode(s)
        for bi, prof in enumerate(profs):
            # f64 vs f64: orders of magnitude tighter than the f32 suite
            assert float(alt[si, bi]) == pytest.approx(
                vr.viterbi_alt(prof, enc).loglik, abs=1e-9
            )
            assert float(null[si, bi]) == pytest.approx(
                vr.viterbi_null(prof, enc).loglik, abs=1e-9
            )
            assert float(falt[si, bi]) == pytest.approx(
                vr.forward_alt(prof, enc), abs=1e-8
            )
            assert float(fnull[si, bi]) == pytest.approx(
                vr.forward_null(prof, enc), abs=1e-8
            )

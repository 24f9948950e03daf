"""Forward algorithm (logsumexp semiring): oracle, XLA engine, Pallas.

The reference (like imm) only runs Viterbi; forward is the BASELINE.md
north-star extension.  Validation ladder: exhaustive path enumeration ->
f64 numpy oracle -> f32 XLA engine -> Pallas kernel (interpret mode).
"""

import numpy as np
import pytest

from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops.emissions import fragment_indices


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(5)
    profs = [sample_profile(s + 1, int(rng.integers(2, 4))) for s in range(3)]
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(3, 7))))
        for _ in range(3)
    ]
    return profs, seqs


def test_forward_oracle_matches_brute_force(tiny):
    """f64 DP forward == exhaustive logsumexp over every path."""
    profs, seqs = tiny
    for prof in profs:
        for s in seqs:
            enc = DNA.encode(s)
            want = vr.brute_force_forward(prof, enc)
            got = vr.forward_alt(prof, enc)
            assert got == pytest.approx(want, abs=1e-8), (prof.accession, s)


def test_forward_exceeds_viterbi(tiny):
    """Total path mass >= best path, strictly when >1 path exists."""
    profs, seqs = tiny
    for prof in profs:
        for s in seqs:
            enc = DNA.encode(s)
            vit = vr.viterbi_alt(prof, enc).loglik
            fwd = vr.forward_alt(prof, enc)
            assert fwd >= vit - 1e-9
            assert vr.forward_null(prof, enc) >= vr.viterbi_null(
                prof, enc
            ).loglik - 1e-9


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(9)
    profs = [sample_profile(s + 1, int(rng.integers(2, 9))) for s in range(6)]
    block = vj.build_profile_block(profs)
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(8, 24))))
        for _ in range(5)
    ]
    lp = 24
    eidx = np.stack(
        [
            vj.end_fragment_indices(fragment_indices(DNA.encode(s), pad_to=lp))
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    return profs, seqs, block, eidx, slen


def test_forward_engine_matches_oracle(batch):
    profs, seqs, block, eidx, slen = batch
    alt, null = vj.forward_scores(block, eidx, slen)
    alt = np.asarray(alt)
    null = np.asarray(null)
    for si, s in enumerate(seqs):
        enc = DNA.encode(s)
        for bi, prof in enumerate(profs):
            assert alt[si, bi] == pytest.approx(
                vr.forward_alt(prof, enc), abs=2e-3
            )
            assert null[si, bi] == pytest.approx(
                vr.forward_null(prof, enc), abs=2e-3
            )


def test_forward_pallas_matches_engine(batch):
    from deciphon_tpu.ops import viterbi_pallas as vp

    profs, seqs, block, eidx, slen = batch
    ref_alt, ref_null = vj.forward_scores(block, eidx, slen)
    # kernel packs to a 255-position chunk; re-pad eidx accordingly
    lp = 255
    from deciphon_tpu.models.frame import FRAG_SENTINEL

    eidx_p = np.full((len(seqs), lp, 5), FRAG_SENTINEL, np.int32)
    eidx_p[:, : eidx.shape[1]] = eidx
    alt, null = vp.viterbi_scores_pallas(
        block, eidx_p, slen, interpret=True, semiring="logsumexp"
    )
    np.testing.assert_allclose(alt, np.asarray(ref_alt), atol=2e-3)
    np.testing.assert_allclose(null, np.asarray(ref_null), atol=2e-3)

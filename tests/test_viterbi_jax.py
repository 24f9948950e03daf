"""JAX scan engine vs the numpy oracle (which is itself brute-force
validated).  Sizes kept small: CPU jit of the double-vmapped scan dominates
test time."""

import numpy as np
import pytest

from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops.emissions import fragment_indices

SEQS = ["ATGAAACGC", "ACGT", "TTTCCC"]
LP = 12


@pytest.fixture(scope="module")
def setup():
    profiles = [sample_profile(1, 2), sample_profile(2, 4)]
    block = vj.build_profile_block(profiles)
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=LP)
            )
            for s in SEQS
        ]
    )
    slen = np.array([len(s) for s in SEQS], np.int32)
    return profiles, block, eidx, slen


def test_block_shapes(setup):
    profiles, block, eidx, slen = setup
    assert block.nprofiles == 2
    assert block.kpad == 4
    assert block.fm.shape == (2, 4, 1365)
    # padding nodes are dead
    assert float(block.entry[0, 3]) <= vj.NEG


def test_scores_match_oracle(setup):
    profiles, block, eidx, slen = setup
    alt, null = vj.viterbi_scores(block, eidx, slen)
    assert alt.shape == (3, 2) and null.shape == (3, 2)
    for si, s in enumerate(SEQS):
        enc = DNA.encode(s)
        for pi, p in enumerate(profiles):
            ra = vr.viterbi_alt(p, enc)
            rn = vr.viterbi_null(p, enc)
            assert float(alt[si, pi]) == pytest.approx(ra.loglik, abs=2e-3)
            assert float(null[si, pi]) == pytest.approx(rn.loglik, abs=2e-3)


def test_scores_match_oracle_single_hit_compat(setup):
    profiles, block, eidx, slen = setup
    alt, null = vj.viterbi_scores(
        block, eidx, slen, multi_hits=False, hmmer3_compat=True
    )
    for si, s in enumerate(SEQS[:2]):
        enc = DNA.encode(s)
        for pi, p in enumerate(profiles):
            ra = vr.viterbi_alt(
                p, enc, multi_hits=False, hmmer3_compat=True
            )
            assert float(alt[si, pi]) == pytest.approx(ra.loglik, abs=2e-3)


def test_lrt():
    assert vj.lrt(-10.0, -5.0) == pytest.approx(10.0)

"""Oracle DP vs exhaustive path enumeration — validates all transition
wiring and the variable-length-emission DP independently of any golden."""

import numpy as np
import pytest

from deciphon_tpu.models import state as st
from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import ProteinCfg, sample_profile
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops.emissions import fragment_indices
from deciphon_tpu.models.frame import FRAG_SENTINEL, frag_index


def test_fragment_indices():
    seq = DNA.encode("ACGTA")
    fidx = fragment_indices(seq)
    assert fidx.shape == (5, 5)
    assert fidx[0, 0] == frag_index(np.array([0]))
    assert fidx[0, 2] == frag_index(np.array([0, 1, 2]))
    assert fidx[0, 4] == frag_index(np.array([0, 1, 2, 3, 0]))
    assert fidx[4, 0] == frag_index(np.array([0]))
    assert fidx[4, 1] == FRAG_SENTINEL  # runs past the end
    assert fidx[3, 3] == FRAG_SENTINEL
    fpad = fragment_indices(seq, pad_to=8)
    assert fpad.shape == (8, 5)
    assert np.all(fpad[5:] == FRAG_SENTINEL)


@pytest.mark.parametrize("seed,core_size", [(1, 2), (2, 3), (3, 2)])
@pytest.mark.parametrize("multi_hits", [True, False])
def test_dp_matches_brute_force(seed, core_size, multi_hits):
    prof = sample_profile(seed, core_size)
    rng = np.random.default_rng(seed * 100)
    for _ in range(3):
        L = int(rng.integers(3, 9))
        seq = rng.integers(0, 4, L)
        r_dp = vr.viterbi_alt(prof, seq, multi_hits=multi_hits)
        r_bf = vr.brute_force_alt(prof, seq, multi_hits=multi_hits)
        assert np.isclose(r_dp.loglik, r_bf.loglik, atol=1e-9)
        # path must be a valid scoring path achieving the same loglik
        assert sum(l for _, l in r_dp.path) == L
        assert r_dp.path[0] == (st.S, 0)
        assert r_dp.path[-1] == (st.T, 0)


def test_dp_hmmer3_compat_mode():
    prof = sample_profile(4, 2)
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 7)
    r_dp = vr.viterbi_alt(prof, seq, hmmer3_compat=True)
    r_bf = vr.brute_force_alt(prof, seq, hmmer3_compat=True)
    assert np.isclose(r_dp.loglik, r_bf.loglik, atol=1e-9)


def test_null_model():
    prof = sample_profile(1, 2)
    seq = DNA.encode("ATGAAACGCATTAGCACCACCATTACCACCAC")
    res = vr.viterbi_null(prof, seq)
    assert np.isfinite(res.loglik)
    # reference path shape: 11 R steps over the 32-nt test read
    # (test/protein_profile.c:43-55 — step count is RNG-independent here
    # because the null model maximizes 3-nt codon steps)
    assert len(res.path) == 11
    assert all(sid == st.R for sid, _ in res.path)
    assert sum(l for _, l in res.path) == 32


def test_uniform_entry_runs():
    prof = sample_profile(1, 2, ProteinCfg(entry_dist="uniform", epsilon=0.1))
    seq = DNA.encode("ATGAAACGCATTAGCACCACCATTACCACCAC")
    ra = vr.viterbi_alt(prof, seq)
    rn = vr.viterbi_null(prof, seq)
    assert np.isfinite(ra.loglik) and np.isfinite(rn.loglik)
    assert ra.path[0] == (st.S, 0) and ra.path[-1] == (st.T, 0)

"""Degenerate-case proofs bounding the frame-model reconstruction risk.

The frame-state error model (models/frame.py) is a from-first-principles
reconstruction of imm's frame-state machinery (the imm sources are
unavailable; reference usage at src/model/protein_model.c:247-254).
These tests pin the reconstruction against closed forms that any correct
implementation of the published deciphon model must satisfy:

  (a) eps = 0 degeneracy: the fragment table must equal the exact codon
      distribution on length-3 fragments and be -inf everywhere else;
  (b) per-length-class mass identities: summed fragment probability per
      length must equal the closed-form error-event probabilities
      (two deletion + two insertion Bernoulli(eps) events);
  (c) eps -> 0 continuity: length-3 scores converge to the codon dist.

Plus asset-gated parity tests (skipped unless reference Pfam assets are
present) pinning the PF02545 golden -1430.9281381240353
(/root/reference/test/protein_h3reader.c:57) and press stats vs the
reference .dcp — the moment assets exist, the parity question answers
itself.
"""

import os

import numpy as np
import pytest

from deciphon_tpu.models import frame
from deciphon_tpu.models.frame import (
    FRAG_OFFSET,
    fragment_table,
    q5_pad,
    nuclt_lprob_from_codon,
    codon_marg,
)


@pytest.fixture(scope="module")
def dist():
    rng = np.random.default_rng(17)
    p = rng.dirichlet(np.ones(64))
    clp = np.log(p)
    marg = codon_marg(clp)
    q = q5_pad(nuclt_lprob_from_codon(clp))
    return clp, marg, q


def test_eps_zero_reduces_to_codon_distribution(dist):
    """(a): with no indel errors a frame state IS its codon distribution."""
    clp, marg, q = dist
    F = fragment_table(marg, q, eps=0.0)
    # every length-3 fragment scores exactly its codon log-prob
    for a in range(4):
        for b in range(4):
            for c in range(4):
                idx = frame.frag_index(np.array([a, b, c]))
                want = clp[a * 16 + b * 4 + c]
                assert F[idx] == pytest.approx(want, abs=1e-12)
    # all other lengths carry zero mass
    for length in (1, 2, 4, 5):
        off = FRAG_OFFSET[length]
        n = 4 ** length
        assert np.all(np.isneginf(F[off : off + n])), f"len {length}"


@pytest.mark.parametrize("eps", [0.0, 0.01, 0.1, 0.25])
def test_per_length_mass_identities(dist, eps):
    """(b): summed fragment mass per length == closed-form event probs.

    With two deletion and two insertion events ~ Bernoulli(eps)
    (e = eps, o = 1-eps), the emitted length is 3 - #del + #ins:

      P(len 1) = e^2 o^2            (2 del, 0 ins)
      P(len 2) = 2 e o^3 + 2 e^3 o  (1d0i + 2d1i)
      P(len 3) = o^4 + 4 e^2 o^2 + e^4
      P(len 4) = 2 e o^3 + 2 e^3 o  (0d1i + 1d2i)
      P(len 5) = e^2 o^2            (0 del, 2 ins)
    """
    clp, marg, q = dist
    e, o = eps, 1.0 - eps
    want = {
        1: e * e * o * o,
        2: 2 * e * o**3 + 2 * e**3 * o,
        3: o**4 + 4 * e * e * o * o + e**4,
        4: 2 * e * o**3 + 2 * e**3 * o,
        5: e * e * o * o,
    }
    F = fragment_table(marg, q, eps=eps)
    for length in range(1, 6):
        off = FRAG_OFFSET[length]
        n = 4 ** length
        with np.errstate(over="ignore"):
            mass = float(np.exp(F[off : off + n]).sum())
        assert mass == pytest.approx(want[length], abs=1e-12), f"len {length}"
    # total normalization (redundant with per-class, kept as the anchor)
    assert sum(want.values()) == pytest.approx(1.0, abs=1e-12)


def test_eps_continuity(dist):
    """(c): scores vary smoothly in eps near 0 (no branch artifacts)."""
    clp, marg, q = dist
    f0 = fragment_table(marg, q, eps=1e-9)
    off3 = FRAG_OFFSET[3]
    np.testing.assert_allclose(
        f0[off3 : off3 + 64], clp, atol=1e-7
    )


# ---------------------------------------------------------------------------
# Asset-gated reference parity (skipped unless Pfam assets are present).
# Drop the files into tests/assets/ (or set DCP_TEST_ASSETS) to activate:
#   PF02545.hmm — from https://uk1s3.embassy.ebi.ac.uk/deciphon
#   PF02545.dcp — reference-pressed counterpart
# ---------------------------------------------------------------------------

ASSETS = os.environ.get(
    "DCP_TEST_ASSETS", os.path.join(os.path.dirname(__file__), "assets")
)
PF_HMM = os.path.join(ASSETS, "PF02545.hmm")
PF_DCP = os.path.join(ASSETS, "PF02545.dcp")

# the 1023-nt consensus-derived read of test/protein_h3reader.c:31-56 is
# built from the profile itself (most-likely codon per node), mirroring
# the reference test's construction.
PF02545_GOLDEN_ALT = -1430.9281381240353  # protein_h3reader.c:57
PF02545_HMM_XXH3 = -7843725841264658444  # test/sched.c:92


@pytest.mark.skipif(not os.path.exists(PF_HMM), reason="PF02545.hmm absent")
def test_pf02545_hmm_press_and_golden():
    from deciphon_tpu.models.alphabet import STANDARD_CODE
    from deciphon_tpu.models.h3reader import press_file
    from deciphon_tpu.ops import viterbi_ref as vr
    from deciphon_tpu.utils import xfile

    assert xfile.xxh3_64(PF_HMM) == PF02545_HMM_XXH3
    prof = next(iter(press_file(PF_HMM)))
    assert prof.core_size == 341  # PF02545 model length
    read = "".join(
        STANDARD_CODE.codon_str(b // 16, (b // 4) % 4, b % 4)
        for b in np.argmax(prof.match_codonp, axis=1)
    )
    assert len(read) == 1023
    from deciphon_tpu.models.alphabet import DNA

    res = vr.viterbi_alt(prof, DNA.encode(read))
    # pinned with a documented tolerance: f64 oracle vs imm's accumulation
    assert res.loglik == pytest.approx(PF02545_GOLDEN_ALT, abs=1e-3)


@pytest.mark.skipif(not os.path.exists(PF_DCP), reason="PF02545.dcp absent")
def test_pf02545_press_matches_reference_dcp():
    """Structural press parity: our press of PF02545.hmm must agree with
    the reference .dcp on profile count, accessions, and core sizes."""
    from deciphon_tpu.db.dcp import read_dcp
    from deciphon_tpu.models.h3reader import press_file

    info = read_dcp(PF_DCP)
    ours = list(press_file(PF_HMM)) if os.path.exists(PF_HMM) else None
    assert info.nprofiles >= 1
    if ours is not None:
        assert info.nprofiles == len(ours)
        for meta, prof in zip(info.profiles, ours):
            assert meta.accession == prof.accession
            assert meta.core_size == prof.core_size

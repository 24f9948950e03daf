"""Frame-state emission model invariants.

The strongest available correctness anchor (the reference's formulas live in
the unavailable imm sources): the emission model must be a proper probability
distribution over variable-length fragments, both marginally and conditioned
on every codon, for any codon distribution and epsilon.
"""

import numpy as np
import pytest

from deciphon_tpu.models import frame
from deciphon_tpu.models.alphabet import STANDARD_CODE


@pytest.fixture(scope="module")
def dists():
    rng = np.random.default_rng(42)
    out = []
    for _ in range(3):
        a = rng.random(20)
        lp = np.log(a / a.sum())
        codonp = frame.codon_lprob_from_amino(lp)
        q = frame.q5_pad(frame.nuclt_lprob_from_codon(codonp))
        M = frame.codon_marg(codonp)
        out.append((codonp, q, M))
    return out


def test_codon_lift_normalized(dists):
    for codonp, q, M in dists:
        assert np.isclose(np.exp(codonp).sum(), 1.0)
        # stop codons have zero probability
        stops = STANDARD_CODE.aa_of < 0
        assert np.all(np.isneginf(codonp[stops]))
        assert np.isclose(np.exp(q[:4]).sum(), 1.0)
        assert q[4] == 0.0
        # the all-any marginal is 1
        assert np.isclose(np.exp(M[124]), 1.0)


@pytest.mark.parametrize("eps", [0.0, 0.01, 0.1, 0.5])
def test_fragment_table_normalized(dists, eps):
    for codonp, q, M in dists:
        F = frame.fragment_table(M, q, eps)
        assert F.shape == (1365,)
        assert np.isneginf(F[frame.FRAG_SENTINEL])
        assert np.isclose(np.exp(F[:-1]).sum(), 1.0, atol=1e-12)
        if eps == 0.0:
            # no indels: only length-3 fragments possible
            mask = np.zeros(1364, dtype=bool)
            mask[frame.FRAG_OFFSET[3]:frame.FRAG_OFFSET[4]] = True
            assert np.exp(F[:-1])[~mask].sum() == 0.0


def test_conditional_normalized(dists):
    codonp, q, M = dists[0]
    eps = 0.2
    total = np.zeros(64)
    for ln in range(1, 6):
        for fr in frame._enumerate_frags(ln):
            total += np.exp(frame.loglik_given_codon(fr, q, eps))
    assert np.allclose(total, 1.0, atol=1e-9)


def test_marginal_consistent_with_conditional(dists):
    """p(Z) == sum_x p(x) p(Z|x): the table path and the conditional path
    implement the same model."""
    codonp, q, M = dists[1]
    eps = 0.1
    F = frame.fragment_table(M, q, eps)
    rng = np.random.default_rng(0)
    for _ in range(20):
        ln = int(rng.integers(1, 6))
        fr = rng.integers(0, 4, ln)
        direct = np.exp(F[frame.frag_index(fr)])
        via_cond = np.exp(
            codonp + frame.loglik_given_codon(fr, q, eps)
        ).sum()
        assert np.isclose(direct, via_cond, rtol=1e-12)


def test_batched_fragment_table(dists):
    codonp, q, M = dists[0]
    Ms = np.stack([d[2] for d in dists])
    qs = np.stack([d[1] for d in dists])
    Fb = frame.fragment_table(Ms, qs, 0.05)
    for i, (codonp, q, M) in enumerate(dists):
        F = frame.fragment_table(M, q, 0.05)
        assert np.allclose(Fb[i], F)


def test_decode_recovers_exact_codon(dists):
    codonp, q, M = dists[0]
    fr = np.array([0, 3, 2])  # "ATG"
    a, b, c = frame.decode_codon(fr, codonp, q, 0.01)
    assert (a, b, c) == (0, 3, 2)


def test_frag_index_layout():
    assert frame.frag_index(np.array([0])) == 0
    assert frame.frag_index(np.array([3])) == 3
    assert frame.frag_index(np.array([0, 0])) == 4
    assert frame.frag_index(np.array([3, 3])) == 19
    assert frame.frag_index(np.array([0, 0, 0])) == 20
    assert frame.frag_index(np.array([3, 3, 3, 3, 3])) == 1363


def test_fragment_matrix_matches_term_loop():
    """The GEMM form of the fragment scores equals the per-term loop."""
    rng = np.random.default_rng(11)
    for eps in (0.01, 0.1):
        for _ in range(3):
            marg = rng.random(125)
            marg /= marg.sum()
            lmarg = np.log(marg)
            # sentinel positions (index 4 in any slot) mimic real margs
            q = rng.random(4)
            q /= q.sum()
            lq = np.concatenate([np.log(q), [0.0]])
            a = frame.fragment_table(lmarg, lq, eps)
            b = frame.fragment_table_terms(lmarg, lq, eps)
            np.testing.assert_allclose(a, b, atol=1e-12)


# ---------------------------------------------------------------------------
# Extended (partially-degenerate IUPAC) tables
# ---------------------------------------------------------------------------


def test_ext_codes_n_equals_base5(dists):
    """codes=('N',) extended tables must equal the base-5 N tables."""
    codonp, q, M = dists[0]
    t5 = frame.fragment_table(M, q, 0.01, base=5)
    te = frame.fragment_table_codes(codonp, q, 0.01, ("N",))
    np.testing.assert_allclose(te, t5, atol=1e-12)


@pytest.mark.parametrize("code", ["R", "Y", "S", "W", "K", "M", "B", "H"])
def test_ext_code_is_exact_subset_sum(dists, code):
    """A fragment with a degenerate symbol scores as the exact sum of
    the fragment probability over the symbol's nucleotide subset."""
    codonp, q, M = dists[1]
    eps = 0.05
    codes = (code,)
    te = frame.fragment_table_codes(codonp, q, eps, codes)
    t4 = frame.fragment_table(M, q, eps, base=4)
    subset = frame.IUPAC_SUBSETS[code]
    rng = np.random.default_rng(3)
    for length in (1, 2, 3, 4, 5):
        for _ in range(4):
            frag = rng.integers(0, 4, length)
            pos = int(rng.integers(0, length))
            frag_amb = frag.copy()
            frag_amb[pos] = 4  # the code symbol
            want = 0.0
            for b in subset:
                f = frag.copy()
                f[pos] = b
                want += np.exp(t4[frame.frag_index(f, base=4)])
            got = np.exp(te[frame.frag_index(frag_amb, base=5)])
            np.testing.assert_allclose(got, want, rtol=1e-10)


def test_ext_two_codes_layout(dists):
    """Two distinct codes in one batch: base-6 layout, each exact."""
    codonp, q, M = dists[2]
    eps = 0.01
    codes = ("N", "R")  # sorted order as encode_extended produces
    te = frame.fragment_table_codes(codonp, q, eps, codes)
    t4 = frame.fragment_table(M, q, eps, base=4)
    assert te.shape[-1] == frame.frag_layout(6)[1] + 1
    # fragment (R, N, A) of length 3 = sum over R's subset x all 4
    want = 0.0
    for r in frame.IUPAC_SUBSETS["R"]:
        for n in range(4):
            want += np.exp(t4[frame.frag_index(np.array([r, n, 0]))])
    got = np.exp(te[frame.frag_index(np.array([5, 4, 0]), base=6)])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_loglik_given_codon_subset_consistency(dists):
    """Conditional x prior marginalization still matches the extended
    marginal table when the fragment holds a degenerate code."""
    codonp, q, M = dists[0]
    eps = 0.05
    codes = ("Y",)
    te = frame.fragment_table_codes(codonp, q, eps, codes)
    frag = np.array([2, 4, 1])  # G, Y, C
    cond = frame.loglik_given_codon(frag, q, eps, codes)
    marg = np.log(np.sum(np.exp(np.asarray(codonp) + cond)))
    np.testing.assert_allclose(
        marg, te[frame.frag_index(frag, base=5)], rtol=1e-10
    )


def test_encode_extended():
    from deciphon_tpu.models.alphabet import encode_extended

    enc, codes = encode_extended("ACGTU")
    assert codes == ()
    assert enc.tolist() == [0, 1, 2, 3, 3]
    enc, codes = encode_extended("ANRX")
    assert codes == ("N", "R")
    assert enc.tolist() == [0, 4, 5, 4]  # X folds into N
    enc, codes = encode_extended("yA")
    assert codes == ("Y",)
    assert enc.tolist() == [4, 0]
    with pytest.raises(ValueError):
        encode_extended("AZ")


@pytest.mark.parametrize("eps", [0.0, 0.01, 0.1, 0.33])
def test_conditional_marginal_random_audit(eps):
    """Random-distribution audit (docs/FRAME_MODEL.md): fragment_table
    and loglik_given_codon agree as marginal/conditional of one joint
    for arbitrary independent p (codon) and q (background), across eps —
    including eps=0 (exact-codon degeneracy)."""
    rng = np.random.default_rng(int(eps * 1000) + 7)
    for _ in range(3):
        codonp = np.log(rng.dirichlet(np.ones(64)))
        # q independent of the codon distribution (adversarial)
        q = frame.q5_pad(np.log(rng.dirichlet(np.ones(4))))
        M = frame.codon_marg(codonp)
        with np.errstate(divide="ignore"):
            F = frame.fragment_table(M, q, eps)
        for _ in range(8):
            ln = int(rng.integers(1, 6))
            fr = rng.integers(0, 4, ln)
            with np.errstate(divide="ignore"):
                direct = np.exp(F[frame.frag_index(fr)])
                via = np.exp(
                    codonp + frame.loglik_given_codon(fr, q, eps)
                ).sum()
            assert np.isclose(direct, via, rtol=1e-10, atol=1e-300)

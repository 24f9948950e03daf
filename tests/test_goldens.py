"""Pinned golden log-likelihoods.

The reference pins exact Viterbi scores for seeded sampled profiles
(test/protein_profile.c:41,65,133,157 — its literals depend on imm's
private RNG and cannot be reproduced without imm, per SURVEY.md §6).
These are OUR framework's equivalents: literals computed once from the
f64 oracle (itself validated against exhaustive path enumeration in
test_viterbi_ref.py) and asserted against every engine, so any silent
semantic drift in the model math — even one that shifts oracle and
engines together — fails loudly here.
"""

import numpy as np
import pytest

from deciphon_tpu.models import state as st
from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops import viterbi_trace as vt
from deciphon_tpu.ops.emissions import fragment_indices

SEQ = "ATGAAACGCATTAGCACCACCATTACCACCACC"  # 33 nt

# oracle f64 values for sample_profile(seed=1, core_size=2) vs SEQ
G_NULL = -48.31003990859557
G_ALT_MULTI = -55.182580195391196
G_ALT_H3 = -54.3739077072179
# sample_profile(seed=7, core_size=3) vs 21-nt read
SEQ2 = "ATGGCCATTGTAATGGGCCGC"
G2_ALT = -36.07423150012888
G2_NULL = -28.826325847322124


@pytest.fixture(scope="module")
def prof():
    return sample_profile(1, 2)


def test_oracle_goldens(prof):
    enc = DNA.encode(SEQ)
    assert vr.viterbi_null(prof, enc).loglik == pytest.approx(
        G_NULL, abs=1e-9
    )
    alt = vr.viterbi_alt(prof, enc)
    assert alt.loglik == pytest.approx(G_ALT_MULTI, abs=1e-9)
    assert alt.path[0] == (st.S, 0) and alt.path[-1] == (st.T, 0)
    assert sum(l for _, l in alt.path) == len(SEQ)
    assert vr.viterbi_alt(
        prof, enc, multi_hits=False, hmmer3_compat=True
    ).loglik == pytest.approx(G_ALT_H3, abs=1e-9)

    prof3 = sample_profile(7, 3)
    enc2 = DNA.encode(SEQ2)
    assert vr.viterbi_alt(prof3, enc2).loglik == pytest.approx(
        G2_ALT, abs=1e-9
    )
    assert vr.viterbi_null(prof3, enc2).loglik == pytest.approx(
        G2_NULL, abs=1e-9
    )


def test_jax_engine_goldens(prof):
    block = vj.build_profile_block([prof, sample_profile(7, 3)], kpad=8)
    lp = 48
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=lp)
            )
            for s in (SEQ, SEQ2)
        ]
    )
    slen = np.array([len(SEQ), len(SEQ2)], np.int32)
    alt, null = vj.viterbi_scores(block, eidx, slen)
    assert float(alt[0, 0]) == pytest.approx(G_ALT_MULTI, abs=1e-3)
    assert float(null[0, 0]) == pytest.approx(G_NULL, abs=1e-3)
    assert float(alt[1, 1]) == pytest.approx(G2_ALT, abs=1e-3)
    assert float(null[1, 1]) == pytest.approx(G2_NULL, abs=1e-3)


def test_trace_engine_goldens(prof):
    res = vt.viterbi_alt(prof, DNA.encode(SEQ))
    assert res.loglik == pytest.approx(G_ALT_MULTI, abs=1e-3)
    ref = vr.viterbi_alt(prof, DNA.encode(SEQ))
    assert res.path == ref.path


# ENTRY_DIST_UNIFORM end-to-end: the reference multiplies the uniform
# entry log-prob by M (protein_model.c:415, reproduced verbatim in
# models/profile.py); this pin would catch anyone "fixing" that oddity.
G_UNI_ALT = -56.70650775318916


def test_uniform_entry_goldens():
    from deciphon_tpu.models.profile import ProteinCfg

    uprof = sample_profile(1, 2, ProteinCfg(entry_dist="uniform",
                                            epsilon=0.01))
    enc = DNA.encode(SEQ)
    assert vr.viterbi_alt(uprof, enc).loglik == pytest.approx(
        G_UNI_ALT, abs=1e-9
    )
    # null is entry-dist-independent (R loop only)
    assert vr.viterbi_null(uprof, enc).loglik == pytest.approx(
        G_NULL, abs=1e-9
    )
    # engines agree end-to-end on the uniform-entry profile
    block = vj.build_profile_block([uprof], kpad=8)
    eidx = vj.end_fragment_indices(
        fragment_indices(enc, pad_to=48)
    )[None]
    alt, null = vj.viterbi_scores(
        block, eidx, np.array([len(SEQ)], np.int32)
    )
    assert float(alt[0, 0]) == pytest.approx(G_UNI_ALT, abs=1e-3)
    assert float(null[0, 0]) == pytest.approx(G_NULL, abs=1e-3)
    res = vt.viterbi_alt(uprof, enc)
    assert res.loglik == pytest.approx(G_UNI_ALT, abs=1e-3)
    assert res.path == vr.viterbi_alt(uprof, enc).path

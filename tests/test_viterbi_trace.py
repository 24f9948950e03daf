"""Jitted traceback engine vs the numpy oracle: identical paths + scores."""

import numpy as np
import pytest

from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops import viterbi_trace as vt
from deciphon_tpu.ops.viterbi_jax import build_profile_block

LP = 32  # shared pad bucket -> one compile for the whole module


def cases():
    rng = np.random.default_rng(3)
    for trial in range(6):
        prof = sample_profile(trial + 1, int(rng.integers(2, 9)))
        L = int(rng.integers(4, LP))
        seq = "".join(rng.choice(list("ACGT"), L))
        yield prof, DNA.encode(seq)


@pytest.mark.parametrize("mh,h3", [(True, False), (False, False),
                                   (True, True)])
def test_matches_oracle_paths(mh, h3):
    for prof, enc in cases():
        a = vr.viterbi_alt(prof, enc, multi_hits=mh, hmmer3_compat=h3)
        b = vt.viterbi_alt(
            prof, enc, multi_hits=mh, hmmer3_compat=h3,
            block_row=tuple(build_profile_block([prof], kpad=8)),
            pad_to=LP,
        )
        assert b.loglik == pytest.approx(a.loglik, abs=1e-3)
        assert b.path == a.path


def test_padding_is_inert():
    """Node/position padding must not change the result."""
    prof, enc = next(cases())
    base = vt.viterbi_alt(prof, enc, pad_to=LP)
    padded = vt.viterbi_alt(
        prof, enc,
        block_row=tuple(build_profile_block([prof], kpad=16)),
        pad_to=2 * LP,
    )
    assert padded.loglik == pytest.approx(base.loglik, abs=1e-4)
    assert padded.path == base.path

"""Device-side (MXU) fragment-table synthesis vs the host f64 path.

ops/tables.synth_fragment_tables must reproduce models/frame.fragment_table
(the host dgemm that replaces imm's press-time per-state table precompute,
reference src/model/protein_model.c:247-254) up to f32 rounding, and the
PallasBlock.from_profiles constructor must produce the same packed layout
as the host pack_block path.
"""

import numpy as np
import pytest

from deciphon_tpu.models import frame
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_pallas as vp
from deciphon_tpu.ops.tables import synth_fragment_tables


def _rand_state(rng):
    """Random (marg125_log, q5_log) pair for one frame state."""
    codonp = rng.dirichlet(np.ones(64))
    lcodon = np.log(codonp)
    marg = frame.codon_marg(lcodon)
    q = frame.q5_pad(frame.nuclt_lprob_from_codon(lcodon))
    return marg, q


@pytest.mark.parametrize("eps", [0.01, 0.1])
def test_synth_matches_host_tables(eps):
    rng = np.random.default_rng(0)
    margs, qs = zip(*[_rand_state(rng) for _ in range(6)])
    marg = np.stack(margs)
    q = np.stack(qs)
    host = frame.fragment_table(marg, q, eps)  # [6, 1365+1] f64
    dev = np.asarray(
        synth_fragment_tables(
            np.exp(marg).astype(np.float32),
            np.exp(q).astype(np.float32),
            eps=eps,
            row_chunk=8,
        )
    )
    assert dev.shape == host.shape
    # -inf rows clamp to NEG on device
    finite = np.isfinite(host)
    np.testing.assert_allclose(dev[finite], host[finite], atol=2e-5)
    assert np.all(dev[~finite] <= vj.NEG / 2)


def test_from_profiles_matches_pack_block():
    profiles = [sample_profile(s + 1, (s % 5) + 2) for s in range(10)]
    block = vj.build_profile_block(profiles, kpad=8)
    femis_m, femis_in, trans, B = vp.pack_block(block)
    pb = vp.PallasBlock.from_profiles(profiles, kpad=8)
    assert pb.nprofiles == B
    assert pb.kpad == femis_m.shape[-1]
    dm = np.asarray(pb.femis_m)
    din = np.asarray(pb.femis_in)
    # identical layout; values equal up to f32 synthesis rounding, with
    # NEG fills on padding sublanes/lanes in both paths
    mask = femis_m > vj.NEG / 2
    np.testing.assert_allclose(dm[mask], femis_m[mask], atol=2e-5)
    assert np.all(dm[~mask] <= vj.NEG / 2)
    maskin = femis_in > vj.NEG / 2
    np.testing.assert_allclose(din[maskin], femis_in[maskin], atol=2e-5)
    assert np.all(din[~maskin] <= vj.NEG / 2)
    np.testing.assert_allclose(np.asarray(pb.trans), trans, atol=1e-6)

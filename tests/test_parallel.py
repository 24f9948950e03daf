"""Sharded scan on the virtual 8-device CPU mesh == single-device scan."""

import jax
import numpy as np
import pytest

from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops.emissions import fragment_indices
from deciphon_tpu.parallel.mesh import make_scan_mesh
from deciphon_tpu.parallel.sharded_scan import (
    shard_block,
    shard_seqs,
    sharded_scan_step,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    profiles = [sample_profile(s, int(rng.integers(2, 5))) for s in range(8)]
    block = vj.build_profile_block(profiles)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(6, 14))) for _ in range(8)]
    lp = 16
    eidx = np.stack(
        [
            vj.end_fragment_indices(fragment_indices(DNA.encode(s), pad_to=lp))
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    return block, eidx, slen


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_scan_mesh()
    assert mesh.shape["seqs"] * mesh.shape["profiles"] == 8
    mesh = make_scan_mesh(profile_axis=2)
    assert mesh.shape == {"seqs": 4, "profiles": 2}
    with pytest.raises(ValueError):
        make_scan_mesh(profile_axis=3, seq_axis=3)


@pytest.mark.parametrize("paxis", [1, 2, 4])
def test_sharded_matches_single_device(data, paxis):
    block, eidx, slen = data
    ref_alt, ref_null = vj.viterbi_scores(block, eidx, slen)
    ref_alt = np.asarray(ref_alt)
    ref_null = np.asarray(ref_null)

    mesh = make_scan_mesh(profile_axis=paxis)
    sblock = shard_block(mesh, block)
    seidx, sslen = shard_seqs(mesh, eidx, slen)
    alt, null, lrt, best, arg = sharded_scan_step(mesh, sblock, seidx, sslen)
    np.testing.assert_allclose(np.asarray(alt), ref_alt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(null), ref_null, atol=1e-5)

    ref_lrt = -2.0 * (ref_null - ref_alt)
    np.testing.assert_allclose(np.asarray(lrt), ref_lrt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(best), ref_lrt.max(1), atol=1e-5)
    assert np.array_equal(np.asarray(arg), ref_lrt.argmax(1))

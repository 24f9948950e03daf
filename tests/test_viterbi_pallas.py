"""Pallas kernel vs the JAX engine, in interpreter mode on CPU.

On real TPU hardware the same kernel matches the JAX engine to f32
tolerance (6e-5 on the bench shapes) — see benchmarks/ and bench.py.
"""

import numpy as np
import pytest

from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_pallas as vp
from deciphon_tpu.ops.emissions import fragment_indices

SEQS = ["ATGAAACGCATTAGCACC", "ACGT", "TTTCCCGGGAAA"]
LP = 24


@pytest.fixture(scope="module")
def setup():
    # 20 profiles spanning two GROUP=16 groups, with padding in the tail
    profiles = [sample_profile(s + 1, (s % 7) + 2) for s in range(20)]
    block = vj.build_profile_block(profiles, kpad=8)
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=LP)
            )
            for s in SEQS
        ]
    )
    slen = np.array([len(s) for s in SEQS], np.int32)
    ref = vj.viterbi_scores(block, eidx, slen)
    return block, eidx, slen, ref


def test_interpret_matches_jax_engine(setup):
    block, eidx, slen, (ref_alt, ref_null) = setup
    alt, null = vp.viterbi_scores_pallas(block, eidx, slen, interpret=True)
    assert alt.shape == (3, 20)
    np.testing.assert_allclose(alt, np.asarray(ref_alt), atol=1e-5)
    np.testing.assert_allclose(null, np.asarray(ref_null), atol=1e-5)


def test_interpret_flags_variant(setup):
    block, eidx, slen, _ = setup
    ref_alt, ref_null = vj.viterbi_scores(
        block, eidx, slen, multi_hits=False, hmmer3_compat=True
    )
    alt, null = vp.viterbi_scores_pallas(
        block, eidx, slen,
        multi_hits=False, hmmer3_compat=True, interpret=True,
    )
    np.testing.assert_allclose(alt, np.asarray(ref_alt), atol=1e-5)
    np.testing.assert_allclose(null, np.asarray(ref_null), atol=1e-5)


def test_group8_matches_jax_engine(setup):
    """Half-width (group=8) profile rows score identically — the packing
    used for huge-core rows (db/partition.pack_profile_rows)."""
    block, eidx, slen, (ref_alt, ref_null) = setup
    pb = vp.PallasBlock(block, group=8)
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen)
    import jax.numpy as jnp

    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(alt), np.asarray(ref_alt), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(null), np.asarray(ref_null), atol=1e-5
    )


@pytest.mark.parametrize("nsegs,group", [(2, 8), (4, 8), (2, 16)])
def test_segmented_matches_jax_engine(setup, nsegs, group):
    """Segmented lane packing (nsegs profiles per sublane row) scores
    identically to the XLA engine: boundary masks keep the D-chain scan,
    the core k->k+1 shift, and the E-reduction segment-local."""
    block, eidx, slen, (ref_alt, ref_null) = setup
    pb = vp.PallasBlock(block, group=group, nsegs=nsegs)
    assert pb.kpad % 128 == 0 and pb.segw * nsegs == pb.kpad
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen)
    import jax.numpy as jnp

    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(alt), np.asarray(ref_alt), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(null), np.asarray(ref_null), atol=1e-5
    )


def test_segmented_ragged_cores():
    """Segments narrower than their profiles' tier + tail slot padding:
    cores 3..60 packed 4-per-sublane at W=64 (K=256)."""
    rng = np.random.default_rng(3)
    profiles = [
        sample_profile(s + 1, int(rng.integers(3, 60))) for s in range(40)
    ]
    block = vj.build_profile_block(profiles, kpad=64)
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(8, 60))))
        for _ in range(5)
    ]
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=64)
            )
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    ref_alt, ref_null = vj.viterbi_scores(block, eidx, slen)
    pb = vp.PallasBlock(block, group=4, nsegs=4)
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=8)
    import jax.numpy as jnp

    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(alt), np.asarray(ref_alt), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(null), np.asarray(ref_null), atol=1e-5
    )


def test_pack_block_layout(setup):
    block, _, _, _ = setup
    femis_m, femis_in, trans, B = vp.pack_block(block)
    # merged insert/null table: [P, NTAB, 2, GROUP]
    assert femis_in.shape == (2, vp.NTAB, 2, vp.GROUP)
    np.testing.assert_array_equal(
        femis_in[0, :, 0, 3], np.asarray(block.fi[3])
    )
    np.testing.assert_array_equal(
        femis_in[0, :, 1, 3], np.asarray(block.fn[3])
    )
    assert B == 20
    P = femis_m.shape[0]
    # core axis rounds up to a whole 128-lane tile (kpad=8 -> 128)
    assert P == 2 and femis_m.shape == (2, vp.NTAB, vp.GROUP, 128)
    # profile 3's fragment table lands at group 0, sublane 3
    np.testing.assert_array_equal(
        femis_m[0, :, 3, :8], np.asarray(block.fm[3]).T
    )
    # padding lanes and sublanes are dead
    assert np.all(femis_m[0, :, 3, 8:] <= vj.NEG)
    assert np.all(femis_m[1, :, 5:, :] <= vj.NEG)


def test_interpret_regime_b_streaming(setup):
    """Regime B (length-4/5 rows streamed from HBM) must match regime A
    and the XLA engine exactly; forced on at small K for testability."""
    block, eidx, slen, (ref_alt, ref_null) = setup
    pb = vp.PallasBlock(block, n_stream=2)
    assert pb.n_stream == 2
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=8)
    import jax.numpy as jnp

    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(alt), np.asarray(ref_alt), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(null), np.asarray(ref_null), atol=1e-5
    )


def test_interpret_regime_b_multichunk():
    """Streaming prefetch across SMEM chunk boundaries (L > 255)."""
    rng = np.random.default_rng(11)
    profiles = [sample_profile(s + 1, 9 + s) for s in range(3)]
    block = vj.build_profile_block(profiles, kpad=16)
    lens = (250, 256, 400, 510)
    seqs = ["".join(rng.choice(list("ACGT"), L)) for L in lens]
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=510)
            )
            for s in seqs
        ]
    )
    slen = np.array(lens, np.int32)
    ref_alt, ref_null = vj.viterbi_scores(block, eidx, slen)
    pb = vp.PallasBlock(block, n_stream=2)
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=8)
    import jax.numpy as jnp

    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(alt), np.asarray(ref_alt), atol=1e-4, rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(null), np.asarray(ref_null), atol=1e-4, rtol=2e-6
    )


def test_regime_choice_and_nseq_cap():
    assert vp.nseq_cap(128) == 32
    assert vp.nseq_cap(1024) == 32
    assert vp.nseq_cap(2048) == 16
    assert vp.nseq_cap(4096) == 8
    assert vp.pick_nseq(100, vp.nseq_cap(4096)) == 8


def test_chunked_seqinfo_layout():
    # the SMEM chunk buffers are fixed-size, so the stack no longer
    # depends on read length; a 12 kb read just means more chunks
    assert vp.pick_nseq(100) == 32
    eidx = np.zeros((10, 12288, 5), np.int32)
    eidx[3, 100, 2] = 77
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, np.full(10, 5, np.int32))
    nch = (12288 + vp.CPOS - 1) // vp.CPOS
    assert seqinfo.shape == (
        1, nch, vp.SEQROWS, 16 * vp.WC // vp.SEQROWS
    )
    assert S == 10 and seqlens.shape == (1, vp.SEQROWS, vp.SLPAD)
    # row 100 of seq 3 lands in chunk 100//CPOS at local offset, with
    # per_row = 16/8 = 2 sequences per SMEM chunk row
    c, local = divmod(100, vp.CPOS)
    per_row = 16 // vp.SEQROWS
    assert seqinfo[
        0, c, 3 // per_row, (3 % per_row) * vp.WC + local * 5 + 2
    ] == 77


def test_interpret_iupac_streaming_segmented():
    """Extended (base-5) tables through the kernel with BOTH segmented
    rows and regime-B streaming: table height is a kernel input, the
    resident prefix is the base's length-1..3 rows, and the streamed
    length-4/5 gathers share segment-agnostic row indices."""
    from deciphon_tpu.models.alphabet import encode_extended
    from deciphon_tpu.models.frame import frag_layout

    rng = np.random.default_rng(7)
    profiles = [
        sample_profile(s + 1, int(rng.integers(3, 30))) for s in range(12)
    ]
    base = 5
    codes = ("N",)
    block = vj.build_profile_block(profiles, kpad=32, codes=codes)
    reads = []
    for _ in range(4):
        r = "".join(rng.choice(list("ACGT"), int(rng.integers(20, 60))))
        k = int(rng.integers(0, len(r)))
        reads.append(r[:k] + "N" + r[k + 1 :])
    encs = [encode_extended(r)[0] for r in reads]
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(e, pad_to=64, base=base), base=base
            )
            for e in encs
        ]
    )
    slen = np.array([len(e) for e in encs], np.int32)
    ref_alt, ref_null = vj.viterbi_scores(block, eidx, slen)
    import jax.numpy as jnp

    for n_stream, nsegs, group in [(0, 4, 4), (2, 1, 8), (2, 4, 4)]:
        pb = vp.PallasBlock(
            block, n_stream=n_stream, group=group, nsegs=nsegs,
            nres=int(frag_layout(base)[0][4]),
        )
        seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=8)
        alt, null = pb.scores(
            jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(alt), np.asarray(ref_alt), atol=1e-5,
            err_msg=f"n_stream={n_stream} nsegs={nsegs}",
        )
        np.testing.assert_allclose(
            np.asarray(null), np.asarray(ref_null), atol=1e-5,
            err_msg=f"n_stream={n_stream} nsegs={nsegs}",
        )

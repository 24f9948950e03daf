"""Slotspan kernel rows: one profile across several sublane slots.

The huge-core tail is the scan's dominant padding waste (a 4096-core
outlier widens a whole 8-slot row to 4096 lanes, docs/PERFORMANCE.md);
slotspan rows pack each profile into ceil(core/W) consecutive slots of
a W-lane row with cross-slot carries (core k->k+1 shift, D-chain prefix,
span-wide E reduce) computed in-kernel from a static slot layout.

Parity here is interpret-mode vs the XLA engine (exact recurrences);
the on-hardware suite carries the Mosaic-lowering check.
"""

import numpy as np
import pytest

from deciphon_tpu.models.alphabet import DNA
from deciphon_tpu.models.h3reader import build_profile
from deciphon_tpu.models.h3writer import random_h3
from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_pallas as vp
from deciphon_tpu.ops.emissions import fragment_indices

W = 128
NSEQS = 4


def test_plan_spans_layout():
    rows = vp.plan_spans([250, 120, 300, 40, 1000], W, group=8)
    # sorted desc: 1000 (span 8) fills one row; 300+250+120+40 = 3+2+1+1
    assert len(rows) == 2
    assert [t[0] for t in rows[0]] == [4] * 8
    assert [(t[0], t[2]) for t in rows[1]] == [
        (2, 3), (2, 3), (2, 3), (0, 2), (0, 2), (1, 1), (3, 1)
    ]
    with pytest.raises(ValueError, match="slots"):
        vp.plan_spans([2000], W, group=8)


@pytest.fixture(scope="module")
def span_problem():
    rng = np.random.default_rng(11)
    cores = [250, 120, 300, 40]
    profiles = [
        build_profile(random_h3(s + 1, k, peak=0.8))
        for s, k in enumerate(cores)
    ]
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(30, 200))))
        for _ in range(NSEQS)
    ]
    Lp = 255
    eidx = np.stack(
        [
            vj.end_fragment_indices(
                fragment_indices(DNA.encode(s), pad_to=Lp)
            )
            for s in seqs
        ]
    )
    slen = np.array([len(s) for s in seqs], np.int32)
    return profiles, seqs, eidx, slen


@pytest.mark.parametrize("semiring", ["max", "logsumexp"])
def test_span_row_matches_xla(span_problem, semiring):
    profiles, seqs, eidx, slen = span_problem
    blocks = vp.PallasBlock.from_span_rows(profiles, W=W, group=8)
    assert len(blocks) == 1
    pb, pids = blocks[0]
    assert pb.spans is not None and pb.col_sel is not None
    nseq = vp.pick_nseq(NSEQS, vp.nseq_cap(pb.kpad, pb.group))
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=nseq)
    import jax.numpy as jnp

    alt, null = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S,
        interpret=True, semiring=semiring,
    )
    alt, null = np.asarray(alt), np.asarray(null)
    ordered = [profiles[i] for i in pids]
    block = vj.build_profile_block(ordered, kpad=384)
    ra, rn = map(
        np.asarray,
        vj.viterbi_scores(
            jnp_block(block), jnp.asarray(eidx), jnp.asarray(slen),
            semiring=semiring,
        ),
    )
    np.testing.assert_allclose(alt[:NSEQS], ra, atol=2e-3, rtol=2e-6)
    np.testing.assert_allclose(null[:NSEQS], rn, atol=2e-3, rtol=2e-6)


def jnp_block(block):
    import jax.numpy as jnp

    return vj.ProfileBlock(*(jnp.asarray(a) for a in block))


def test_span_row_single_chunk_degenerates(span_problem):
    """A row of span-1 profiles through the spans path equals the plain
    kernel path (carries must be inert when no slot continues)."""
    profiles, seqs, eidx, slen = span_problem
    small = [p for p in profiles if p.core_size <= W]
    blocks = vp.PallasBlock.from_span_rows(small, W=W, group=8)
    pb, pids = blocks[0]
    import jax.numpy as jnp

    nseq = vp.pick_nseq(NSEQS, vp.nseq_cap(pb.kpad, pb.group))
    seqinfo, seqlens, S = vp.make_seqinfo(eidx, slen, nseq=nseq)
    alt, _ = pb.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    plain = vp.PallasBlock.from_profiles(
        [small[i] for i in pids], kpad=W, group=8
    )
    alt2, _ = plain.scores(
        jnp.asarray(seqinfo), jnp.asarray(seqlens), S, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(alt)[:NSEQS], np.asarray(alt2)[:NSEQS], atol=1e-5
    )


def test_engine_span_blocks_match_xla(span_problem, monkeypatch):
    """ScanEngine integration: profiles over SPAN_THRESH scan through
    slotspan blocks (fused + per-block) and match the plain XLA engine;
    constants are shrunk so interpret mode stays fast."""
    from deciphon_tpu.db.format import TensorDB, write_db
    from deciphon_tpu.ops import scan_engine as se

    profiles, seqs, eidx, slen = span_problem
    monkeypatch.setattr(se, "SPAN_W", W)
    monkeypatch.setattr(se, "SPAN_THRESH", 96)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".dtp") as fp:
        write_db(fp.name, iter(profiles))
        db = TensorDB.load(fp.name)
    recs = [
        se.SeqRecord(i, f"r{i}", s) for i, s in enumerate(seqs)
    ]
    params = se.ScanParams(lrt_threshold=-1e9)
    ref = se.ScanEngine(db, params, use_pallas=False).scan(recs)
    for fuse in ("1", "0"):
        monkeypatch.setenv("DCP_FUSE_SCAN", fuse)
        eng = se.ScanEngine(
            db, params, use_pallas=True, pallas_interpret=True
        )
        span_blocks = [b for b in eng._blocks if b.span_row is not None]
        assert span_blocks, "cores over the shrunken threshold must span"
        got = eng.scan(recs)
        assert [(h.seq_idx, h.profile_idx) for h in got] == [
            (h.seq_idx, h.profile_idx) for h in ref
        ]
        for a, b in zip(got, ref):
            assert a.alt_loglik == pytest.approx(b.alt_loglik, abs=2e-3)
            assert a.null_loglik == pytest.approx(
                b.null_loglik, abs=2e-3
            )
            assert a.match == b.match

"""End-to-end scan: press synthetic .hmm -> .dtp -> batched scan -> products."""

import numpy as np
import pytest

from deciphon_tpu.db.format import TensorDB, write_db
from deciphon_tpu.models import codec
from deciphon_tpu.models import state as st
from deciphon_tpu.models.alphabet import DNA, STANDARD_CODE
from deciphon_tpu.models.h3reader import press_file
from deciphon_tpu.models.h3writer import random_h3, write_h3
from deciphon_tpu.models.profile import sample_profile
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops.scan_engine import (
    Hit,
    ScanEngine,
    ScanParams,
    SeqRecord,
    pad_seq_len,
)
from deciphon_tpu.server.prod import HEADER, ProdWriter


def consensus_dna(prof, gc=STANDARD_CODE):
    """A DNA read spelling the profile's most likely codon per node."""
    out = []
    for k in range(prof.core_size):
        best = int(np.argmax(prof.match_codonp[k]))
        out.append(gc.codon_str(best // 16, (best // 4) % 4, best % 4))
    return "".join(out)


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scan")
    hmm = tmp / "synth.hmm"
    with open(hmm, "w") as fp:
        write_h3(
            fp,
            [random_h3(s, k, peak=0.9) for s, k in [(1, 4), (2, 6), (3, 9)]],
        )
    dbp = str(tmp / "synth.dtp")
    write_db(dbp, press_file(str(hmm)))
    return TensorDB.load(dbp)


def test_pad_seq_len():
    # whole streaming chunks: every read <= 255 shares one bucket
    assert pad_seq_len(5) == 255
    assert pad_seq_len(255) == 255
    assert pad_seq_len(256) == 510
    assert pad_seq_len(1100) == 1275
    for L in range(1, 4000, 7):
        p = pad_seq_len(L)
        assert p >= L and p % 255 == 0 and p - L < 255 + 255


def test_scan_finds_planted_hit(db):
    """A read spelling a profile's consensus codons must hit that profile."""
    target = db.profile(2)  # core_size 9 -> 27nt read
    read = consensus_dna(target)
    seqs = [
        SeqRecord(1, "planted", read),
        SeqRecord(2, "random", "ACGTACGTACGTACGTACGTACGT"),
    ]
    eng = ScanEngine(db, ScanParams(lrt_threshold=10.0))
    hits = eng.scan(seqs)
    assert any(h.seq_id == 1 and h.profile_idx == 2 for h in hits)
    h = next(h for h in hits if h.seq_id == 1 and h.profile_idx == 2)
    # scores agree with the oracle
    ora = vr.viterbi_alt(target, DNA.encode(read))
    orn = vr.viterbi_null(target, DNA.encode(read))
    assert h.alt_loglik == pytest.approx(ora.loglik, abs=2e-3)
    assert h.null_loglik == pytest.approx(orn.loglik, abs=2e-3)
    assert h.lrt == pytest.approx(-2 * (orn.loglik - ora.loglik), abs=4e-3)
    # path covers the read, match string well-formed
    assert sum(l for _, l in h.path) == len(read)
    cells = h.match.split(";")
    assert len(cells) == len(h.path)
    frag_total = "".join(c.split(",")[0] for c in cells)
    assert frag_total == read
    # mute steps have empty codon/amino
    for cell, (sid, slen) in zip(cells, h.path):
        f, s, c, a = cell.split(",")
        assert s == st.name(sid)
        if st.is_mute(sid):
            assert c == "" and a == ""
        else:
            assert len(c) == 3 and len(a) == 1


def test_scan_pallas_path_matches_jax(db):
    """The Pallas dispatch (interpret mode on CPU) agrees with the XLA
    engine through the full ScanEngine pipeline."""
    read = consensus_dna(db.profile(2))
    seqs = [
        SeqRecord(1, "planted", read),
        SeqRecord(2, "random", "ACGTACGTACGTACGTACGTACGT"),
    ]
    ref = ScanEngine(db, ScanParams(lrt_threshold=10.0)).scan(seqs)
    got = ScanEngine(
        db, ScanParams(lrt_threshold=10.0),
        use_pallas=True, pallas_interpret=True,
    ).scan(seqs)
    assert [(h.seq_id, h.profile_idx) for h in got] == [
        (h.seq_id, h.profile_idx) for h in ref
    ]
    for a, b in zip(got, ref):
        assert a.alt_loglik == pytest.approx(b.alt_loglik, abs=1e-4)
        assert a.null_loglik == pytest.approx(b.null_loglik, abs=1e-4)
        assert a.match == b.match


def test_scan_threshold_filters(db):
    read = consensus_dna(db.profile(2))
    eng_hi = ScanEngine(db, ScanParams(lrt_threshold=1e9))
    assert eng_hi.scan([SeqRecord(1, "r", read)]) == []


def test_scan_rejects_ambiguous(db):
    eng = ScanEngine(db)
    with pytest.raises(ValueError):
        eng.scan([SeqRecord(1, "r", "ACGTX")])


def test_prod_writer_format(db, tmp_path):
    target = db.profile(0)
    read = consensus_dna(target)
    eng = ScanEngine(db, ScanParams(lrt_threshold=0.0))
    hits = eng.scan([SeqRecord(7, "r", read)])
    w = ProdWriter(scan_id=3)
    for h in hits:
        w.add(h.seq_id, h.accession, h.alt_loglik, h.null_loglik, h.match)
    out = tmp_path / "prods.tsv"
    w.write(str(out))
    text = out.read_text()
    lines = text.splitlines()
    assert lines[0] + "\n" == HEADER
    assert len(lines) == 1 + len(hits)
    cols = lines[1].split("\t")
    assert len(cols) == 9
    assert cols[0] == "3" and cols[1] == "7"
    assert cols[3] == "dna" and cols[6] == "protein"
    # %.17g floats round-trip exactly
    assert float(cols[4]) == hits[0].alt_loglik


def test_codec_decode_stream():
    prof = sample_profile(1, 3)
    seq = "ATGGCCATT"
    res = vr.viterbi_alt(prof, DNA.encode(seq))
    codons = codec.decode_codons(prof, DNA.encode(seq), res.path)
    emitting = [
        s for s, l in res.path if l > 0 and not st.is_mute(s)
    ]
    assert len(codons) == len(emitting)
    for a, b, c in codons:
        assert 0 <= a < 4 and 0 <= b < 4 and 0 <= c < 4


def test_long_read_scan(db):
    """Multi-kb reads stream through the chunked kernel (interpret mode
    here; verified on hardware at 8 kb)."""
    import numpy as np

    rng = np.random.default_rng(5)
    target = db.profile(2)
    consensus = consensus_dna(target)

    def r(n):
        return "".join(rng.choice(list("ACGT"), n))

    # three planted islands (multi-hit) so the signal survives ~3 kb of
    # random flanks (oracle LRT ~ 38)
    long_read = (
        r(1200) + consensus + r(800) + consensus + r(700) + consensus
        + r(500)
    )
    eng = ScanEngine(db, ScanParams(lrt_threshold=10.0), use_pallas=True,
                     pallas_interpret=True)
    hits = eng.scan([SeqRecord(1, "long", long_read)])
    assert any(h.profile_idx == 2 for h in hits)

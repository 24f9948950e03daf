"""CLI surface: press/scan/info/parity on synthetic assets."""

import os

import numpy as np

from deciphon_tpu.cli.main import main
from deciphon_tpu.models.h3writer import random_h3, write_h3


def _synth_hmm(path, cores=(4, 6)):
    with open(path, "w") as fp:
        write_h3(fp, [random_h3(s + 1, k, peak=0.9) for s, k in
                      enumerate(cores)])


def test_cli_press_scan_info(tmp_path, capsys):
    hmm = tmp_path / "s.hmm"
    _synth_hmm(str(hmm))
    dtp = tmp_path / "s.dtp"
    assert main(["press", str(hmm), "-o", str(dtp)]) == 0
    # consensus read of profile 0 -> guaranteed hit
    from deciphon_tpu.db.format import TensorDB
    from deciphon_tpu.models.alphabet import STANDARD_CODE

    db = TensorDB.load(str(dtp))
    prof = db.profile(0)
    read = "".join(
        STANDARD_CODE.codon_str(b // 16, (b // 4) % 4, b % 4)
        for b in np.argmax(prof.match_codonp, axis=1)
    )
    fasta = tmp_path / "r.fa"
    fasta.write_text(f">r1\n{read}\n")
    out = tmp_path / "prods.tsv"
    assert main(
        ["scan", str(dtp), str(fasta), "-o", str(out), "--batch-size", "2"]
    ) == 0
    text = out.read_text()
    assert prof.accession in text
    assert main(["info", str(dtp)]) == 0
    capsys.readouterr()


def test_cli_parity_synthetic(tmp_path, capsys):
    """parity on a non-asset .hmm: full flow, golden checks skipped."""
    hmm = tmp_path / "p.hmm"
    _synth_hmm(str(hmm), cores=(5,))
    out = tmp_path / "par.tsv"
    assert main(["parity", str(hmm), "-o", str(out)]) == 0
    assert "PARITY OK" in capsys.readouterr().out
    assert os.path.exists(out)
    # strict mode refuses unknown assets
    assert main(["parity", str(hmm), "--strict", "-o", str(out)]) == 1


def test_cli_scan_sharded_union(tmp_path, capsys):
    """Union of --shard i/N scans == the full scan (share-nothing
    scale-out over balanced_partitions; reference profile_reader.c:44-72
    split, scale-out model of SURVEY.md §5)."""
    hmm = tmp_path / "m.hmm"
    _synth_hmm(str(hmm), cores=(4, 6, 5, 7, 3))
    dtp = tmp_path / "m.dtp"
    assert main(["press", str(hmm), "-o", str(dtp)]) == 0
    from deciphon_tpu.db.format import TensorDB
    from deciphon_tpu.models.alphabet import STANDARD_CODE

    db = TensorDB.load(str(dtp))
    reads = []
    for i in (1, 3):
        p = db.profile(i)
        reads.append("".join(
            STANDARD_CODE.codon_str(b // 16, (b // 4) % 4, b % 4)
            for b in np.argmax(p.match_codonp, axis=1)
        ))
    fasta = tmp_path / "r.fa"
    fasta.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))

    def rows(path):
        return set(open(path).read().splitlines()[1:])

    full = tmp_path / "full.tsv"
    assert main(["scan", str(dtp), str(fasta), "-o", str(full)]) == 0
    union = set()
    for i in (1, 2, 3):
        out = tmp_path / f"s{i}.tsv"
        assert main(
            ["scan", str(dtp), str(fasta), "-o", str(out),
             "--shard", f"{i}/3"]
        ) == 0
        part = rows(out)
        assert not (union & part)  # partitions are disjoint
        union |= part
    assert union == rows(full) and union
    capsys.readouterr()
    # invalid shard spec -> EINVAL exit
    assert main(["scan", str(dtp), str(fasta), "--shard", "4/3"]) != 0


def test_cli_scan_best_hit(tmp_path, capsys):
    """--best-hit emits ONE row per LRT-passing read (device-side argmax
    reduction, BASELINE.json's best-hit-per-read config), no match col."""
    hmm = tmp_path / "b.hmm"
    _synth_hmm(str(hmm), cores=(4, 6, 9))
    dtp = tmp_path / "b.dtp"
    assert main(["press", str(hmm), "-o", str(dtp)]) == 0
    from deciphon_tpu.db.format import TensorDB
    from deciphon_tpu.models.alphabet import STANDARD_CODE

    db = TensorDB.load(str(dtp))

    def consensus(i):
        prof = db.profile(i)
        return "".join(
            STANDARD_CODE.codon_str(b // 16, (b // 4) % 4, b % 4)
            for b in np.argmax(prof.match_codonp, axis=1)
        )

    fasta = tmp_path / "r.fa"
    fasta.write_text(
        f">r1\n{consensus(1)}\n>junk\nACGTACGTACGTACGTACGTACG\n"
        f">r2\n{consensus(2)}\n"
    )
    out = tmp_path / "best.tsv"
    assert main(
        ["scan", str(dtp), str(fasta), "-o", str(out), "--best-hit"]
    ) == 0
    rows = [
        line.split("\t") for line in out.read_text().splitlines()[1:]
    ]
    # exactly one row per planted read, each naming its own profile
    assert len(rows) == 2
    assert {r[2] for r in rows} == {
        db.profile(1).accession, db.profile(2).accession
    }
    assert all(r[-1] == "" for r in rows)  # no match column content
    capsys.readouterr()

import numpy as np
import pytest

from deciphon_tpu.models.alphabet import AMINO, DNA, RNA, STANDARD_CODE


def test_dna_encode_decode():
    seq = "ACGTACGT"
    idx = DNA.encode(seq)
    assert idx.tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
    assert DNA.decode(idx) == seq
    assert DNA.encode("acgt").tolist() == [0, 1, 2, 3]
    assert DNA.encode("X").tolist() == [4]


def test_bad_symbol_raises():
    with pytest.raises(ValueError):
        DNA.encode("ACGN")


def test_amino_alphabet():
    assert AMINO.size == 20
    assert AMINO.symbols == "ACDEFGHIKLMNPQRSTVWY"


def test_genetic_code_table1():
    gc = STANDARD_CODE
    cases = {
        "ATG": "M", "TGG": "W", "TAA": "*", "TAG": "*", "TGA": "*",
        "AAA": "K", "GCT": "A", "CGA": "R", "TTT": "F", "CAC": "H",
    }
    for codon, aa in cases.items():
        a, b, c = (DNA.index(s) for s in codon)
        assert gc.decode(a, b, c) == aa
    # 61 sense codons, degeneracy counts sum correctly
    assert int((gc.aa_of >= 0).sum()) == 61
    assert gc.ncodons_per_aa.sum() == 61
    assert gc.ncodons_per_aa[AMINO.index("M")] == 1
    assert gc.ncodons_per_aa[AMINO.index("W")] == 1
    assert gc.ncodons_per_aa[AMINO.index("L")] == 6
    assert gc.ncodons_per_aa[AMINO.index("R")] == 6


def test_rna_code():
    from deciphon_tpu.models.alphabet import GeneticCode

    gc = GeneticCode(RNA)
    a, b, c = (RNA.index(s) for s in "AUG")
    assert gc.decode(a, b, c) == "M"

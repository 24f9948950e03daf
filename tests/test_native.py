"""Native C++ HMMER3 parser vs the pure-Python reader."""

import numpy as np
import pytest

from deciphon_tpu.models.h3reader import count_profiles, read_h3
from deciphon_tpu.models.h3writer import random_h3, write_h3
from deciphon_tpu.native import available, build


@pytest.fixture(scope="module")
def hmm_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "t.hmm"
    with open(p, "w") as fp:
        write_h3(fp, [random_h3(s, 10 + s, peak=0.5) for s in range(5)])
    return str(p)


needs_native = pytest.mark.skipif(
    not available(), reason="native library not built (no toolchain?)"
)


@needs_native
def test_native_matches_python(hmm_path):
    from deciphon_tpu.native.h3parse import (
        count_profiles_native,
        read_h3_native,
    )

    py = list(read_h3(hmm_path))
    nat = list(read_h3_native(hmm_path))
    assert len(py) == len(nat) == 5
    for a, b in zip(py, nat):
        assert a.name == b.name
        assert a.accession == b.accession
        assert a.length == b.length
        assert a.consensus == b.consensus
        np.testing.assert_allclose(a.match_lprobs, b.match_lprobs)
        fin = np.isfinite(a.trans)
        assert np.array_equal(fin, np.isfinite(b.trans))
        np.testing.assert_allclose(a.trans[fin], b.trans[fin])
    assert count_profiles_native(hmm_path) == count_profiles(hmm_path)


@needs_native
def test_native_error_handling(tmp_path):
    from deciphon_tpu.native.h3parse import read_h3_native
    from deciphon_tpu.utils.rc import DcpError

    bad = tmp_path / "bad.hmm"
    bad.write_text("NOT A PROFILE\n")
    with pytest.raises(DcpError):
        list(read_h3_native(str(bad)))

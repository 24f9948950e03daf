import os

import numpy as np
import pytest

from deciphon_tpu.utils import xfile
from deciphon_tpu.utils.config import ServerConfig, load_dotenv
from deciphon_tpu.utils.rc import RC, DcpError
from deciphon_tpu.utils.xmath import (
    log1mexp,
    logsumexp,
    lrt,
    partition_size,
    partition_starts,
)


def test_rc_names():
    assert str(RC.OK) == "OK"
    assert str(RC.EINVAL) == "EINVAL"
    assert RC.EHTTP == 8


def test_lrt():
    # xmath.h:236-247: -2 (null - alt)
    assert lrt(-10.0, -5.0) == pytest.approx(10.0)
    out = lrt(np.array([-1.0, -2.0]), np.array([-0.5, -1.0]))
    assert np.allclose(out, [1.0, 2.0])


def test_partition_size():
    # xmath.h:228-234 semantics: balanced with remainder up front
    assert [partition_size(10, 3, i) for i in range(3)] == [4, 3, 3]
    assert [partition_size(6, 3, i) for i in range(3)] == [2, 2, 2]
    assert partition_starts(10, 3) == [0, 4, 7, 10]


def test_logsumexp_edge_cases():
    assert logsumexp(np.array([-np.inf, -np.inf])) == -np.inf
    assert np.isclose(logsumexp(np.log([0.25, 0.75])), 0.0)


def test_log1mexp():
    assert np.isclose(log1mexp(np.log(0.25)), np.log(0.75))


def test_xxh3_signed(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello deciphon")
    h = xfile.xxh3_64(str(p))
    assert isinstance(h, int)
    assert -(1 << 63) <= h < (1 << 63)
    assert xfile.xxh3_64(str(p)) == h


def test_ensure_local(tmp_path):
    p = tmp_path / "data.bin"
    p.write_bytes(b"cached content")
    h = xfile.xxh3_64(str(p))
    calls = []

    def fetch(path, xxh3):
        calls.append(path)
        with open(path, "wb") as fp:
            fp.write(b"cached content")

    xfile.ensure_local(str(p), h, fetch)
    assert not calls  # cache hit: no fetch
    p.unlink()
    xfile.ensure_local(str(p), h, fetch)
    assert calls == [str(p)]  # fetched and verified

    def bad_fetch(path, xxh3):
        with open(path, "wb") as fp:
            fp.write(b"corrupted")

    p.unlink()
    with pytest.raises(DcpError):
        xfile.ensure_local(str(p), h, bad_fetch)


def test_dotenv_and_server_config(tmp_path, monkeypatch):
    env = tmp_path / ".env"
    env.write_text(
        "API_HOST=127.0.0.1\nAPI_PORT=49152\nAPI_PREFIX=/api\n"
        "API_KEY=secret\nNUM_THREADS=4\n# comment\n"
    )
    for k in ("API_HOST", "API_PORT", "API_PREFIX", "API_KEY", "NUM_THREADS"):
        monkeypatch.delenv(k, raising=False)
    cfg = ServerConfig.from_env(str(env))
    assert cfg.api_url == "http://127.0.0.1:49152/api"
    assert cfg.api_key == "secret"
    assert cfg.num_workers == 4
    assert cfg.polling_rate_hz == 2.0  # server.h:15-16 default
    assert cfg.scan_lrt_threshold == 10.0  # scan.c:221


def test_standard_state_name():
    from deciphon_tpu.models import state as st

    assert st.standard_name(0) == "S0"
    assert st.standard_name(27) == "S27"


def test_fasta_gzip_and_multiline(tmp_path):
    import gzip

    from deciphon_tpu.utils.fasta import read_fasta

    body = (
        ">read1 with a description\nACGTACGT\nACGT\n\n"
        ">read2\nTTTT\nGGGG\nCCCC\n"
    )
    plain = tmp_path / "reads.fa"
    plain.write_text(body)
    # gzipped copy named WITHOUT .gz: the reader sniffs magic bytes
    gz = tmp_path / "reads_compressed.fa"
    with gzip.open(gz, "wt") as fp:
        fp.write(body)
    expect = [("read1", "ACGTACGTACGT"), ("read2", "TTTTGGGGCCCC")]
    assert list(read_fasta(str(plain))) == expect
    assert list(read_fasta(str(gz))) == expect


def test_prod_version_env(monkeypatch):
    from deciphon_tpu import __version__
    from deciphon_tpu.server.prod import ProdWriter

    assert ProdWriter().version == __version__
    monkeypatch.setenv("DCP_PROD_VERSION", "0.11.0")
    assert ProdWriter().version == "0.11.0"


def test_http_debug_enables_debug_level(monkeypatch):
    import logging as pylog

    from deciphon_tpu.utils import logging as log
    from deciphon_tpu.utils import trace

    log.setup(pylog.INFO)
    monkeypatch.delenv("DCP_DEBUG_HTTP", raising=False)
    assert not trace.http_debug_enabled()
    monkeypatch.setenv("DCP_DEBUG_HTTP", "1")
    assert trace.http_debug_enabled()
    assert log.logger.getEffectiveLevel() <= pylog.DEBUG
    log.logger.setLevel(pylog.INFO)

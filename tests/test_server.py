"""Full job lifecycle through the fake scheduler over real HTTP:
upload .hmm -> press job -> .dtp uploaded -> scan job -> products TSV.

This is the test the reference could not run without a live deciphon-sched
deployment (its test/sched.c + test/server.c are disabled).
"""

import numpy as np
import pytest

from deciphon_tpu.db.format import TensorDB
from deciphon_tpu.models.h3writer import random_h3, write_h3
from deciphon_tpu.server.api import SchedAPI
from deciphon_tpu.server.daemon import Server
from deciphon_tpu.server.fake_sched import FakeScheduler
from deciphon_tpu.server.prod import HEADER
from deciphon_tpu.server.sched import JobState, JobType
from deciphon_tpu.utils.config import ServerConfig
from deciphon_tpu.utils.progress import Progress
from deciphon_tpu.utils.rc import EndOfData


@pytest.fixture()
def sched(tmp_path):
    fake = FakeScheduler(spool_dir=str(tmp_path / "spool"))
    url = fake.serve()
    yield fake, url
    fake.shutdown()


@pytest.fixture()
def worker(sched, tmp_path):
    fake, url = sched
    cfg = ServerConfig(
        cache_dir=str(tmp_path / "cache"), api_url=url, single_run=True
    )
    return Server(cfg, SchedAPI(url))


def _hmm_bytes():
    import io

    buf = io.StringIO()
    write_h3(buf, [random_h3(s, k, peak=0.9) for s, k in [(1, 4), (2, 7)]])
    return buf.getvalue().encode()


def test_progress_meter():
    fired = []
    p = Progress(1000, callback=fired.append)
    p.consume(5)  # below one meter unit: no callback
    assert fired == []
    p.consume(5)  # 10/1000 -> 1%
    assert fired == [1]
    p.consume(490)
    assert sum(fired) == 50
    p.finish()
    assert sum(fired) == 100


def test_api_reachable_and_wipe(sched):
    fake, url = sched
    api = SchedAPI(url)
    assert api.is_reachable()
    fake.add_hmm("x.hmm", b"data")
    api.wipe()
    assert fake.jobs == {}
    bad = SchedAPI("http://127.0.0.1:1")
    assert not bad.is_reachable()


def test_idle_queue_raises_end(sched):
    fake, url = sched
    api = SchedAPI(url)
    with pytest.raises(EndOfData):
        api.next_pend_job()


def test_press_job_lifecycle(sched, worker):
    fake, url = sched
    api = worker.api
    hmm = api.upload_hmm_bytes = None  # not part of API; use fake directly
    hmm = fake.add_hmm("synth.hmm", _hmm_bytes())
    job = api.next_pend_job()
    assert job.type == JobType.HMM

    assert worker.run_one()
    job = fake.jobs[hmm.job_id]
    assert job.state == "done", job.error
    assert job.progress == 100
    # a .dtp db was uploaded back
    assert len(fake.dbs) == 1
    db_meta = next(iter(fake.dbs.values()))
    assert db_meta.filename.endswith(".dtp")
    db = TensorDB.load(fake.files[db_meta.filename])
    assert db.nprofiles == 2


def test_full_press_then_scan_lifecycle(sched, worker):
    fake, url = sched
    hmm = fake.add_hmm("synth.hmm", _hmm_bytes())
    assert worker.run_one()  # press
    db_meta = next(iter(fake.dbs.values()))

    # plant a consensus read for profile 1 (core 7 -> 21nt)
    db = TensorDB.load(fake.files[db_meta.filename])
    prof = db.profile(1)
    from tests.test_scan_engine import consensus_dna

    read = consensus_dna(prof)
    scan = fake.add_scan(
        db_meta.id,
        [("planted", read), ("noise", "ACGTACGTACGTACGTACGT")],
    )
    assert worker.run_one()  # scan
    job = fake.jobs[scan.job_id]
    assert job.state == "done", job.error
    assert job.progress == 100
    assert len(fake.products) == 1
    tsv = fake.products[0]
    lines = tsv.splitlines()
    assert lines[0] + "\n" == HEADER
    assert len(lines) >= 2
    hit_cols = lines[1].split("\t")
    assert hit_cols[0] == str(scan.id)
    assert hit_cols[2] == prof.accession

    # queue drained
    assert not worker.run_one()


def test_scan_job_failure_reported(sched, worker):
    fake, url = sched
    # a scan job pointing at a db record whose file is corrupt
    db_meta = fake.add_db("bad.dtp", b"not a database")
    scan = fake.add_scan(db_meta.id, [("s", "ACGT")])
    assert worker.run_one()
    job = fake.jobs[scan.job_id]
    assert job.state == "fail"
    assert job.error != ""


def test_scan_streams_in_bounded_batches(sched, worker, monkeypatch):
    """The daemon must feed the engine in DCP_SCAN_BATCH-bounded chunks
    (scan.c:227-258 streaming design): with batch=4 and 11 reads the
    engine sees 3 calls, hits from every batch reach one products file,
    and progress still hits 100."""
    fake, url = sched
    fake.add_hmm("synth.hmm", _hmm_bytes())
    assert worker.run_one()  # press
    db_meta = next(iter(fake.dbs.values()))
    db = TensorDB.load(fake.files[db_meta.filename])
    from tests.test_scan_engine import consensus_dna

    read = consensus_dna(db.profile(1))
    seqs = [("noise%d" % i, "ACGTACGTACGTACGTACGT") for i in range(9)]
    seqs.insert(0, ("planted0", read))
    seqs.append(("planted1", read))  # first and last batch both hit
    scan = fake.add_scan(db_meta.id, seqs)

    monkeypatch.setenv("DCP_SCAN_BATCH", "4")
    calls = []
    from deciphon_tpu.ops.scan_engine import ScanEngine

    orig = ScanEngine.scan

    def spy(self, batch):
        calls.append(len(batch))
        return orig(self, batch)

    monkeypatch.setattr(ScanEngine, "scan", spy)
    assert worker.run_one()
    job = fake.jobs[scan.job_id]
    assert job.state == "done", job.error
    assert job.progress == 100
    assert calls == [4, 4, 3]
    tsv = fake.products[-1]
    rows = [ln.split("\t") for ln in tsv.splitlines()[1:]]
    hit_seq_ids = {int(r[1]) for r in rows}
    assert len(hit_seq_ids) >= 2  # hits surfaced from first AND last batch


def test_scan_progress_is_per_block(sched, worker, monkeypatch):
    """Progress PATCHes to the scheduler must arrive per profile block as
    device results sync, not once at the end of the batch (reference
    ticks per (profile, seq): src/core/progress.c:256-294 consumed from
    scan_thread.c:120).  A 2-block DB scanning one batch => >=2
    increment_job_progress calls before the job flips to done."""
    import io

    fake, url = sched
    buf = io.StringIO()
    # enough profiles at two far-apart core sizes that the packing DP
    # keeps them in separate kernel blocks (kpad 128 vs 384)
    write_h3(
        buf,
        [random_h3(i + 1, 300 if i < 3 else 5, peak=0.9) for i in range(20)],
    )
    fake.add_hmm("two.hmm", buf.getvalue().encode())
    assert worker.run_one()  # press
    db_meta = next(iter(fake.dbs.values()))
    scan = fake.add_scan(
        db_meta.id, [("s%d" % i, "ACGTACGTACGTACGTACGT") for i in range(8)]
    )
    patches = []
    orig = SchedAPI.increment_job_progress

    def spy(self, job_id, inc):
        patches.append(inc)
        return orig(self, job_id, inc)

    monkeypatch.setattr(SchedAPI, "increment_job_progress", spy)
    assert worker.run_one()
    job = fake.jobs[scan.job_id]
    assert job.state == "done", job.error
    assert job.progress == 100
    assert len(patches) >= 2  # one per block sync, not one per batch
    assert sum(patches) == 100


def test_scan_best_hit_mode(sched, worker, monkeypatch):
    """DCP_BEST_HIT=1: one product row per LRT-passing read via the
    device-side argmax reduction; match column empty."""
    fake, url = sched
    fake.add_hmm("synth.hmm", _hmm_bytes())
    assert worker.run_one()  # press
    db_meta = next(iter(fake.dbs.values()))
    db = TensorDB.load(fake.files[db_meta.filename])
    from tests.test_scan_engine import consensus_dna

    read = consensus_dna(db.profile(1))
    scan = fake.add_scan(
        db_meta.id,
        [("planted", read), ("noise", "ACGTACGTACGTACGTACGT"),
         ("planted2", read)],
    )
    monkeypatch.setenv("DCP_BEST_HIT", "1")
    assert worker.run_one()
    job = fake.jobs[scan.job_id]
    assert job.state == "done", job.error
    rows = [ln.split("\t") for ln in fake.products[-1].splitlines()[1:]]
    assert len(rows) == 2  # the two planted reads, one row each
    assert all(r[2] == db.profile(1).accession for r in rows)
    assert all(r[-1] == "" for r in rows)

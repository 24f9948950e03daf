"""dcp-tpu command line.

``serve`` is the reference's dcp-server daemon (src/cli/cli_server.c:133-183:
.env config, scheduler poll loop).  ``press``/``scan``/``info`` are local
conveniences the reference routes through the scheduler instead.
"""

from __future__ import annotations

import argparse
import sys

from deciphon_tpu.utils import logging as log
from deciphon_tpu.utils.rc import RC, DcpError


def cmd_serve(args) -> int:
    from deciphon_tpu.server.daemon import Server
    from deciphon_tpu.utils.config import ServerConfig

    cfg = ServerConfig.from_env(args.env)
    cfg.single_run = args.single_run
    if args.cache_dir:
        cfg.cache_dir = args.cache_dir
    server = Server(cfg)
    server.install_signal_handler()
    server.run()
    return 0


def cmd_press(args) -> int:
    from deciphon_tpu.db.format import write_db
    from deciphon_tpu.models.h3reader import press_file
    from deciphon_tpu.models.profile import (
        ENTRY_DIST_OCCUPANCY,
        ENTRY_DIST_UNIFORM,
        ProteinCfg,
    )

    out = args.output or args.hmm.rsplit(".", 1)[0] + ".dtp"
    cfg = ProteinCfg(
        entry_dist=(
            ENTRY_DIST_UNIFORM if args.uniform_entry else ENTRY_DIST_OCCUPANCY
        ),
        epsilon=args.epsilon,
    )
    n = 0
    from deciphon_tpu.db.format import write_db as _write

    def gen():
        nonlocal n
        for p in press_file(args.hmm, cfg):
            n += 1
            if n % 100 == 0:
                log.info("pressed %d profiles", n)
            yield p

    _write(out, gen())
    print(f"pressed {n} profiles -> {out}")
    return 0


def cmd_scan(args) -> int:
    from deciphon_tpu.db.format import TensorDB
    from deciphon_tpu.ops.scan_engine import ScanEngine, ScanParams, SeqRecord
    from deciphon_tpu.server.prod import ProdWriter
    from deciphon_tpu.utils.fasta import read_fasta

    db = TensorDB.load(args.db)
    engine = ScanEngine(
        db,
        ScanParams(
            multi_hits=not args.no_multi_hits,
            hmmer3_compat=args.hmmer3_compat,
            lrt_threshold=args.lrt_threshold,
        ),
    )
    seqs = [
        SeqRecord(i + 1, name, data)
        for i, (name, data) in enumerate(read_fasta(args.fasta))
    ]
    hits = engine.scan(seqs)
    writer = ProdWriter(scan_id=0)
    for h in hits:
        writer.add(h.seq_id, h.accession, h.alt_loglik, h.null_loglik, h.match)
    out = args.output or "prods.tsv"
    writer.write(out)
    print(f"{len(hits)} hits from {len(seqs)} seqs x "
          f"{db.nprofiles} profiles -> {out}")
    return 0


def cmd_info(args) -> int:
    from deciphon_tpu.db.format import TensorDB

    if args.db.endswith(".dcp"):
        from deciphon_tpu.db.dcp import read_dcp

        info = read_dcp(args.db)
        print(f"format:     reference .dcp (magic 0x{info.magic:X})")
        print(f"profiles:   {info.nprofiles}")
        print(f"type:       {info.typeid_name}")
        print(f"float_size: {info.float_size}")
        print(f"entry_dist: {info.entry_dist_name}")
        print(f"epsilon:    {info.epsilon}")
        if info.profiles:
            ks = [p.core_size for p in info.profiles]
            print(f"nodes:      {sum(ks)} (min {min(ks)}, max {max(ks)})")
        if info.profile_sizes:
            print(f"bytes/prof: min {min(info.profile_sizes)}, "
                  f"max {max(info.profile_sizes)}")
        return 0

    db = TensorDB.load(args.db)
    h = db.header
    print(f"profiles:   {db.nprofiles}")
    print(f"type:       {h['profile_typeid']}")
    print(f"entry_dist: {h['entry_dist']}")
    print(f"epsilon:    {h['epsilon']}")
    print(f"nodes:      {int(db.core_sizes.sum())} "
          f"(min {int(db.core_sizes.min())}, "
          f"max {int(db.core_sizes.max())})")
    return 0


def main(argv=None) -> int:
    import os

    # Honor JAX_PLATFORMS even where an interpreter-startup hook
    # (sitecustomize) pre-pins another platform: env vars are read before
    # the hook runs, so only jax.config reliably selects the backend.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from deciphon_tpu.utils import jaxcache

    jaxcache.enable()
    log.setup()
    ap = argparse.ArgumentParser(prog="dcp-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("serve", help="run the scheduler-polling worker")
    p.add_argument("--env", default=".env")
    p.add_argument("--cache-dir", default="")
    p.add_argument("--single-run", action="store_true")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("press", help="compile a HMMER3 .hmm into a .dtp db")
    p.add_argument("hmm")
    p.add_argument("-o", "--output", default="")
    p.add_argument("--epsilon", type=float, default=0.01)
    p.add_argument("--uniform-entry", action="store_true")
    p.set_defaults(fn=cmd_press)

    p = sub.add_parser("scan", help="scan FASTA reads against a .dtp db")
    p.add_argument("db")
    p.add_argument("fasta")
    p.add_argument("-o", "--output", default="")
    p.add_argument("--lrt-threshold", type=float, default=10.0)
    p.add_argument("--no-multi-hits", action="store_true")
    p.add_argument("--hmmer3-compat", action="store_true")
    p.set_defaults(fn=cmd_scan)

    p = sub.add_parser("info", help="describe a .dtp database")
    p.add_argument("db")
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    # error boundary: user-level failures become one log line + exit code,
    # not a traceback (reference couples every error path to a logged rc,
    # include/deciphon/core/logging.h:116-156)
    try:
        return args.fn(args)
    except DcpError as e:
        log.error(str(e))
        return int(e.rc) or 1
    except (FileNotFoundError, IsADirectoryError, PermissionError) as e:
        log.error(f"{RC.EIO}: {e}")
        return int(RC.EIO)
    except ValueError as e:
        log.error(f"{RC.EINVAL}: {e}")
        return int(RC.EINVAL)
    except KeyboardInterrupt:
        return 130


if __name__ == "__main__":
    sys.exit(main())

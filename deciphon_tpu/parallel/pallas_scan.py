"""Production sharded scan: the Pallas Viterbi kernel under shard_map.

The TPU-native analogue of the reference's profile partitioning
(src/db/profile_reader.c:44-72 prefix-sum partitions consumed by the
OpenMP loop in src/server/scan.c:239-258).  Profile *groups* — the
kernel's packed [P, ...] leading axis, each one GROUP=16 profiles of a
common core-size bucket — shard over the mesh's 'profiles' axis, and
sequence groups shard over 'seqs'.  Each device runs the same Pallas
kernel on its local (profile-groups x seq-groups) tile; the full score
matrices come back sharded and the host extracts every LRT-passing
(seq, profile) pair, preserving single-device scan semantics
(src/server/scan_thread.c:121-129: all passing pairs, not best-per-read).

Work balance falls out of the packing: every group within a core-size
bucket costs the same (same kpad, same GROUP width), so a block-cyclic
placement of groups over 'profiles' is the tensor analogue of
xmath_partition_size's balanced byte splits (xmath.h:228-234).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deciphon_tpu.ops import viterbi_jax as vj
from deciphon_tpu.ops import viterbi_pallas as vp


def _pad_axis0(a: np.ndarray, mult: int, fill) -> np.ndarray:
    n = a.shape[0]
    np_ = (n + mult - 1) // mult * mult
    if np_ == n:
        return a
    pad = np.full((np_ - n,) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


class ShardedPallasBlock:
    """A PallasBlock whose profile groups are sharded over a mesh.

    Same `.scores()` contract as ops.viterbi_pallas.PallasBlock: padding
    groups carry NEG everywhere so their scores never pass the LRT gate,
    and the caller slices [:nseqs, :nprofiles] off the merged matrix.
    """

    def __init__(self, block: vj.ProfileBlock, mesh: Mesh,
                 n_stream: int | None = None, group: int = vp.GROUP,
                 nsegs: int = 1):
        femis_m, femis_in, trans, B = vp.pack_block(block, group, nsegs)
        self.mesh = mesh
        dp = mesh.shape["profiles"]
        femis_m = _pad_axis0(femis_m, dp, vj.NEG)
        femis_in = _pad_axis0(femis_in, dp, vj.NEG)
        trans = _pad_axis0(trans, dp, vj.NEG)
        sh = NamedSharding(mesh, P("profiles"))
        self.femis_m = jax.device_put(femis_m, sh)
        self.femis_in = jax.device_put(femis_in, sh)
        self.trans = jax.device_put(trans, sh)
        self.nprofiles = B
        self.group = group
        self.nsegs = nsegs
        self.kpad = femis_m.shape[-1]  # kernel lane width (nsegs * segw)
        self.ngroups = femis_m.shape[0]
        self.ntab = femis_m.shape[1]
        if n_stream is None:
            n_stream = (
                0 if vp.resident_ok(self.kpad, self.group, self.ntab)
                else 2
            )
        self.n_stream = n_stream

    def put_seqs(self, seqinfo: np.ndarray, seqlens: np.ndarray):
        """Upload a packed sequence batch sharded over 'seqs'.  The SG
        axis must already be a multiple of the mesh's 'seqs' size (pass
        sg_multiple to make_seqinfo)."""
        sh = NamedSharding(self.mesh, P("seqs"))
        return jax.device_put(seqinfo, sh), jax.device_put(seqlens, sh)

    def scores(self, seqinfo, seqlens, nseqs: int,
               multi_hits: bool = True, hmmer3_compat: bool = False,
               interpret: bool = False, trim_rows: bool = True,
               semiring: str = "max"):
        nseq = seqinfo.shape[2] * seqinfo.shape[3] // vp.WC
        alt, null = _run_sharded(
            self.mesh, self.femis_m, self.femis_in, self.trans,
            seqinfo, seqlens,
            K=self.kpad, nseq=nseq, nprofiles=self.nprofiles,
            multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
            interpret=interpret, n_stream=self.n_stream,
            group=self.group, nsegs=self.nsegs, semiring=semiring,
        )
        if trim_rows and alt.shape[0] != nseqs:
            alt = alt[:nseqs]
            null = null[:nseqs]
        return alt, null


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "K", "nseq", "nprofiles", "multi_hits", "hmmer3_compat",
        "interpret", "n_stream", "group", "nsegs", "semiring",
    ),
)
def _run_sharded(mesh, femis_m, femis_in, trans, seqinfo, seqlens, *,
                 K, nseq, nprofiles, multi_hits, hmmer3_compat, interpret,
                 n_stream, group=vp.GROUP, nsegs=1, semiring="max"):
    def local(fm, fin, tr, si, sl):
        return vp.run_block_raw(
            fm, fin, tr, si, sl,
            K=K, P=fm.shape[0], nseq=nseq,
            multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
            interpret=interpret, n_stream=n_stream, group=group,
            nsegs=nsegs, semiring=semiring,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("profiles"), P("profiles"), P("profiles"),
                  P("seqs"), P("seqs")),
        out_specs=(P("profiles", "seqs"), P("profiles", "seqs")),
        check_vma=False,
    )
    alt, null = fn(femis_m, femis_in, trans, seqinfo, seqlens)
    # output epilogue fused into the same dispatch (the single-chip
    # path's run_scores_raw, minus the shard_map): [P,SG,nseq,ncols] ->
    # [rows, profiles] with the profile-column trim; the row trim stays
    # out so batch-size changes reuse the executable
    P_, SG = alt.shape[0], alt.shape[1]
    ncols = nsegs * group

    def epi(x):
        return (
            jnp.transpose(x, (1, 2, 0, 3))
            .reshape(SG * nseq, P_ * ncols)[:, :nprofiles]
        )

    return epi(alt), epi(null)


def put_sharded_block(mesh: Mesh, block: vj.ProfileBlock) -> tuple:
    """Pad the profile axis to the 'profiles' mesh size and device_put a
    host ProfileBlock sharded over it (upload once, reuse across scan
    batches — the tensor analogue of the reference's profiles staying
    open per thread, src/db/profile_reader.c:14-23)."""
    dp = mesh.shape["profiles"]
    padded = vj.ProfileBlock(
        *(
            _pad_axis0(np.asarray(a),
                       dp,
                       1 if a.dtype == np.int32 else vj.NEG)
            for a in block
        )
    )
    psh = NamedSharding(mesh, P("profiles"))
    return tuple(jax.device_put(a, psh) for a in padded)


def sharded_viterbi_scores(
    mesh: Mesh,
    block: vj.ProfileBlock,  # host (numpy) block
    eidx: np.ndarray,
    seq_len: np.ndarray,
    multi_hits: bool = True,
    hmmer3_compat: bool = False,
    dev_block: tuple | None = None,
    semiring: str = "max",
):
    """XLA-engine scan step under shard_map: full (alt, null) matrices.

    Fallback path for blocks outside the Pallas envelope; pads the
    profile axis to the 'profiles' mesh size and the sequence axis to
    'seqs', then slices the padding back off.  Pass ``dev_block`` (from
    ``put_sharded_block``) to reuse an already-uploaded block across
    batches.  Returns device arrays [S, B]."""
    ds = mesh.shape["seqs"]
    B = block.fm.shape[0]
    S = eidx.shape[0]
    if dev_block is None:
        dev_block = put_sharded_block(mesh, block)
    eidx_p = _pad_axis0(np.asarray(eidx, np.int32), ds, 0)
    slen_p = _pad_axis0(np.asarray(seq_len, np.int32), ds, 1)
    ssh = NamedSharding(mesh, P("seqs"))
    deidx = jax.device_put(eidx_p, ssh)
    dslen = jax.device_put(slen_p, ssh)
    alt, null = _xla_sharded(
        mesh, dev_block, deidx, dslen,
        multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
        semiring=semiring,
    )
    return alt[:S, :B], null[:S, :B]


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "multi_hits", "hmmer3_compat", "semiring"),
)
def _xla_sharded(mesh, block_arrays, eidx, seq_len, *,
                 multi_hits, hmmer3_compat, semiring="max"):
    nb = len(block_arrays)

    def local(blk, e, sl):
        return vj.viterbi_scores(
            vj.ProfileBlock(*blk), e, sl,
            multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
            semiring=semiring,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(tuple(P("profiles") for _ in range(nb)),
                  P("seqs"), P("seqs")),
        out_specs=(P("seqs", "profiles"), P("seqs", "profiles")),
        check_vma=False,
    )
    return fn(block_arrays, eidx, seq_len)

"""Pallas TPU kernel for the batched codon-frame Viterbi.

The speed-of-light path for the scan hot loop (replaces imm_dp_viterbi,
reference src/server/scan_thread.c:115-118).  One kernel instance scores
GROUP profiles (VPU sublanes) x K core nodes (VPU lanes) against one
sequence; the grid runs (profile-groups x sequences) with the sequence axis
innermost so each group's fragment tables stay VMEM-resident across the
whole read batch — the direct fix for the reference's
re-read-the-DB-per-sequence design (scan_thread.c:96-99).

Layout decisions (see /opt/skills/guides/pallas_guide.md):
  - match fragment tables femis_m[1365, GROUP, K] are DMA'd manually into
    a persistent VMEM scratch once per profile group (single-buffered —
    they are too big to double-buffer at GROUP=16), so per-position
    emission lookup is one dynamic row slice femis[idx] -> [GROUP, K];
  - the 5-position DP lookback is register-rotated loop carries (static
    addressing), with the lane-shifted copies of VM/VI/VD precomputed once
    per position instead of per lookback length;
  - the mute D-chain prefix-max runs as log2(K) lane-shift maxes;
  - sequence fragment indices are DMA'd to SMEM so row indices are scalar
    reads;
  - special-state transitions are recomputed per sequence from its length
    inside the kernel (protein_profile_setup semantics,
    src/model/protein_profile.c:155-216).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deciphon_tpu.models.frame import FRAG_SENTINEL
from deciphon_tpu.ops.viterbi_jax import NEG, ProfileBlock

GROUP = 16  # profiles per kernel instance (sublane dim)
NTAB = FRAG_SENTINEL + 1  # 1365 fragment rows incl. -inf sentinel

# trans plane order in the packed [P, NPLANES, GROUP, K] tensor
(P_ENTRY, P_MM, P_IM, P_DM, P_MI, P_II, P_ABASE, P_CDD) = range(8)
NPLANES = 8


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _shift_lanes(x, sh: int):
    """Shift +sh along the lane (last) axis, filling with NEG."""
    rolled = pltpu.roll(x, shift=sh, axis=x.ndim - 1)
    return jnp.where(_lane_iota(x.shape) < sh, NEG, rolled)


def _cummax_lanes(x, k: int):
    sh = 1
    while sh < k:
        x = jnp.maximum(x, _shift_lanes(x, sh))
        sh *= 2
    return x


def _kernel(
    seqinfo_ref,  # HBM [S, 1, W] int32: flattened eidx + seq_len
    femis_m_hbm,  # HBM [P, NTAB, GROUP, K]
    femis_i_ref,  # VMEM [1, NTAB, GROUP]
    femis_n_ref,  # VMEM [1, NTAB, GROUP]
    trans_ref,  # VMEM [1, NPLANES, GROUP, K]
    alt_ref,  # VMEM [1, S, GROUP]
    null_ref,  # VMEM [1, S, GROUP]
    femis_m,  # scratch VMEM [NTAB, GROUP, K] (persists across grid steps)
    ring_m,  # scratch VMEM [5, GROUP, K]: VM (unshifted, feeds M->I)
    ring_ms,  # scratch VMEM [5, GROUP, K]: VM lane-shifted (feeds M->M)
    ring_i,  # scratch VMEM [5, GROUP, K]: VI (unshifted, feeds I->I)
    ring_is,  # scratch VMEM [5, GROUP, K]: VI lane-shifted (feeds I->M)
    ring_ds,  # scratch VMEM [5, GROUP, K]: VD lane-shifted (feeds D->M)
    ring_s,  # scratch VMEM [5, 8, GROUP]: specials
    eidx_smem,  # scratch SMEM [1, W] int32
    femis_sem,
    eidx_sem,
    *,
    L: int,
    K: int,
    multi_hits: bool,
    hmmer3_compat: bool,
):
    p_id = pl.program_id(0)
    s_id = pl.program_id(1)

    # sequence fragment indices -> SMEM (scalar reads feed dynamic slices)
    eidx_dma = pltpu.make_async_copy(
        seqinfo_ref.at[s_id], eidx_smem, eidx_sem
    )
    eidx_dma.start()

    # match fragment tables -> VMEM, once per profile group (the sequence
    # axis is innermost, so the scratch stays valid for the whole batch)
    @pl.when(s_id == 0)
    def _():
        dma = pltpu.make_async_copy(
            femis_m_hbm.at[p_id], femis_m, femis_sem
        )
        dma.start()
        dma.wait()

    eidx_dma.wait()

    # special-state transitions from the sequence length
    seq_len = eidx_smem[0, L * 5]
    Lf = seq_len.astype(jnp.float32)
    if multi_hits:
        q = 0.5
        log_q = float(np.log(0.5))
        log_1q = float(np.log(0.5))
    else:
        q = 0.0
        log_q = NEG
        log_1q = 0.0
    denom = jnp.log(Lf + 2.0 + q / (1.0 - q))
    t_NN = jnp.log(Lf) - denom
    t_NB = jnp.log(2.0 + q / (1.0 - q)) - denom
    t_RR = jnp.log(Lf) - jnp.log(Lf + 1.0)
    if hmmer3_compat:
        t_NN = jnp.float32(0.0)
    t_CC = t_JJ = t_NN
    t_CT = t_JB = t_NB
    t_EJ = jnp.float32(log_q)
    t_EC = jnp.float32(log_1q)

    entry = trans_ref[0, P_ENTRY]
    mm_in = trans_ref[0, P_MM]
    im_in = trans_ref[0, P_IM]
    dm_in = trans_ref[0, P_DM]
    mi = trans_ref[0, P_MI]
    ii = trans_ref[0, P_II]
    a_base = trans_ref[0, P_ABASE]
    cdd = trans_ref[0, P_CDD]

    negk = jnp.full((GROUP, K), NEG, dtype=jnp.float32)
    negg = jnp.full((GROUP,), NEG, dtype=jnp.float32)
    for slot in range(5):
        ring_m[slot] = negk
        ring_ms[slot] = negk
        ring_i[slot] = negk
        ring_is[slot] = negk
        ring_ds[slot] = negk
        ring_s[slot] = jnp.full((8, GROUP), NEG, dtype=jnp.float32)

    # specials row ids inside ring_s
    S_B, S_N, S_J, S_C, S_E, S_R = range(6)

    def position(i, j):
        """One DP position; j = i mod 5 is compile-time, so every ring
        access below uses a static slot."""
        accM = negk
        accI = negk
        accN = negg
        accJ = negg
        accC = negg
        accR = negg
        # hoist all emission loads so the VMEM latency overlaps compute
        idxs = [eidx_smem[0, (i - 1) * 5 + (l - 1)] for l in range(1, 6)]
        em_ms = [femis_m[idx] for idx in idxs]  # [GROUP, K] x5
        em_is = [femis_i_ref[0, idx] for idx in idxs]  # [GROUP] x5
        em_ns = [femis_n_ref[0, idx] for idx in idxs]  # [GROUP] x5
        for l in range(1, 6):
            slot = (j - l) % 5
            em_m = em_ms[l - 1]
            em_i = em_is[l - 1]
            em_n = em_ns[l - 1]
            from_start = (l == i)  # position i-l == 0
            sp = ring_s[slot]
            prevB = jnp.where(from_start, t_NB, sp[S_B])

            cand = jnp.maximum(
                prevB[:, None] + entry,
                jnp.maximum(
                    ring_ms[slot] + mm_in,
                    jnp.maximum(
                        ring_is[slot] + im_in, ring_ds[slot] + dm_in
                    ),
                ),
            )
            accM = jnp.maximum(accM, cand + em_m)
            accI = jnp.maximum(
                accI,
                jnp.maximum(ring_m[slot] + mi, ring_i[slot] + ii)
                + em_i[:, None],
            )
            start0 = jnp.where(from_start, 0.0, NEG)
            accN = jnp.maximum(
                accN, jnp.maximum(sp[S_N], start0) + t_NN + em_n
            )
            accJ = jnp.maximum(
                accJ,
                jnp.maximum(sp[S_E] + t_EJ, sp[S_J]) + t_JJ + em_n,
            )
            accC = jnp.maximum(
                accC,
                jnp.maximum(sp[S_E] + t_EC, sp[S_C]) + t_CC + em_n,
            )
            accR = jnp.maximum(
                accR, jnp.maximum(sp[S_R] + t_RR, start0) + em_n
            )

        # mute D-chain: VD = cdd + cummax(VM + a_base) shifted by one lane
        a = accM + a_base
        b = _cummax_lanes(a, K)
        VD = jnp.maximum(cdd + _shift_lanes(b, 1), NEG)

        VE = jnp.max(jnp.maximum(accM, VD), axis=-1)  # [GROUP]
        VB = jnp.maximum(
            accN + t_NB,
            jnp.maximum(VE + t_EJ + t_JB, accJ + t_JB),
        )
        VT = jnp.maximum(VE + t_EC + t_CT, accC + t_CT)

        @pl.when(i == seq_len)
        def _():
            alt_ref[0, s_id, :] = VT
            null_ref[0, s_id, :] = accR

        ring_m[j] = accM
        ring_ms[j] = _shift_lanes(accM, 1)
        ring_i[j] = accI
        ring_is[j] = _shift_lanes(accI, 1)
        ring_ds[j] = _shift_lanes(VD, 1)
        ring_s[j] = jnp.stack(
            [VB, accN, accJ, accC, VE, accR, negg, negg], axis=0
        )

    def chunk(c, _):
        base = c * 5
        for j in range(5):
            position(base + j + 1, (j + 1) % 5)
        return ()

    nchunks = (L + 4) // 5  # positions beyond L are harmless: their
    # emissions read zero-filled eidx (a real fragment index) but outputs
    # are only captured at i == seq_len <= L
    jax.lax.fori_loop(0, nchunks, chunk, (), unroll=False)


def pack_block(block: ProfileBlock):
    """Host-side packing of a ProfileBlock into kernel layout.

    Returns (femis_m [P,NTAB,GROUP,K], femis_i [P,NTAB,GROUP],
    femis_n [P,NTAB,GROUP], trans [P,NPLANES,GROUP,K], B) with the profile
    axis padded to GROUP multiples.
    """
    fm = np.asarray(block.fm, np.float32)
    fi = np.asarray(block.fi, np.float32)
    fn = np.asarray(block.fn, np.float32)
    B, K, ntab = fm.shape
    assert ntab == NTAB
    Bp = ((B + GROUP - 1) // GROUP) * GROUP
    P = Bp // GROUP

    def padB(a):
        if a.shape[0] == Bp:
            return a
        pad = np.full((Bp - a.shape[0],) + a.shape[1:], NEG, a.dtype)
        return np.concatenate([a, pad], axis=0)

    femis_m = (
        padB(fm).reshape(P, GROUP, K, NTAB).transpose(0, 3, 1, 2).copy()
    )
    femis_i = padB(fi).reshape(P, GROUP, NTAB).transpose(0, 2, 1).copy()
    femis_n = padB(fn).reshape(P, GROUP, NTAB).transpose(0, 2, 1).copy()

    def arrK(name):
        return padB(np.asarray(getattr(block, name), np.float32))

    dd = arrK("dd_in")
    dd_safe = np.maximum(dd, NEG / 1e6)
    dd_safe[:, 0] = 0.0
    cdd = np.cumsum(dd_safe, axis=1, dtype=np.float64).astype(np.float32)
    md = arrK("md_in")
    md_next = np.concatenate(
        [md[:, 1:], np.full((Bp, 1), NEG, np.float32)], axis=1
    )
    cdd_next = np.concatenate([cdd[:, 1:], cdd[:, -1:]], axis=1)
    a_base = np.maximum(md_next - cdd_next, NEG)

    planes = np.stack(
        [
            arrK("entry"), arrK("mm_in"), arrK("im_in"), arrK("dm_in"),
            arrK("mi"), arrK("ii"), a_base, cdd,
        ],
        axis=1,
    )  # [Bp, NPLANES, K]
    trans = planes.reshape(P, GROUP, NPLANES, K).transpose(0, 2, 1, 3).copy()
    return femis_m, femis_i, femis_n, trans, B


@functools.partial(
    jax.jit,
    static_argnames=(
        "multi_hits", "hmmer3_compat", "interpret", "L", "K", "P",
    ),
)
def _run(
    femis_m, femis_i, femis_n, trans, seqinfo,
    *, L: int, K: int, P: int,
    multi_hits: bool, hmmer3_compat: bool, interpret: bool,
):
    S = seqinfo.shape[0]
    W = seqinfo.shape[-1]
    kernel = functools.partial(
        _kernel, L=L, K=K,
        multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
    )
    grid = (P, S)
    out_shape = [
        jax.ShapeDtypeStruct((P, S, GROUP), jnp.float32),
        jax.ShapeDtypeStruct((P, S, GROUP), jnp.float32),
    ]
    alt, null = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # seqinfo -> SMEM DMA
            pl.BlockSpec(memory_space=pltpu.HBM),  # femis_m -> VMEM DMA
            pl.BlockSpec(
                (1, NTAB, GROUP), lambda p, s: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NTAB, GROUP), lambda p, s: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NPLANES, GROUP, K), lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, S, GROUP), lambda p, s: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, S, GROUP), lambda p, s: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((NTAB, GROUP, K), jnp.float32),
            pltpu.VMEM((5, GROUP, K), jnp.float32),
            pltpu.VMEM((5, GROUP, K), jnp.float32),
            pltpu.VMEM((5, GROUP, K), jnp.float32),
            pltpu.VMEM((5, GROUP, K), jnp.float32),
            pltpu.VMEM((5, GROUP, K), jnp.float32),
            pltpu.VMEM((5, 8, GROUP), jnp.float32),
            pltpu.SMEM((1, W), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(seqinfo, femis_m, femis_i, femis_n, trans)
    return alt, null


def make_seqinfo(eidx: np.ndarray, seq_len: np.ndarray) -> np.ndarray:
    """Pack [S, L, 5] end-fragment indices + lengths into the kernel's
    lane-aligned [S, 1, W] int32 layout (seq_len stored at flat index L*5)."""
    eidx = np.asarray(eidx, np.int32)
    S, L, five = eidx.shape
    assert five == 5
    W = ((L * 5 + 40 + 127) // 128) * 128  # margin for the 5-position chunking
    seqinfo = np.zeros((S, 1, W), np.int32)
    seqinfo[:, 0, : L * 5] = eidx.reshape(S, L * 5)
    seqinfo[:, 0, L * 5] = np.asarray(seq_len, np.int32)
    return seqinfo


class PallasBlock:
    """A profile block packed + resident on device for repeated scans."""

    def __init__(self, block: ProfileBlock):
        femis_m, femis_i, femis_n, trans, B = pack_block(block)
        self.femis_m = jnp.asarray(femis_m)
        self.femis_i = jnp.asarray(femis_i)
        self.femis_n = jnp.asarray(femis_n)
        self.trans = jnp.asarray(trans)
        self.nprofiles = B
        self.kpad = femis_m.shape[-1]
        self.ngroups = femis_m.shape[0]

    def scores(
        self,
        seqinfo,
        seq_pad_len: int,
        multi_hits: bool = True,
        hmmer3_compat: bool = False,
        interpret: bool = False,
    ):
        """(alt [S, B], null [S, B]) device arrays for a packed seq batch."""
        alt, null = _run(
            self.femis_m, self.femis_i, self.femis_n, self.trans,
            seqinfo,
            L=seq_pad_len, K=self.kpad, P=self.ngroups,
            multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
            interpret=interpret,
        )
        S = seqinfo.shape[0]
        # [P, S, GROUP] -> [S, P*GROUP] -> trim group padding
        alt = jnp.transpose(alt, (1, 0, 2)).reshape(S, -1)[:, : self.nprofiles]
        null = jnp.transpose(null, (1, 0, 2)).reshape(S, -1)[
            :, : self.nprofiles
        ]
        return alt, null


def viterbi_scores_pallas(
    block: ProfileBlock,
    eidx: np.ndarray,  # [S, L, 5] int32
    seq_len: np.ndarray,  # [S] int32
    multi_hits: bool = True,
    hmmer3_compat: bool = False,
    interpret: bool = False,
):
    """Drop-in (stateless) replacement for viterbi_jax.viterbi_scores.

    For repeated scans over the same profiles use PallasBlock directly —
    this convenience wrapper re-packs and re-uploads the tables each call.
    """
    pb = PallasBlock(block)
    L = np.asarray(eidx).shape[1]
    seqinfo = jnp.asarray(make_seqinfo(eidx, seq_len))
    alt, null = pb.scores(
        seqinfo, L,
        multi_hits=multi_hits, hmmer3_compat=hmmer3_compat,
        interpret=interpret,
    )
    return np.asarray(alt), np.asarray(null)

"""Accelerated Viterbi traceback: jitted backpointer DP + host path walk.

Pass 2 of the scan re-derives the state path for LRT survivors (reference
runs imm_dp_viterbi's path machinery per hit, src/server/scan_thread.c:125-129
feeding src/server/prod.c:153-181).  The numpy oracle (ops/viterbi_ref.py)
costs 0.4-8 s per hit at Pfam-like sizes; this engine runs the identical
recurrence as one ``lax.scan`` with per-position argmax codes emitted as
scan outputs, then walks the codes on the host in O(path length).

Tie-breaking replicates the oracle exactly: candidates flatten in
(fragment length asc, origin asc) order and argmax takes the first
maximum, so paths are identical — not merely score-equivalent — modulo
f32-vs-f64 rounding of genuinely distinct candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from deciphon_tpu.models import state as st
from deciphon_tpu.models.profile import ProteinProfile
from deciphon_tpu.ops import viterbi_ref as vr
from deciphon_tpu.ops.emissions import fragment_indices
from deciphon_tpu.ops.viterbi_jax import (
    NEG,
    ProfileBlock,
    _specials,
    build_profile_block,
    end_fragment_indices,
)


@functools.partial(
    jax.jit, static_argnames=("multi_hits", "hmmer3_compat")
)
def _trace_scan(block_row, eidx, seq_len, multi_hits, hmmer3_compat):
    """Backpointer-emitting Viterbi for ONE profile x ONE sequence.

    Same recurrence as viterbi_jax._viterbi_single; returns the final
    (alt, null) scores plus per-position argmax codes:
      bpM, bpI [L, K] int32 flattened (l-1)*origins + origin
      dD [L, K] bool: D-chain extends (origin D) vs direct (origin M)
      bpE [L] int32 in [0, 2K): < K -> M_k, else D_{k-K}
      bpN, bpJ, bpC [L] int32 flattened (l-1)*2 + origin
      bpB [L] int32 0=S 1=N 2=E 3=J;  bpT [L] int32 0=E 1=C
      bpR [L] int32 l-1 (null-model fragment length)
    """
    (fm, fi, fn, entry, mm_in, im_in, dm_in, md_in, dd_in, mi, ii, core) = (
        block_row
    )
    K = fm.shape[0]
    # cast specials to the block dtype so the scan carry is width-stable
    # under JAX_ENABLE_X64 (same fix as viterbi_jax._viterbi_single)
    xt = {
        k: jnp.asarray(v).astype(fm.dtype)
        for k, v in _specials(seq_len, multi_hits, hmmer3_compat).items()
    }

    dd_safe = jnp.maximum(dd_in, NEG / 1e6)
    cdd = jnp.cumsum(dd_safe.at[0].set(0.0))
    md_next = jnp.concatenate([md_in[1:], jnp.full((1,), NEG)])
    cdd_next = jnp.concatenate([cdd[1:], cdd[-1:]])

    neg_k = jnp.full((5, K), NEG, dtype=jnp.float32)
    neg_5 = jnp.full((5,), NEG, dtype=jnp.float32)
    carry0 = dict(
        VM=neg_k, VI=neg_k, VD=neg_k,
        VS=neg_5.at[0].set(0.0),
        VN=neg_5, VJ=neg_5, VC=neg_5, VE=neg_5,
        VB=neg_5.at[0].set(xt["NB"]),
        VR=neg_5,
    )

    def shift_k(a):
        return jnp.concatenate(
            [jnp.full(a.shape[:-1] + (1,), NEG, a.dtype), a[..., :-1]], -1
        )

    def step(carry, eidx_i):
        em_m = fm[:, eidx_i].T  # [5, K]
        em_i = fi[eidx_i]  # [5]
        em_n = fn[eidx_i]  # [5]

        # match: candidates [5 lengths, 4 origins(B,M,I,D), K]
        candM = jnp.stack(
            [
                carry["VB"][:, None] + entry[None, :],
                shift_k(carry["VM"]) + mm_in,
                shift_k(carry["VI"]) + im_in,
                shift_k(carry["VD"]) + dm_in,
            ],
            axis=1,
        ) + em_m[:, None, :]
        flatM = candM.reshape(20, K)
        bpM = jnp.argmax(flatM, axis=0).astype(jnp.int32)
        VM = jnp.max(flatM, axis=0)

        # insert: [5, 2 origins(M,I), K]
        candI = jnp.stack(
            [carry["VM"] + mi, carry["VI"] + ii], axis=1
        ) + em_i[:, None, None]
        flatI = candI.reshape(10, K)
        bpI = jnp.argmax(flatI, axis=0).astype(jnp.int32)
        VI = jnp.max(flatI, axis=0)

        # N / J / C loops: [5, 2 origins]
        candN = jnp.stack(
            [carry["VS"] + xt["NN"], carry["VN"] + xt["NN"]], axis=1
        ) + em_n[:, None]
        candJ = jnp.stack(
            [
                carry["VE"] + xt["EJ"] + xt["JJ"],
                carry["VJ"] + xt["JJ"],
            ],
            axis=1,
        ) + em_n[:, None]
        candC = jnp.stack(
            [
                carry["VE"] + xt["EC"] + xt["CC"],
                carry["VC"] + xt["CC"],
            ],
            axis=1,
        ) + em_n[:, None]
        bpN = jnp.argmax(candN.reshape(10)).astype(jnp.int32)
        bpJ = jnp.argmax(candJ.reshape(10)).astype(jnp.int32)
        bpC = jnp.argmax(candC.reshape(10)).astype(jnp.int32)
        VN = jnp.max(candN)
        VJ = jnp.max(candJ)
        VC = jnp.max(candC)

        # null-model R loop: [5] candidates in l order
        candR = jnp.maximum(carry["VR"] + xt["RR"], carry["VS"]) + em_n
        bpR = jnp.argmax(candR).astype(jnp.int32)
        VR = jnp.max(candR)

        # D-chain via prefix cummax; binary bp: direct M_{k-1} vs chain
        a = VM + md_next - cdd_next
        b = jax.lax.cummax(a)
        VD = cdd + jnp.concatenate([jnp.full((1,), NEG), b[:-1]])
        VD = jnp.maximum(VD, NEG)
        a_prev = jnp.concatenate([jnp.full((1,), NEG), a[:-1]])  # a[k-1]
        b_prev2 = jnp.concatenate([jnp.full((2,), NEG), b[:-2]])  # b[k-2]
        dD = a_prev < b_prev2  # True -> chain extends through D_{k-1}

        # E: all M before any D on ties (oracle strict > for D)
        maskedD = jnp.where(
            jax.lax.iota(jnp.int32, K) == 0, jnp.float32(NEG), VD
        )
        flatE = jnp.concatenate([VM, maskedD])
        bpE = jnp.argmax(flatE).astype(jnp.int32)
        VE = jnp.max(flatE)

        # S->B only occurs at position 0 (handled by the carry init);
        # at i>=1 the S origin is impossible, so its slot is pinned -inf
        # (slot kept so bpB codes match the oracle's 0=S 1=N 2=E 3=J)
        candB = jnp.stack(
            [
                jnp.float32(NEG),
                VN + xt["NB"],
                VE + xt["EJ"] + xt["JB"],
                VJ + xt["JB"],
            ]
        )
        bpB = jnp.argmax(candB).astype(jnp.int32)
        VB = jnp.max(candB)

        candT = jnp.stack([VE + xt["EC"] + xt["CT"], VC + xt["CT"]])
        bpT = jnp.argmax(candT).astype(jnp.int32)
        VT = jnp.max(candT)

        def push(ring, new):
            return jnp.concatenate([new[None], ring[:-1]], axis=0)

        new_carry = dict(
            VM=push(carry["VM"], VM), VI=push(carry["VI"], VI),
            VD=push(carry["VD"], VD),
            VS=push(carry["VS"], jnp.float32(NEG)),
            VN=push(carry["VN"], VN), VJ=push(carry["VJ"], VJ),
            VC=push(carry["VC"], VC), VE=push(carry["VE"], VE),
            VB=push(carry["VB"], VB), VR=push(carry["VR"], VR),
        )
        ys = dict(
            bpM=bpM, bpI=bpI, dD=dD, bpE=bpE, bpN=bpN, bpJ=bpJ,
            bpC=bpC, bpB=bpB, bpT=bpT, bpR=bpR, VT=VT, VR=VR,
        )
        return new_carry, ys

    _, ys = jax.lax.scan(step, carry0, eidx)
    alt = ys["VT"][seq_len - 1]
    null = ys["VR"][seq_len - 1]
    return alt, null, ys


def _walk(ys, L: int, K: int) -> list[tuple[int, int]]:
    """Host walk of the backpointer codes -> imm-style step list."""
    bpM = np.asarray(ys["bpM"])
    bpI = np.asarray(ys["bpI"])
    dD = np.asarray(ys["dD"])
    bpE = np.asarray(ys["bpE"])
    bpN = np.asarray(ys["bpN"])
    bpJ = np.asarray(ys["bpJ"])
    bpC = np.asarray(ys["bpC"])
    bpB = np.asarray(ys["bpB"])
    bpT = np.asarray(ys["bpT"])

    path: list[tuple[int, int]] = [(st.T, 0)]
    i = L  # positions are 1-based; ys index i-1
    cur = ("E", 0) if bpT[L - 1] == 0 else ("C", 0)
    # worst legal path: ~L hits, each traversing an O(K) delete chain of
    # mute steps, so the bound scales with L*K (not L+K)
    guard = L * (K + 8) + 16
    while guard > 0:
        guard -= 1
        kind, k = cur
        if kind == "E":
            path.append((st.E, 0))
            e = int(bpE[i - 1])
            cur = ("M", e) if e < K else ("D", e - K)
        elif kind in ("C", "J", "N"):
            bp = {"C": bpC, "J": bpJ, "N": bpN}[kind][i - 1]
            o, l = int(bp) % 2, int(bp) // 2 + 1
            path.append(({"C": st.C, "J": st.J, "N": st.N}[kind], l))
            i -= l
            nxt = {"C": ("E", "C"), "J": ("E", "J"), "N": ("S", "N")}[kind]
            cur = (nxt[0] if o == 0 else nxt[1], 0)
        elif kind == "B":
            path.append((st.B, 0))
            if i == 0:
                cur = ("S", 0)
            else:
                o = int(bpB[i - 1])
                cur = ({0: ("S", 0), 1: ("N", 0), 2: ("E", 0),
                        3: ("J", 0)}[o])
        elif kind == "M":
            code = int(bpM[i - 1, k])
            l, o = code // 4 + 1, code % 4
            path.append((st.match_id(k), l))
            i -= l
            cur = {0: ("B", 0), 1: ("M", k - 1), 2: ("I", k - 1),
                   3: ("D", k - 1)}[o]
        elif kind == "I":
            code = int(bpI[i - 1, k])
            l, o = code // 2 + 1, code % 2
            path.append((st.insert_id(k), l))
            i -= l
            cur = ("M", k) if o == 0 else ("I", k)
        elif kind == "D":
            path.append((st.delete_id(k), 0))
            cur = ("D", k - 1) if dD[i - 1, k] else ("M", k - 1)
        elif kind == "S":
            path.append((st.S, 0))
            break
    else:
        raise RuntimeError("traceback walk did not terminate")
    path.reverse()
    return path


@functools.partial(
    jax.jit, static_argnames=("multi_hits", "hmmer3_compat")
)
def _trace_scan_batch(block_rows, eidx, seq_len, multi_hits, hmmer3_compat):
    """vmap of _trace_scan over a stacked hit axis: one device dispatch
    tracebacks a whole (kpad, length-bucket) group of LRT survivors."""

    def one(row, e, sl):
        return _trace_scan(row, e, sl, multi_hits, hmmer3_compat)

    return jax.vmap(one)(block_rows, eidx, seq_len)


# survivors per traceback dispatch: bounds the [H, L, K] backpointer
# tensors (2x int32 + bool) to ~hundreds of MB at the worst shapes
TRACE_BATCH = 128


def viterbi_alt_batch(
    profs: list[ProteinProfile],
    seqs: list[np.ndarray],
    multi_hits: bool = True,
    hmmer3_compat: bool = False,
    kpad: int | None = None,
    pad_to: int | None = None,
    codes: tuple | None = None,
) -> list[vr.ViterbiResult]:
    """Batched traceback: one jitted backpointer DP over a stack of
    (profile, read) hits sharing a (kpad, length-bucket, codes) class,
    replacing one device dispatch per hit (the round-2 bottleneck at
    permissive LRT thresholds).  Host walks stay per hit (O(path))."""
    base = 4 + len(codes) if codes else 4
    Lp = pad_to or max(len(s) for s in seqs)
    out: list[vr.ViterbiResult] = []
    for lo in range(0, len(profs), TRACE_BATCH):
        chunk_p = profs[lo : lo + TRACE_BATCH]
        chunk_s = seqs[lo : lo + TRACE_BATCH]
        # pad the hit axis to a power-of-two tier so jit compiles at most
        # log2(TRACE_BATCH) variants per (kpad, Lp, codes) class instead
        # of one per distinct survivor count (a cold-start sink)
        H = len(chunk_p)
        Hp = 1
        while Hp < H:
            Hp *= 2
        pad_p = chunk_p + [chunk_p[0]] * (Hp - H)
        pad_s = chunk_s + [chunk_s[0]] * (Hp - H)
        block = build_profile_block(pad_p, kpad=kpad, codes=codes)
        eidx = np.stack(
            [
                end_fragment_indices(
                    fragment_indices(s, pad_to=Lp, base=base), base=base
                )
                for s in pad_s
            ]
        )
        lens = np.array([len(s) for s in pad_s], np.int32)
        alt, _, ys = _trace_scan_batch(
            tuple(block), jnp.asarray(eidx), jnp.asarray(lens),
            multi_hits, hmmer3_compat,
        )
        ys_host = jax.device_get(ys)
        alt = np.asarray(alt)
        K = int(block.fm.shape[1])
        for h in range(len(chunk_p)):
            ys_h = {k: v[h] for k, v in ys_host.items()}
            path = _walk(ys_h, int(lens[h]), K)
            out.append(vr.ViterbiResult(float(alt[h]), path))
    return out


def viterbi_alt(
    prof: ProteinProfile,
    seq_idx: np.ndarray,
    multi_hits: bool = True,
    hmmer3_compat: bool = False,
    block_row=None,
    pad_to: int | None = None,
    base: int = 4,
    codes: tuple | None = None,
) -> vr.ViterbiResult:
    """Drop-in accelerated replacement for viterbi_ref.viterbi_alt.

    Pass a prebuilt single-profile ``block_row`` (tuple(ProfileBlock)) to
    skip re-tensorizing per hit; ``pad_to`` pads the position axis so jit
    caches compile once per length bucket.  ``base=5`` scores
    IUPAC-N-extended sequences; ``codes`` scores exact-subset extended
    sequences (block_row, if given, must be built the same way).
    """
    if codes is not None:
        base = 4 + len(codes)
    if block_row is None:
        block_row = tuple(build_profile_block([prof], base=base, codes=codes))
    row = tuple(a[0] for a in block_row)
    L = len(seq_idx)
    Lp = pad_to or L
    eidx = end_fragment_indices(
        fragment_indices(seq_idx, pad_to=Lp, base=base), base=base
    )
    alt, _, ys = _trace_scan(
        row, jnp.asarray(eidx), jnp.int32(L), multi_hits, hmmer3_compat
    )
    path = _walk(jax.device_get(ys), L, int(row[0].shape[0]))
    return vr.ViterbiResult(float(alt), path)

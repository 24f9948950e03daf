"""Device-side (MXU) synthesis of frame-state fragment score tables.

Scan setup cost is dominated by building the per-node fragment tables
F[1365] (models/frame.py): the host dgemm formulation burns ~a hundred
seconds for a Pfam-scale DB and then ships ~GBs of tables over the
interconnect.  This module synthesizes the same tables ON DEVICE from the
compact per-node inputs (codon log-marginals [125] + background nuclt
log-probs [5] — ~10x smaller than the tables), as two one-hot matmuls per
fragment length:

    probs[n, f] = sum_t  coef_t * qq[n, pair(f,t)] * Mp[n, midx(f,t)]
                = ((Mp @ E_l) * (qq @ G_l)).reshape(N, F, T).sum(-1)

with E_l [125, F*T] one-hot over codon-marginal entries and G_l [25, F*T]
one-hot over background-pair entries scaled by the per-class error-model
coefficient (frame.term_coefs).  Both matmuls are dense MXU work at
``Precision.HIGHEST`` (the TPU default would truncate the inputs to
bf16 — measured ~1e-3 per table entry, ~0.05 per 260-nt Viterbi score);
at HIGHEST the arithmetic is exact selection, so the only deviation
from the host f64 path is f32 product/sum rounding (~1e-7 relative).

The reference has no analogue (imm precomputes per-state tables on the
CPU at press time); this is the TPU-native replacement for that setup
path (cf. imm_frame_state usage, reference src/model/protein_model.c:247-254).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from deciphon_tpu.models.frame import (
    FRAG_OFFSET,
    FRAG_SENTINEL,
    NFRAGS,
    TERMS,
    _enumerate_frags,
    term_coefs,
)
from deciphon_tpu.ops.viterbi_jax import NEG

_CONSTS_CACHE: dict[float, list] = {}


def _length_consts(eps: float):
    """Per-length (E [125, F*T], Gc [25, F*T], F, T) one-hot selectors."""
    if eps in _CONSTS_CACHE:
        return _CONSTS_CACHE[eps]
    coefs = term_coefs(eps)
    out = []
    for length in range(1, 6):
        frags = _enumerate_frags(length)  # [F, length]
        F = frags.shape[0]
        fragx = np.concatenate(
            [frags, np.full((F, 1), 4, dtype=frags.dtype)], axis=1
        )
        marg_sel, ins_sel, cls = TERMS[length]
        T = marg_sel.shape[0]
        sel = np.where(marg_sel < 0, length, marg_sel)
        zabc = fragx[:, sel]  # [F, T, 3]
        midx = zabc[..., 0] * 25 + zabc[..., 1] * 5 + zabc[..., 2]  # [F, T]
        isel = np.where(ins_sel < 0, length, ins_sel)
        iidx = fragx[:, isel]  # [F, T, 2] values 0..4
        pair = iidx[..., 0] * 5 + iidx[..., 1]  # [F, T] into qq[25]
        coef = np.array([coefs[c] for c in cls])  # [T]

        E = np.zeros((125, F * T), dtype=np.float32)
        G = np.zeros((25, F * T), dtype=np.float32)
        cols = np.arange(F * T)
        E[midx.reshape(-1), cols] = 1.0
        G[pair.reshape(-1), cols] = np.broadcast_to(coef, (F, T)).reshape(-1)
        out.append((E, G, F, T))
    _CONSTS_CACHE[eps] = out
    return out


@functools.partial(jax.jit, static_argnames=("eps",))
def _synth_chunk(mp, q, eps: float):
    """One fixed-shape [R, 125] x [R, 5] -> [R, NFRAGS] synthesis chunk.

    Shape-stable on purpose: every caller pads to the same R, so the
    whole press/scan pipeline compiles this GEMM graph exactly ONCE
    (a data-dependent lax.map here used to recompile per profile block
    and dominated cold-start)."""
    consts = _length_consts(eps)
    qq = (q[:, :, None] * q[:, None, :]).reshape(q.shape[0], 25)
    # HIGHEST precision is load-bearing: the TPU default truncates
    # matmul inputs to bf16, which skewed every synthesized table entry
    # ~1e-3 and biased whole-read Viterbi scores ~0.05 off the f64
    # oracle at 260 nt (caught by tests/test_tpu_hw.py parity — CPU
    # interpret runs were exact, so only the on-hardware suite sees it)
    dot = functools.partial(
        jnp.matmul, precision=jax.lax.Precision.HIGHEST
    )
    parts = []
    for E, G, F, T in consts:
        p = dot(mp, jnp.asarray(E)) * dot(qq, jnp.asarray(G))
        parts.append(p.reshape(p.shape[0], F, T).sum(-1))
    probs = jnp.concatenate(parts, axis=1)  # [R, NFRAGS]
    return jnp.maximum(jnp.log(probs), NEG)


def synth_fragment_tables(margp, qp, eps: float, row_chunk: int = 4096):
    """[N, NTAB] log fragment tables from linear-space inputs.

    Args:
      margp: [N, 125] codon-marginal probabilities (exp of frame.codon_marg).
      qp: [N, 5] background nucleotide probs with qp[:, 4] = 1 (the
          "no-insertion" sentinel, exp of frame.q5_pad output).
      eps: indel error rate (static).

    Returns [N, NTAB] float32 log-probs, -inf clamped to viterbi_jax.NEG,
    sentinel column NEG.  Dispatches fixed-shape row chunks so XLA
    compiles the synthesis once regardless of N.
    """
    N = margp.shape[0]
    Np = (N + row_chunk - 1) // row_chunk * row_chunk
    margp = jnp.pad(
        jnp.asarray(margp, jnp.float32), ((0, Np - N), (0, 0))
    )
    qp = jnp.pad(jnp.asarray(qp, jnp.float32), ((0, Np - N), (0, 0)))
    logs = [
        _synth_chunk(
            jax.lax.dynamic_slice_in_dim(margp, i, row_chunk),
            jax.lax.dynamic_slice_in_dim(qp, i, row_chunk),
            eps=float(eps),
        )
        for i in range(0, Np, row_chunk)
    ]
    logs = jnp.concatenate(logs, axis=0)[:N] if len(logs) > 1 else logs[0][:N]
    # append the -inf padding sentinel column
    return jnp.concatenate(
        [logs, jnp.full((N, 1), NEG, jnp.float32)], axis=1
    )

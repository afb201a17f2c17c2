"""Batched exact tail-biting Viterbi decoder (K=7, rate 1/3) on TPU.

The reference gets Viterbi from srsLTE's SSE decoder inside
srslte_ue_mib_decode (lib/mib_impl.cc:162).  TPU-native shape: the 64
possible tail-biting initial states become a batch dimension, so one
vectorized 40-step add-compare-select scan is exact maximum-likelihood —
no wrap-around approximation.  All hypothesis batches (N_id_2 roots x
port-count x scrambling quarter) ride the same leading dim.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ltecore import coding

N_STATES = coding.N_STATES


@functools.lru_cache(maxsize=None)
def _tables():
    prev_state, out_bits = coding.trellis_tables()
    return (np.asarray(prev_state, dtype=np.int32),
            np.asarray(out_bits, dtype=np.float32))


def viterbi_decode_tb(llr: jnp.ndarray):
    """Exact tail-biting decode.

    llr: [B, 40, 3] float32 — +1 favours bit 0 (matches out_bits polarity).
    returns: (bits [B, 40] int32, metric [B] float32)
    """
    prev_np, out_np = _tables()
    prev_state = jnp.asarray(prev_np)          # [64, 2]
    out_bits = jnp.asarray(out_np)             # [64, 2, 3]

    B = llr.shape[0]
    eye = jnp.eye(N_STATES, dtype=jnp.float32)
    m0 = jnp.broadcast_to((eye - 1.0) * 1e9, (B, N_STATES, N_STATES))

    def acs(m, r_t):
        # r_t: [B, 3]; branch metric for (state, drop): [B, 64, 2]
        br = jnp.einsum("sdc,bc->bsd", out_bits, r_t)
        cand = m[:, :, prev_state] + br[:, None, :, :]   # [B, I, S, 2]
        dec = jnp.argmax(cand, axis=-1).astype(jnp.int8)
        return jnp.max(cand, axis=-1), dec

    m_final, decisions = jax.lax.scan(acs, m0, jnp.swapaxes(llr, 0, 1))
    # decisions: [40, B, I, S]

    diag = jnp.diagonal(m_final, axis1=1, axis2=2)       # [B, I]
    best_init = jnp.argmax(diag, axis=-1).astype(jnp.int32)   # [B]
    metric = jnp.max(diag, axis=-1)

    bidx = jnp.arange(B)

    def trace(s, dec_t):
        bit = (s >> 5) & 1
        d = dec_t[bidx, best_init, s].astype(jnp.int32)  # [B]
        return prev_state[s, d], bit

    _, bits_rev = jax.lax.scan(trace, best_init, decisions[::-1])
    return bits_rev[::-1].T.astype(jnp.int32), metric

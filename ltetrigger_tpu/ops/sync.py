"""CP detection and SSS decoding (jitted).

Replaces srslte_sync_detect_cp + srslte_sss_m0m1_partial + srslte_sss_N_id_1
(reference lib/sss_impl.cc:104-124).  TPU shape: both CP hypotheses are
evaluated unconditionally (no branches), and the m0/m1 search is two
[31]x[31,31] matmuls against static cyclic-shift banks.
"""

import jax.numpy as jnp
import numpy as np

from ..ltecore import pss as pssmod, sss as sssmod
from ..ltecore.constants import CP_EXT, CP_NORM, SLOT_LENGTH, SYMBOL_SZ


def detect_cp(aligned: jnp.ndarray) -> jnp.ndarray:
    """bool (True = Normal CP) from the 2 symbols preceding the PSS.

    aligned: [..., >=960] complex64, PSS data at [832, 960).
    """
    def score(cp: int):
        num = jnp.zeros(aligned.shape[:-1], dtype=jnp.complex64)
        den = jnp.full(aligned.shape[:-1], 1e-30, dtype=jnp.float32)
        pos = SLOT_LENGTH - SYMBOL_SZ
        for _ in range(2):
            pos -= SYMBOL_SZ + cp
            c = aligned[..., pos - cp:pos]
            t = aligned[..., pos + SYMBOL_SZ - cp:pos + SYMBOL_SZ]
            num = num + jnp.sum(jnp.conj(t) * c, axis=-1)
            den = den + 0.5 * (jnp.sum(jnp.abs(c) ** 2, axis=-1)
                               + jnp.sum(jnp.abs(t) ** 2, axis=-1))
        return jnp.abs(num) / den

    return score(CP_NORM) >= score(CP_EXT)


def sss_decode(aligned: jnp.ndarray, n_id_2: jnp.ndarray,
               normal_cp: jnp.ndarray):
    """SSS -> (n_id_1 [..., int32, -1 invalid], subframe5 [..., bool]).

    aligned:   [..., 9600] complex64 peak-aligned half-frame
    n_id_2:    [...] int32 root index per batch element
    normal_cp: [...] bool (selects the SSS symbol position)
    """
    bins = jnp.asarray(pssmod.subcarrier_bins())
    S = jnp.asarray(sssmod.shift_bank())          # [31, 31]
    cs = jnp.asarray(sssmod.c_scramble())         # [3, 2, 31]
    zb = jnp.asarray(sssmod.z_bank())             # [8, 31]
    tab = jnp.asarray(sssmod.nid1_table())        # [31, 31]

    idx_norm = SLOT_LENGTH - 2 * SYMBOL_SZ - CP_NORM
    idx_ext = SLOT_LENGTH - 2 * SYMBOL_SZ - CP_EXT
    sym_n = aligned[..., idx_norm:idx_norm + SYMBOL_SZ]
    sym_e = aligned[..., idx_ext:idx_ext + SYMBOL_SZ]
    sym = jnp.where(normal_cp[..., None], sym_n, sym_e)

    y = jnp.fft.fft(sym, axis=-1)[..., bins]      # [..., 62]
    c0 = cs[n_id_2, 0]                            # [..., 31]
    c1 = cs[n_id_2, 1]
    even = y[..., 0::2] * c0
    odd0 = y[..., 1::2] * c1

    m0 = jnp.argmax(jnp.abs(even @ S.T), axis=-1).astype(jnp.int32)
    z = zb[m0 % 8]                                # [..., 31]
    m1 = jnp.argmax(jnp.abs((odd0 * z) @ S.T), axis=-1).astype(jnp.int32)

    direct = tab[m0, m1]
    swapped = tab[m1, m0]
    n_id_1 = jnp.where(direct >= 0, direct, swapped).astype(jnp.int32)
    subframe5 = (direct < 0) & (swapped >= 0)
    return n_id_1, subframe5

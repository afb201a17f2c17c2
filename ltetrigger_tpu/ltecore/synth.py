"""LTE downlink synthesizer (host-side numpy, test/bench support).

Generates radio frames containing PSS/SSS/CRS/PBCH so the receiver can be
tested against cells the bundled captures don't cover (extended CP, 2/4 TX
ports, arbitrary cell ids, controlled SNR).  The reference has no equivalent
— its only fixtures are 4 recorded frames (SURVEY.md §4).
"""

import numpy as np

from . import coding, crs as crsmod, mib as mibmod, scrambling
from . import pss as pssmod, sss as sssmod
from .constants import (MIB_NOF_PRB, NOF_PRB_TABLE, SLOT_LENGTH, SYMBOL_SZ,
                        symbol_data_offsets)


def _ofdm_mod_slot(sym_grid: np.ndarray, normal_cp: bool = True) -> np.ndarray:
    """[nsym, 72] subcarrier grid -> 960 time samples with CP."""
    offs = symbol_data_offsets(normal_cp)
    out = np.zeros(SLOT_LENGTH, dtype=np.complex128)
    for i, o in enumerate(offs):
        F = np.zeros(SYMBOL_SZ, dtype=np.complex128)
        F[SYMBOL_SZ - 36:] = sym_grid[i][:36]
        F[1:37] = sym_grid[i][36:]
        t = np.fft.ifft(F) * SYMBOL_SZ  # keep unit subcarrier amplitude
        out[o:o + SYMBOL_SZ] = t
        cp = o - (offs[i - 1] + SYMBOL_SZ if i else 0)
        out[o - cp:o] = t[-cp:]
    return out


def _place_crs(grid, cell_id, slot_no, nof_ports, normal_cp):
    """Insert CRS pilots for the active ports into a [nsym, 72] slot grid."""
    for port in range(min(nof_ports, 4)):
        for sym in crsmod.crs_symbol_indices(port, normal_cp):
            vals = crsmod.crs_values(cell_id, slot_no, sym, normal_cp)
            k = crsmod.crs_subcarriers(cell_id, port, sym, slot_no)
            grid[sym][k] = vals


def _pbch_symbols(cell_id, nof_prb_field, sfn, quarter, nof_ports, normal_cp,
                  phich_extended=False, phich_resource_idx=2):
    """-> complex QPSK symbols for this radio frame's share of the PBCH TTI."""
    payload = mibmod.mib_pack(nof_prb_field, phich_extended,
                              phich_resource_idx, sfn)
    bits = coding.crc16_attach(payload, nof_ports)
    coded = coding.conv_encode(bits)
    e_bits = 480 if normal_cp else 432
    e = coding.rate_match(coded, 4 * e_bits)
    c = scrambling.gold_sequence(scrambling.pbch_c_init(cell_id), 4 * e_bits)
    b = (e ^ c)[e_bits * quarter: e_bits * (quarter + 1)].astype(np.float64)
    return ((1 - 2 * b[0::2]) + 1j * (1 - 2 * b[1::2])) / np.sqrt(2.0)


def synthesize_pbch_subframe(cell_id: int, nof_prb_field: int = 50,
                             sfn: int = 0, quarter: int = 0,
                             nof_ports: int = 1, normal_cp: bool = True,
                             amplitude: float = 1.0) -> np.ndarray:
    """Subframe 0 (1920 samples) with CRS + PBCH (+ PSS/SSS in slot 0)."""
    return synthesize_frame(cell_id, nof_prb_field, sfn, quarter, nof_ports,
                            normal_cp, amplitude)[:2 * SLOT_LENGTH]


def synthesize_frame(cell_id: int, nof_prb_field: int = 50, sfn: int = 0,
                     quarter: int = 0, nof_ports: int = 1,
                     normal_cp: bool = True,
                     amplitude: float = 1.0) -> np.ndarray:
    """One 10 ms radio frame (19200 samples) with PSS/SSS/CRS/PBCH.

    Multi-port transmission is modeled as the superposition arriving over an
    identity channel (each port's signal summed), with PBCH SFBC-precoded.
    """
    assert nof_prb_field in NOF_PRB_TABLE
    n_id_2 = cell_id % 3
    n_id_1 = cell_id // 3
    nsym = 7 if normal_cp else 6
    slots = [np.zeros((nsym, 72), dtype=np.complex128) for _ in range(20)]

    for s in range(20):
        _place_crs(slots[s], cell_id, s, nof_ports, normal_cp)

    # The 62 sync subcarriers (-31..-1, +1..+31) sit at positions 5..66 of the
    # 72-wide grid (grid 0..35 = subcarriers -36..-1, grid 36..71 = +1..+36).
    sync_pos = np.arange(5, 67)

    for half, sub5 in ((0, False), (10, True)):
        # PSS: last symbol of slot 0/10; SSS: the one before.
        zc = pssmod.zadoff_chu((25, 29, 34)[n_id_2])
        slots[half][nsym - 1][sync_pos] = zc
        slots[half][nsym - 2][sync_pos] = sssmod.sss_sequence(
            n_id_1, n_id_2, sub5)

    # PBCH in slot 1, symbols 0..3
    d = _pbch_symbols(cell_id, nof_prb_field, sfn, quarter, nof_ports,
                      normal_cp)
    v_shift = cell_id % 6
    # layer-map / precode
    if nof_ports == 1:
        tx = {0: d}
    elif nof_ports == 2:
        x0, x1 = d[0::2], d[1::2]
        p0 = np.empty_like(d); p1 = np.empty_like(d)
        p0[0::2], p0[1::2] = x0, x1
        p1[0::2], p1[1::2] = -np.conj(x1), np.conj(x0)
        tx = {0: p0 / np.sqrt(2), 1: p1 / np.sqrt(2)}
    else:
        # 4-port SFBC-FSTD over groups of 4
        p = [np.zeros_like(d) for _ in range(4)]
        for g in range(0, len(d), 4):
            x0, x1, x2, x3 = d[g:g + 4]
            p[0][g], p[0][g + 1] = x0, x1
            p[2][g], p[2][g + 1] = -np.conj(x1), np.conj(x0)
            p[1][g + 2], p[1][g + 3] = x2, x3
            p[3][g + 2], p[3][g + 3] = -np.conj(x3), np.conj(x2)
        tx = {i: p[i] / np.sqrt(2) for i in range(4)}

    from .refrx import pbch_re_indices
    re_idx = pbch_re_indices(v_shift, normal_cp)
    for port, syms in tx.items():
        for (l, k), v in zip(re_idx, syms):
            # identity channel: all ports superpose at the receiver
            slots[1][l][k] += v

    time = np.concatenate([_ofdm_mod_slot(s, normal_cp) for s in slots])
    return amplitude * time / np.sqrt(np.mean(np.abs(time) ** 2) + 1e-30)

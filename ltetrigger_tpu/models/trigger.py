"""The downlink trigger: PSS tracking state machine + SSS + MIB, fused.

This is the framework's flagship "model".  The reference implements it as a
GNU Radio hier block of 12 threads (3x pss -> sss -> mib + tag_debug,
python/downlink_trigger_c.py:27-45) with data-dependent stream consumption.
Here the whole thing is ONE fixed-shape jitted program in TWO passes:

  pass 1 — lax.scan over half-frame steps (the streaming state machine):
    * the three N_id_2 chains are a leading batch dim of every tensor;
    * per-block state (tracking score/timer, EMA'd correlation, PSR/CFO
      telemetry rings) is a TriggerState pytree carried through the scan;
    * the reference's variable `consume_each` becomes a per-root stream
      position in the carry, with windows gathered by dynamic_slice;
    * MIB is NOT decoded inside the scan.  Steps that would attempt a MIB
      decode (tagged subframe-0 half-frame, nothing published) instead
      CAPTURE the aligned slot-1 samples into one of K candidate slots in
      the carry.  Inside a scan every serial step pays full latency for the
      Viterbi's 120 sequential ACS stages — and under vmap (multi-channel)
      `lax.cond` lowers to select so the decode would run for every channel
      every step.  Capturing is a few masked writes.

  pass 2 — one batched post-pass per scan call (`_mib_postpass`):
    * all K candidates x 3 roots x 12 (port, TTI-phase) hypotheses are
      decoded in ONE batched PBCH pipeline and ONE batched wrap-around
      Viterbi — the latency-bound serial trellis runs once per dispatch
      instead of once per step;
    * the 40 ms TTI soft-combining accumulator (reference
      srslte_ue_mib_decode's frame buffer, lib/mib_impl.cc:75-76,162) is a
      short lax.scan over the K candidate slots, carried across calls in
      TriggerState.llr_acc;
    * track/drop events and the published-cell state machine are assembled
      with log-depth associative scans over the step axis, reproducing the
      in-scan semantics exactly (publish on first CRC-valid decode of an
      acquisition epoch, drop on the first tracking loss while published).

Faithful semantics (reference lib/pss_impl.cc:154-223, SURVEY §2.3):
  score hysteresis with track_after saturation, EMA reset on acquisition and
  loss, track_every correlation skipping with PSR reuse, peak pinning to the
  slot boundary once aligned, CFO running-mean correction only while
  tracking, and the tracking_lost cascade that retracts a published cell.

Capture-capacity note: a scan of n_steps can capture at most K candidates
per root (default 16).  Within one acquisition epoch that caps soft
combining at K subframes — 4x the reference's own TTI window — and a cell
whose first CRC success would come after >K attempts inside a single scan
chunk is deferred to the next chunk's captures.  The host drivers
(api.search / api.Trigger) scan in chunks of <= 25 steps, well under K x 2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ltecore.constants import (DEFAULT_TRACK_AFTER, DEFAULT_TRACK_EVERY,
                                 HALF_FRAME_LENGTH, MOVING_AVG_SZ,
                                 PSR_EMA_ALPHA, PSS_SYMBOL_START, SLOT_LENGTH,
                                 SYMBOL_SZ)
from ..ops import cfo as cfo_ops
from ..ops import cplx, correlate, pbch, sync

R = 3                                   # N_id_2 hypotheses
LOOKBACK = PSS_SYMBOL_START             # 832 samples of history before `pos`
# window: lookback + search span + room to emit the aligned first subframe
# (the only part of the half-frame consumed downstream: CP/SSS/PSS-CFO read
# slot 0, the MIB candidate is slot 1)
WINDOW = (LOOKBACK + HALF_FRAME_LENGTH + 2 * SLOT_LENGTH
          + SYMBOL_SZ)                                 # 12480
MAX_FRAME_START = HALF_FRAME_LENGTH - 1 - LOOKBACK     # 8767
K_CANDIDATES = 16                       # MIB candidate slots per root


class TriggerState(NamedTuple):
    """Per-root carry (leading dim R=3 on every field)."""
    pos: jnp.ndarray          # [R] int32 — in-pointer into the padded stream
    ema: jnp.ndarray          # [R, 9600] f32 — EMA'd correlation power
    score: jnp.ndarray        # [R] int32
    timer: jnp.ndarray        # [R] int32
    tracking: jnp.ndarray     # [R] bool
    psr: jnp.ndarray          # [R] f32 — last PSR (reused when not searching)
    peak: jnp.ndarray         # [R] int32 — last peak (PSS-start semantics)
    psr_max: jnp.ndarray      # [R] f32
    psr_ring: jnp.ndarray     # [R, 200] f32
    psr_count: jnp.ndarray    # [R] int32
    cfo_ring: jnp.ndarray     # [R, 200] f32
    cfo_count: jnp.ndarray    # [R] int32
    published: jnp.ndarray    # [R] bool
    pub_cell_id: jnp.ndarray  # [R] int32
    llr_acc: jnp.ndarray      # [R, 12, 120] f32 — PBCH TTI soft-combine acc
    mib_n: jnp.ndarray        # [R] int32 — subframe-0 attempts combined
    mib_cell: jnp.ndarray     # [R] int32 — cell id the accumulator belongs to
    cand_slot1: jnp.ndarray   # [R, K, 2, 960] f32 — captured slot-1 samples
    cand_cell: jnp.ndarray    # [R, K] int32
    cand_cp: jnp.ndarray      # [R, K] bool
    cand_fresh: jnp.ndarray   # [R, K] bool — candidate restarts the TTI acc
    cand_cnt: jnp.ndarray     # [R] int32 — slots filled this scan chunk
    pending_fresh: jnp.ndarray  # [R] bool — loss seen since last capture
    published_live: jnp.ndarray  # [R] bool — in-scan view of `published`:
    #   equals `published` at chunk start and is cleared by a tracking loss
    #   INSIDE the scan, so MIB candidate capture resumes immediately after
    #   a mid-chunk drop (reference behavior: mib re-attempts the very next
    #   half-frame, lib/mib_impl.cc:109-135).  It can only go false in-scan;
    #   tracks are only known post-pass, where extra captures after a track
    #   are masked by the epoch logic in _mib_postpass.
    cap_overflow: jnp.ndarray  # [R] int32 — capture attempts dropped because
    #   all K candidate slots were full (observable deferral; see
    #   "Capture-capacity note" in the module docstring)


class RawStepOutput(NamedTuple):
    """Per-step observables of the scan pass (pre-MIB)."""
    cand_slot: jnp.ndarray    # int32 — candidate slot captured, -1 if none
    lost_flag: jnp.ndarray    # bool — tracking_lost emitted this step
    cell_id: jnp.ndarray      # int32
    normal_cp: jnp.ndarray    # bool
    psr: jnp.ndarray          # f32
    score: jnp.ndarray        # int32
    tracking: jnp.ndarray     # bool
    cfo_mean: jnp.ndarray     # f32
    consumed: jnp.ndarray     # int32


class StepOutput(NamedTuple):
    """Per-step, per-root observables (events + telemetry) — the public
    contract of scan_engine, unchanged by the two-pass restructure."""
    track_event: jnp.ndarray  # bool — publish this cell (reference: `track` PMT)
    drop_event: jnp.ndarray   # bool — retract published cell (`drop` PMT)
    drop_cell_id: jnp.ndarray # int32 — the previously *published* cell id
    cell_id: jnp.ndarray      # int32
    nof_prb: jnp.ndarray      # int32
    nof_ports: jnp.ndarray    # int32
    phich_ext: jnp.ndarray    # int32
    phich_res: jnp.ndarray    # int32
    sfn_offset: jnp.ndarray   # int32
    normal_cp: jnp.ndarray    # bool
    psr: jnp.ndarray          # f32
    score: jnp.ndarray        # int32
    tracking: jnp.ndarray     # bool
    cfo_mean: jnp.ndarray     # f32
    consumed: jnp.ndarray     # int32


def init_state(start_pos: int = LOOKBACK,
               k_candidates: int = K_CANDIDATES) -> TriggerState:
    z = jnp.zeros
    k = k_candidates
    return TriggerState(
        pos=jnp.full((R,), start_pos, dtype=jnp.int32),
        ema=z((R, HALF_FRAME_LENGTH), jnp.float32),
        score=z((R,), jnp.int32),
        timer=z((R,), jnp.int32),
        tracking=z((R,), bool),
        psr=z((R,), jnp.float32),
        peak=jnp.full((R,), LOOKBACK, dtype=jnp.int32),
        psr_max=z((R,), jnp.float32),
        psr_ring=z((R, MOVING_AVG_SZ), jnp.float32),
        psr_count=z((R,), jnp.int32),
        cfo_ring=z((R, MOVING_AVG_SZ), jnp.float32),
        cfo_count=z((R,), jnp.int32),
        published=z((R,), bool),
        pub_cell_id=z((R,), jnp.int32),
        llr_acc=z((R, 12, 120), jnp.float32),
        mib_n=z((R,), jnp.int32),
        mib_cell=jnp.full((R,), -1, dtype=jnp.int32),
        cand_slot1=z((R, k, 2, SLOT_LENGTH), jnp.float32),
        cand_cell=jnp.full((R, k), -1, dtype=jnp.int32),
        cand_cp=z((R, k), bool),
        cand_fresh=z((R, k), bool),
        cand_cnt=z((R,), jnp.int32),
        pending_fresh=jnp.ones((R,), dtype=bool),
        published_live=z((R,), bool),
        cap_overflow=z((R,), jnp.int32),
    )


def _ring_mean(ring, count):
    n = jnp.minimum(count, MOVING_AVG_SZ)
    return jnp.where(n > 0, jnp.sum(ring, axis=-1) / jnp.maximum(n, 1), 0.0)


def _ring_push(ring, count, value):
    idx = jnp.mod(count, MOVING_AVG_SZ)
    onehot = jax.nn.one_hot(idx, MOVING_AVG_SZ, dtype=ring.dtype)
    return ring * (1 - onehot) + onehot * value[..., None]


def trigger_step(state: TriggerState, windows: cplx.Pair,
                 psr_threshold: jnp.ndarray,
                 track_after: int = DEFAULT_TRACK_AFTER,
                 track_every: int = DEFAULT_TRACK_EVERY,
                 active: jnp.ndarray | None = None):
    """One half-frame step for all three roots (scan pass: no MIB decode).

    windows: pair of [R, WINDOW] float32 — per-root window; sample LOOKBACK
             of window r is the sample at state.pos[r].
    active:  [R] bool — roots with exhausted input are frozen (no-ops).
    returns: (next_state, RawStepOutput)
    """
    if active is None:
        active = jnp.ones((R,), dtype=bool)
    K = state.cand_cell.shape[-1]

    search = (~state.tracking) | (state.timer == 0)
    timer = jnp.where(search, track_every, state.timer - 1)

    # --- PSS correlation: root r's window lane against root r only (the
    #     diagonal correlator — lane r never consults other roots) ---
    srch = cplx.index(windows,
                      (slice(None), slice(LOOKBACK,
                                          LOOKBACK + correlate.V2_WINDOW)))
    power = correlate.default_power_diag(srch)                 # [R, 9600]
    ema = jnp.where(search[:, None],
                    PSR_EMA_ALPHA * power + (1 - PSR_EMA_ALPHA) * state.ema,
                    state.ema)
    peak_new, psr_new = correlate.peak_and_psr(ema)
    psr = jnp.where(search, psr_new, state.psr)
    peak = jnp.where(search, peak_new, state.peak)

    psr_ring = jnp.where(
        search[:, None],
        _ring_push(state.psr_ring, state.psr_count, psr),
        state.psr_ring)
    psr_count = state.psr_count + search.astype(jnp.int32)

    # --- hysteresis scoring (reference incr_score / reset_score) ---
    over = psr > psr_threshold
    score_inc = jnp.minimum(state.score + 1, track_after)
    crossing = over & (~state.tracking) & (score_inc == track_after)
    lost = (~over) & (state.score > 0)

    score = jnp.where(over, score_inc, 0)
    tracking = jnp.where(over, state.tracking | crossing,
                         jnp.zeros_like(state.tracking))
    ema = jnp.where((crossing | lost)[:, None], jnp.zeros_like(ema), ema)
    timer = jnp.where(lost, 0, timer)
    psr_ring = jnp.where(lost[:, None], 0.0, psr_ring)
    psr_count = jnp.where(lost, 0, psr_count)
    cfo_ring = jnp.where(lost[:, None], 0.0, state.cfo_ring)
    cfo_count = jnp.where(lost, 0, state.cfo_count)
    psr_max = jnp.maximum(state.psr_max, psr)

    # --- alignment & output branch ---
    emit = over | lost
    frame_start = jnp.clip(peak - LOOKBACK, -LOOKBACK, MAX_FRAME_START)
    peak = jnp.where(emit, LOOKBACK, peak)      # pin once aligned
    consumed = jnp.where(emit, frame_start + HALF_FRAME_LENGTH,
                         HALF_FRAME_LENGTH)

    # only the first subframe of the aligned half-frame is ever consumed
    # (CP detect / SSS / PSS-symbol CFO read slot 0, the MIB candidate is
    # slot 1) — gathering all 9600 samples would be 5x wasted traffic
    def slice_one(w, fs):
        return jax.lax.dynamic_slice(w, (LOOKBACK + fs,),
                                     (2 * SLOT_LENGTH,))

    aligned = (jax.vmap(slice_one)(windows[0], frame_start),
               jax.vmap(slice_one)(windows[1], frame_start))   # pair [R, 1920]

    # --- CFO (tracking only): estimate on the PSS symbol, correct by the
    #     running mean (reference lib/pss_impl.cc:197-204) ---
    reps = tuple(jnp.asarray(a) for a in cfo_ops.replica_pairs())  # [3, 128]
    pss_sym = cplx.index(aligned,
                         (slice(None), slice(PSS_SYMBOL_START, SLOT_LENGTH)))
    cfo_est = cfo_ops.cfo_estimate(pss_sym, reps)
    cfo_push = emit & tracking
    cfo_ring = jnp.where(cfo_push[:, None],
                         _ring_push(cfo_ring, cfo_count, cfo_est), cfo_ring)
    cfo_count = cfo_count + cfo_push.astype(jnp.int32)
    cfo_mean = _ring_mean(cfo_ring, cfo_count)
    corrected = cfo_ops.cfo_correct(aligned, -cfo_mean / SYMBOL_SZ)
    sf = cplx.where(tracking[:, None], corrected, aligned)

    # --- SSS: CP detect + cell identity (tags in the reference) ---
    normal_cp = sync.detect_cp(sf)
    nid2 = jnp.arange(R, dtype=jnp.int32)
    n_id_1, sub5 = sync.sss_decode(sf, nid2, normal_cp)
    sss_valid = n_id_1 >= 0
    cell_id = 3 * jnp.maximum(n_id_1, 0) + nid2
    tagged = emit & (~lost) & sss_valid

    # --- MIB candidate capture (decode happens in _mib_postpass).
    #     Subframe-5 halves (sub5 from the SSS m0/m1 order) are gated out —
    #     the reference feeds them to ue_mib_decode where they just fail CRC
    #     (lib/mib_impl.cc:122-135 only early-outs on missing tags). ---
    published_live = state.published_live & (~lost)
    want_any = active & tagged & (~published_live) & (~sub5)
    want_cap = want_any & (state.cand_cnt < K)
    overflow = want_any & (state.cand_cnt >= K)
    fresh = state.pending_fresh | (cell_id != state.mib_cell)
    onehot = ((jnp.arange(K, dtype=jnp.int32)[None, :]
               == state.cand_cnt[:, None]) & want_cap[:, None])   # [R, K]
    slot1 = jnp.stack([sf[0][:, SLOT_LENGTH:], sf[1][:, SLOT_LENGTH:]],
                      axis=-2)                                    # [R, 2, 960]
    # Candidate payload lands via a per-root dynamic_update_slice at slot
    # cand_cnt, NOT a full-size masked where: the where formulation read and
    # rewrote the whole [R, K, 2, 960] buffer every step (~94 MB of HBM
    # traffic per step at 128 channels — the dominant scan cost on TPU);
    # this writes one 7.7 KB row.  Writing UNCONDITIONALLY at slot cand_cnt
    # is safe: when no capture happens the slot is beyond the valid range
    # (valid = k < cand_cnt) and a later capture overwrites it first.  Only
    # the cnt == K case must preserve the last captured slot.
    idx = jnp.minimum(state.cand_cnt, K - 1)
    old_row = jnp.take_along_axis(
        state.cand_slot1, idx[:, None, None, None], axis=1)[:, 0]
    content = jnp.where((state.cand_cnt < K)[:, None, None], slot1, old_row)
    cand_slot1 = jax.vmap(
        lambda buf, row, i: jax.lax.dynamic_update_slice(
            buf, row[None], (i, 0, 0)))(state.cand_slot1, content, idx)
    cand_cell = jnp.where(onehot, cell_id[:, None], state.cand_cell)
    cand_cp = jnp.where(onehot, normal_cp[:, None], state.cand_cp)
    cand_fresh = jnp.where(onehot, fresh[:, None], state.cand_fresh)
    cand_cnt = state.cand_cnt + want_cap.astype(jnp.int32)
    mib_cell = jnp.where(want_cap, cell_id, state.mib_cell)
    pending_fresh = (jnp.where(want_cap, False, state.pending_fresh)
                     | (active & lost))

    # --- freeze inactive roots ---
    def frz(new, old):
        mask = active
        while mask.ndim < new.ndim:
            mask = mask[..., None]
        return jnp.where(mask, new, old)

    next_state = TriggerState(
        pos=frz(state.pos + consumed, state.pos),
        ema=frz(ema, state.ema),
        score=frz(score, state.score),
        timer=frz(timer, state.timer),
        tracking=frz(tracking, state.tracking),
        psr=frz(psr, state.psr),
        peak=frz(peak, state.peak),
        psr_max=frz(psr_max, state.psr_max),
        psr_ring=frz(psr_ring, state.psr_ring),
        psr_count=frz(psr_count, state.psr_count),
        cfo_ring=frz(cfo_ring, state.cfo_ring),
        cfo_count=frz(cfo_count, state.cfo_count),
        published=state.published,
        pub_cell_id=state.pub_cell_id,
        llr_acc=state.llr_acc,
        mib_n=state.mib_n,
        mib_cell=frz(mib_cell, state.mib_cell),
        # no frz: the unconditional slot-cand_cnt write is inert for frozen
        # roots (their cnt is frozen, so the touched slot stays invalid)
        cand_slot1=cand_slot1,
        cand_cell=frz(cand_cell, state.cand_cell),
        cand_cp=frz(cand_cp, state.cand_cp),
        cand_fresh=frz(cand_fresh, state.cand_fresh),
        cand_cnt=frz(cand_cnt, state.cand_cnt),
        pending_fresh=frz(pending_fresh, state.pending_fresh),
        published_live=frz(published_live, state.published_live),
        cap_overflow=frz(state.cap_overflow + overflow.astype(jnp.int32),
                         state.cap_overflow),
    )
    out = RawStepOutput(
        cand_slot=jnp.where(want_cap, state.cand_cnt, -1),
        lost_flag=active & emit & lost,
        cell_id=cell_id,
        normal_cp=normal_cp,
        psr=psr,
        score=frz(score, state.score),
        tracking=frz(tracking, state.tracking),
        cfo_mean=cfo_mean,
        consumed=jnp.where(active, consumed, 0),
    )
    return next_state, out


def _decode_candidates(state0: TriggerState, final: TriggerState,
                       combine: bool):
    """The heavy half of the post-pass: batched PBCH + Viterbi over the
    captured candidates.  Returns per-candidate verdicts and the updated
    TTI accumulator carry."""
    K = final.cand_cell.shape[-1]

    # 1. PBCH quarter-LLR contributions of every candidate, both CP
    #    hypotheses batched (the CP is a traced per-candidate value)
    flat = (final.cand_slot1[:, :, 0].reshape(R * K, SLOT_LENGTH),
            final.cand_slot1[:, :, 1].reshape(R * K, SLOT_LENGTH))
    both = jax.vmap(pbch.quarter_llrs_both_cp)(
        flat, final.cand_cell.reshape(R * K))        # [RK, 2, 3, 4, 120]
    both = both.reshape(R, K, 2, 3, 4, 120)
    contrib = jnp.where(final.cand_cp[:, :, None, None, None],
                        both[:, :, 1], both[:, :, 0])  # [R, K, 3, 4, 120]

    ks = jnp.arange(K, dtype=jnp.int32)
    valid = ks[None, :] < final.cand_cnt[:, None]      # [R, K]

    # 2. TTI soft-combining chain over the K slots (cheap sequential pass;
    #    semantics of pbch.mib_combine_decode: 4 TTI-phase hypotheses, phase
    #    h restarts its accumulator at quarter 0)
    def chain(carry, xs):
        acc, n, cell = carry                  # [R,3,4,120], [R], [R]
        c_k, fresh_k, cell_k, valid_k = xs
        if not combine:
            fresh_k = jnp.ones_like(fresh_k)
        restart = fresh_k | (cell_k != cell)
        n_k = jnp.where(restart, 0, n)
        q = jnp.mod(n_k[:, None] + jnp.arange(4, dtype=jnp.int32), 4)  # [R,4]
        sel = jnp.take_along_axis(c_k, q[:, None, :, None], axis=2)
        acc_new = jnp.where((q == 0)[:, None, :, None], sel, acc + sel)
        acc_out = jnp.where(valid_k[:, None, None, None], acc_new, acc)
        n_out = jnp.where(valid_k, n_k + 1, n)
        cell_out = jnp.where(valid_k, cell_k, cell)
        return (acc_out, n_out, cell_out), (acc_out, q)

    xs = (jnp.moveaxis(contrib, 1, 0), jnp.moveaxis(final.cand_fresh, 1, 0),
          jnp.moveaxis(final.cand_cell, 1, 0), jnp.moveaxis(valid, 1, 0))
    acc0 = state0.llr_acc.reshape(R, 3, 4, 120)
    (acc_f, n_f, cell_f), (accs, qs) = jax.lax.scan(
        chain, (acc0, state0.mib_n, state0.mib_cell), xs)
    # accs: [K, R, 3, 4, 120]; qs: [K, R, 4]

    # 3. ONE batched codeword search over all K x R x 12 hypotheses
    llrs12 = accs.reshape(K * R, 12, 120)
    quarter_of = jnp.tile(qs.reshape(K * R, 1, 4), (1, 3, 1)).reshape(-1, 12)
    res = jax.vmap(pbch.search_and_unpack)(llrs12, quarter_of)

    def rk(a):
        return a.reshape(K, R).T                               # [R, K]

    found = rk(res["found"]) & valid                           # [R, K]
    return (found, rk(res["nof_prb"]), rk(res["nof_ports"]),
            rk(res["phich_ext"]), rk(res["phich_res"]),
            rk(res["sfn_offset"]), acc_f, n_f, cell_f)


def _mib_postpass(state0: TriggerState, final: TriggerState,
                  raw: RawStepOutput, combine: bool = True,
                  do_decode: jnp.ndarray | None = None):
    """Pass 2: batched MIB decode of the captured candidates + exact event
    assembly.  Returns (final_state, StepOutput [n_steps, R, ...]).

    combine=False forces every candidate to restart the TTI accumulator —
    stateless single-subframe decoding, kept for sensitivity A/B
    measurement (apps/snr_sweep.py --no-combine).

    do_decode: scalar bool — run the PBCH+Viterbi batch at all.  Defaults
    to `any candidate captured`; callers that vmap this pass (channel_scan)
    pass a batch-global scalar so the lax.cond survives vmap as a real
    branch and the universal no-detection case (noise channels, wideband
    scans) skips the heavy decode entirely."""
    K = final.cand_cell.shape[-1]
    if do_decode is None:
        do_decode = jnp.sum(final.cand_cnt) > 0

    def heavy(_):
        return _decode_candidates(state0, final, combine)

    def cheap(_):
        zi = jnp.zeros((R, K), jnp.int32)
        return (jnp.zeros((R, K), bool), zi, zi, zi, zi, zi,
                state0.llr_acc.reshape(R, 3, 4, 120), state0.mib_n,
                state0.mib_cell)

    (found, prb_rk, ports_rk, pext_rk, pres_rk, sfn_rk,
     acc_f, n_f, cell_f) = jax.lax.cond(do_decode, heavy, cheap, None)

    ks = jnp.arange(K, dtype=jnp.int32)
    valid = ks[None, :] < final.cand_cnt[:, None]      # [R, K]

    # 4. publish-once-per-epoch: epoch = cumulative fresh count; the first
    #    CRC-valid candidate of an epoch publishes (epoch 0 continues the
    #    pre-chunk accumulator and cannot publish if already published)
    fresh_eff = final.cand_fresh & valid
    e = jnp.cumsum(fresh_eff.astype(jnp.int32), axis=1)        # [R, K]
    same_ep = e[:, :, None] == e[:, None, :]
    j_lt_k = ks[None, None, :] < ks[None, :, None]
    prior = jnp.any(same_ep & j_lt_k & found[:, None, :], axis=-1)
    is_pub = found & ~prior & ~(state0.published[:, None] & (e == 0))

    # 5. map candidate verdicts back to step space
    slot = raw.cand_slot                                       # [S, R]
    cap = slot >= 0
    sl = jnp.clip(slot, 0, K - 1)
    ridx = jnp.arange(R, dtype=jnp.int32)[None, :]
    track_event = cap & is_pub[ridx, sl]

    def fld(a):                                                # [R,K] -> [S,R]
        return jnp.where(track_event, a[ridx, sl], 0)

    nof_prb = fld(prb_rk)
    nof_ports = fld(ports_rk)
    phich_ext = fld(pext_rk)
    phich_res = fld(pres_rk)
    sfn_offset = fld(sfn_rk)

    # 6. published/drop state machine over steps, log-depth:
    #    p' = track | (p & ~lost)  — linear boolean recurrence
    t, l = track_event, raw.lost_flag
    A, B = jax.lax.associative_scan(
        lambda x, y: (x[0] & y[0], (x[1] & y[0]) | y[1]), (~l, t), axis=0)
    p0 = state0.published[None, :]
    p_incl = (p0 & A) | B                                      # [S, R]
    p_before = jnp.concatenate([jnp.broadcast_to(p0, (1, R)), p_incl[:-1]])
    drop_event = l & p_before
    # last published cell id (updated at track steps)
    S2, I2 = jax.lax.associative_scan(
        lambda x, y: (x[0] | y[0], jnp.where(y[0], y[1], x[1])),
        (t, jnp.where(t, raw.cell_id, 0)), axis=0)
    id0 = state0.pub_cell_id[None, :]
    id_incl = jnp.where(S2, I2, id0)
    id_before = jnp.concatenate([jnp.broadcast_to(id0, (1, R)), id_incl[:-1]])

    final_state = final._replace(
        published=p_incl[-1],
        pub_cell_id=id_incl[-1],
        # published_live re-synchronizes to the exact post-pass value so the
        # next chunk's in-scan gating starts from truth
        published_live=p_incl[-1],
        llr_acc=acc_f.reshape(R, 12, 120),
        mib_n=n_f,
        mib_cell=cell_f,
        cand_cnt=jnp.zeros_like(final.cand_cnt),
    )
    out = StepOutput(
        track_event=track_event,
        drop_event=drop_event,
        drop_cell_id=id_before,
        cell_id=raw.cell_id,
        nof_prb=nof_prb,
        nof_ports=nof_ports,
        phich_ext=phich_ext,
        phich_res=phich_res,
        sfn_offset=sfn_offset,
        normal_cp=raw.normal_cp,
        psr=raw.psr,
        score=raw.score,
        tracking=raw.tracking,
        cfo_mean=raw.cfo_mean,
        consumed=raw.consumed,
    )
    return final_state, out


_BOOL_FIELDS = ("track_event", "drop_event", "normal_cp", "tracking")
_F32_FIELDS = ("psr", "cfo_mean")


def pack_output(out: StepOutput) -> jnp.ndarray:
    """StepOutput -> ONE [n_steps, R, 15] float32 array.

    The host drain on the tunneled runtime pays ~25 ms of round-trip
    latency PER device->host transfer; fetching the 15 output fields
    separately made streaming drains latency-bound.  Every field fits
    exactly in f32 (ids <= 503, sfn_offset <= 1020, bools)."""
    cols = [jnp.asarray(getattr(out, f)).astype(jnp.float32)
            for f in StepOutput._fields]
    return jnp.stack(cols, axis=-1)


def unpack_output(arr) -> StepOutput:
    """Inverse of pack_output, on host numpy."""
    a = np.asarray(arr)
    kw = {}
    for i, f in enumerate(StepOutput._fields):
        col = a[..., i]
        if f in _BOOL_FIELDS:
            kw[f] = col > 0.5
        elif f in _F32_FIELDS:
            kw[f] = col.astype(np.float32)
        else:
            kw[f] = col.astype(np.int32)
    return StepOutput(**kw)


def scan_pass(buffer: cplx.Pair, state: TriggerState, n_steps: int,
              psr_threshold,
              track_after: int = DEFAULT_TRACK_AFTER,
              track_every: int = DEFAULT_TRACK_EVERY,
              n_valid: jnp.ndarray | None = None):
    """Pass 1 only: scan `n_steps` half-frame steps over a padded stream
    buffer, capturing MIB candidates.  Returns (final_state, RawStepOutput
    stacked [n_steps, R, ...]); feed to _mib_postpass to finish."""
    if n_valid is None:
        n_valid = buffer[0].shape[0]
    n_valid = jnp.asarray(n_valid, dtype=jnp.int32)
    thresh = jnp.asarray(psr_threshold, dtype=jnp.float32)

    def step(st, _):
        active = st.pos + (WINDOW - LOOKBACK) <= n_valid
        start = jnp.clip(st.pos - LOOKBACK, 0, buffer[0].shape[0] - WINDOW)
        gather = jax.vmap(
            lambda b, s: jax.lax.dynamic_slice(b, (s,), (WINDOW,)),
            in_axes=(None, 0))
        windows = (gather(buffer[0], start), gather(buffer[1], start))
        return trigger_step(st, windows, thresh, track_after, track_every,
                            active=active)

    return jax.lax.scan(step, state, None, length=n_steps)


def scan_engine(buffer: cplx.Pair, state: TriggerState, n_steps: int,
                psr_threshold,
                track_after: int = DEFAULT_TRACK_AFTER,
                track_every: int = DEFAULT_TRACK_EVERY,
                n_valid: jnp.ndarray | None = None,
                combine: bool = True):
    """Device-resident engine: scan `n_steps` half-frame steps over a
    padded stream buffer, then batch-decode the captured MIB candidates
    (the whole GNU Radio scheduler collapses to this).

    buffer: pair of [N] float32; must start with >= LOOKBACK zeros and be
    long enough that any active pos can gather a full WINDOW.
    n_valid: logical end of data in `buffer` (default: len(buffer)).
    returns: (final_state, StepOutput stacked [n_steps, R, ...])
    """
    final, raw = scan_pass(buffer, state, n_steps, psr_threshold,
                           track_after, track_every, n_valid=n_valid)
    return _mib_postpass(state, final, raw, combine=combine)

"""The downlink trigger: PSS tracking state machine + SSS + MIB, fused.

This is the framework's flagship "model".  The reference implements it as a
GNU Radio hier block of 12 threads (3x pss -> sss -> mib + tag_debug,
python/downlink_trigger_c.py:27-45) with data-dependent stream consumption.
Here the whole thing is ONE fixed-shape jitted step function:

  * the three N_id_2 chains are a leading batch dim of every tensor;
  * per-block state (tracking score/timer, EMA'd correlation, PSR/CFO
    telemetry rings, published flag) is a TriggerState pytree carried
    through lax.scan;
  * the reference's variable `consume_each` becomes a per-root stream
    position in the carry, with windows gathered by dynamic_slice;
  * stream tags (tracking_lost / cell_id / cp_type) become booleans in the
    step output; PMT track/drop messages become event records the host
    cellstore consumes;
  * IQ rides as float32 (re, im) pairs — this TPU has no complex dtype, and
    the MXU wouldn't want one (see ops/cplx.py).

Faithful semantics (reference lib/pss_impl.cc:154-223, SURVEY §2.3):
  score hysteresis with track_after saturation, EMA reset on acquisition and
  loss, track_every correlation skipping with PSR reuse, peak pinning to the
  slot boundary once aligned, CFO running-mean correction only while
  tracking, and the tracking_lost cascade that retracts a published cell.
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
# window: lookback + search span + room to emit an aligned half-frame
WINDOW = LOOKBACK + 2 * HALF_FRAME_LENGTH + SYMBOL_SZ  # 20160
MAX_FRAME_START = HALF_FRAME_LENGTH - 1 - LOOKBACK     # 8767


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


class StepOutput(NamedTuple):
    """Per-step, per-root observables (events + telemetry)."""
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


def init_state(start_pos: int = LOOKBACK) -> TriggerState:
    z = jnp.zeros
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
    """One half-frame step for all three roots.

    windows: pair of [R, WINDOW] float32 — per-root window; sample LOOKBACK
             of window r is the sample at state.pos[r].
    active:  [R] bool — roots with exhausted input are frozen (no-ops).
    returns: (next_state, StepOutput)
    """
    if active is None:
        active = jnp.ones((R,), dtype=bool)

    search = (~state.tracking) | (state.timer == 0)
    timer = jnp.where(search, track_every, state.timer - 1)

    # --- PSS correlation: one conv, 3 roots as output channels; root r
    #     consults its own lane of the [R, 3, 9600] result ---
    srch = cplx.index(windows,
                      (slice(None), slice(LOOKBACK,
                                          LOOKBACK + correlate.V2_WINDOW)))
    power_all = correlate.default_power(srch)
    power = power_all[jnp.arange(R), jnp.arange(R)]            # [R, 9600]
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

    def slice_one(w, fs):
        return jax.lax.dynamic_slice(w, (LOOKBACK + fs,),
                                     (HALF_FRAME_LENGTH,))

    aligned = (jax.vmap(slice_one)(windows[0], frame_start),
               jax.vmap(slice_one)(windows[1], frame_start))   # pair [R, 9600]

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
    aligned = cplx.where(tracking[:, None], corrected, aligned)

    # --- SSS: CP detect + cell identity (tags in the reference) ---
    normal_cp = sync.detect_cp(aligned)
    nid2 = jnp.arange(R, dtype=jnp.int32)
    n_id_1, sub5 = sync.sss_decode(aligned, nid2, normal_cp)
    sss_valid = n_id_1 >= 0
    cell_id = 3 * jnp.maximum(n_id_1, 0) + nid2
    tagged = emit & (~lost) & sss_valid

    # --- MIB attempt with 40 ms TTI soft-combining (the reference's
    #     ue_mib_decode frame buffer, lib/mib_impl.cc:75-76,162, recast as a
    #     [12, 120] LLR accumulator in the carry).  The decode (OFDM +
    #     chest + 12 Viterbi hypotheses) is the step's heaviest block and it
    #     only matters when a root has a tagged subframe-0 half-frame and no
    #     published cell — so each root's attempt sits behind its own SCALAR
    #     lax.cond (unrolled, R=3), which on TPU executes only the taken
    #     branch; inside, the CP hypothesis is another scalar cond
    #     (pbch._contrib_cond).  Subframe-5 halves (sub5 from the SSS m0/m1
    #     order) are gated out entirely — the reference feeds them to
    #     ue_mib_decode where they just fail CRC (lib/mib_impl.cc:122-135
    #     only early-outs on missing tags). ---
    sf = cplx.index(aligned, (slice(None), slice(0, 2 * SLOT_LENGTH)))
    want_mib = active & tagged & (~state.published) & (~sub5)

    def attempt_root(operand):
        sf_, cid_, ncp_, acc_, n_, same_ = operand
        acc_ = jnp.where(same_, acc_, jnp.zeros_like(acc_))
        n_ = jnp.where(same_, n_, 0)
        acc_new, res = pbch.mib_combine_decode(sf_, cid_, ncp_, acc_, n_)
        return acc_new, n_ + 1, res

    def skip_root(operand):
        _, _, _, acc_, n_, _ = operand
        z = jnp.zeros((), jnp.int32)
        res = {"found": jnp.zeros((), bool), "nof_prb": z, "nof_ports": z,
               "phich_ext": z, "phich_res": z, "sfn_offset": z, "quarter": z,
               "metric": jnp.zeros((), jnp.float32)}
        return acc_, n_, res

    same_cell = state.mib_cell == cell_id
    accs, ns, ress = [], [], []
    for r in range(R):
        acc_r, n_r, res_r = jax.lax.cond(
            want_mib[r], attempt_root, skip_root,
            ((sf[0][r], sf[1][r]), cell_id[r], normal_cp[r],
             state.llr_acc[r], state.mib_n[r], same_cell[r]))
        accs.append(acc_r)
        ns.append(n_r)
        ress.append(res_r)
    mib = {k: jnp.stack([res[k] for res in ress]) for k in ress[0]}
    llr_acc = jnp.stack(accs)
    mib_n = jnp.stack(ns)
    mib_cell = jnp.where(want_mib, cell_id, state.mib_cell)
    # tracking loss flushes the accumulator like every other telemetry ring
    llr_acc = jnp.where(lost[:, None, None], 0.0, llr_acc)
    mib_n = jnp.where(lost, 0, mib_n)
    mib_cell = jnp.where(lost, -1, mib_cell)

    track_event = active & tagged & mib["found"] & (~state.published)
    drop_event = active & emit & lost & state.published
    published = (state.published | track_event) & ~drop_event
    pub_cell_id = jnp.where(track_event, cell_id, state.pub_cell_id)

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
        published=frz(published, state.published),
        pub_cell_id=frz(pub_cell_id, state.pub_cell_id),
        llr_acc=frz(llr_acc, state.llr_acc),
        mib_n=frz(mib_n, state.mib_n),
        mib_cell=frz(mib_cell, state.mib_cell),
    )
    out = StepOutput(
        track_event=track_event,
        drop_event=drop_event,
        drop_cell_id=state.pub_cell_id,
        cell_id=cell_id,
        nof_prb=mib["nof_prb"],
        nof_ports=mib["nof_ports"],
        phich_ext=mib["phich_ext"],
        phich_res=mib["phich_res"],
        sfn_offset=mib["sfn_offset"],
        normal_cp=normal_cp,
        psr=psr,
        score=frz(score, state.score),
        tracking=frz(tracking, state.tracking),
        cfo_mean=cfo_mean,
        consumed=jnp.where(active, consumed, 0),
    )
    return next_state, out


def scan_engine(buffer: cplx.Pair, state: TriggerState, n_steps: int,
                psr_threshold,
                track_after: int = DEFAULT_TRACK_AFTER,
                track_every: int = DEFAULT_TRACK_EVERY,
                n_valid: jnp.ndarray | None = None):
    """Device-resident engine: scan `n_steps` half-frame steps over a
    padded stream buffer (the whole GNU Radio scheduler collapses to this).

    buffer: pair of [N] float32; must start with >= LOOKBACK zeros and be
            long enough that any active pos can gather a full WINDOW.
    n_valid: logical end of data in `buffer` (default: len(buffer)).
    returns: (final_state, StepOutput stacked [n_steps, R, ...])
    """
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

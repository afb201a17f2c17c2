#!/usr/bin/env python
"""Headless GRC-flowgraph runner: load a .grc file, build the graph from the
grc/*.block.yml descriptors, and run it.

The reference ships two GUI demos (examples/rtlsdr_ltetrigger.grc,
examples/snr_ltetrigger.grc) whose blocks GRC instantiates from XML wrappers
(grc/ltetrigger_downlink_trigger_c.xml:1-63).  This module is the consuming
side of the repo's GRC surface: it parses a GRC 3.10 YAML flowgraph, looks
each `ltetrigger_tpu_*` block up in grc/*.block.yml, instantiates it by
evaluating the descriptor's OWN `templates.imports` / `templates.make`
strings (so the descriptors are executed metadata, not documentation), wires
stream and message connections, and drives samples through — no GNU Radio
installation required.

Supported block set = what the shipped demo uses: `blocks_file_source`
(complex64 file, repeat), `variable`, and every ltetrigger_tpu_* descriptor.
The stream scheduler is the framework's own host driver (Trigger.process);
message connections map to the trigger's on_track/on_drop event surface,
exactly how downlink_trigger_c's PMT ports feed cellstore in the reference
(examples/cell_search_file.py:83-89).

CLI:
    python -m ltetrigger_tpu.apps.run_flowgraph examples/ltetrigger_demo.grc \
        [--time-out 2]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys
import time

import numpy as np

GRC_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "grc"


def load_descriptors(grc_dir=GRC_DIR) -> dict:
    """id -> parsed block.yml for every shipped descriptor."""
    import yaml
    descs = {}
    for p in sorted(pathlib.Path(grc_dir).glob("*.block.yml")):
        with open(p) as f:
            d = yaml.safe_load(f)
        descs[d["id"]] = d
    return descs


def load_flowgraph(path) -> dict:
    import yaml
    with open(path) as f:
        fg = yaml.safe_load(f)
    assert "blocks" in fg and "connections" in fg, "not a GRC flowgraph"
    return fg


def _coerce(desc_param, raw):
    dtype = desc_param.get("dtype")
    if dtype == "real":
        return float(raw)
    if dtype in ("int",):
        return int(raw)
    if dtype == "bool":
        return raw in (True, "True", "true", "1")
    return raw


def _make_from_descriptor(desc: dict, params: dict):
    """Instantiate a block by evaluating the descriptor's own templates."""
    ns: dict = {}
    exec(desc["templates"]["imports"], ns)           # noqa: S102 — the
    # descriptors are repo-controlled artifacts, same trust level as code
    make = desc["templates"]["make"]
    declared = {p["id"]: p for p in desc.get("parameters", [])}

    def sub(m):
        pid = m.group(1)
        val = _coerce(declared.get(pid, {}), params.get(
            pid, declared.get(pid, {}).get("default")))
        return repr(val)

    expr = re.sub(r"\$\{(\w+)\}", sub, make)
    for a in desc.get("asserts", []):
        cond = re.sub(r"\$\{(\w+)\}", sub, a)
        assert eval(cond, ns), f"flowgraph assert failed: {a}"  # noqa: S307
    return eval(expr, ns)                            # noqa: S307


class FlowgraphRunner:
    """One parsed flowgraph, instantiated and runnable."""

    def __init__(self, path, grc_dir=GRC_DIR):
        self.fg = load_flowgraph(path)
        self.descs = load_descriptors(grc_dir)
        self.blocks: dict = {}
        self.sources: list[tuple[str, dict]] = []
        for b in self.fg["blocks"]:
            bid, name = b["id"], b["name"]
            params = b.get("parameters", {})
            if bid == "variable":
                self.blocks[name] = params.get("value")
            elif bid == "blocks_file_source":
                assert params.get("type", "complex") == "complex", \
                    "only complex64 file sources are supported"
                self.sources.append((name, params))
                self.blocks[name] = None
            elif bid in self.descs:
                self.blocks[name] = _make_from_descriptor(self.descs[bid],
                                                          params)
            else:
                raise ValueError(f"unsupported block id {bid!r} "
                                 f"(block {name!r})")
        self._wire()

    def _wire(self) -> None:
        from ..models.api import Trigger
        from ..runtime.cellstore import CellStore

        self.stream_edges = []                       # (src_name, dst block)
        for src, sp, dst, dp in self.fg["connections"]:
            s, d = self.blocks.get(src), self.blocks.get(dst)
            if sp == "0" and any(n == src for n, _ in self.sources):
                assert isinstance(d, Trigger), \
                    "stream connections must feed a trigger block"
                self.stream_edges.append((src, d))
            elif isinstance(s, Trigger) and isinstance(d, CellStore):
                # PMT message port -> cellstore sink (reference
                # msg_connect trigger.{track,drop} -> cellstore)
                if sp == dp == "track":
                    prev = s.on_track
                    s.on_track = (lambda c, _d=d, _p=prev:
                                  (_d.track_cell(c),
                                   _p(c) if _p else None))
                elif sp == dp == "drop":
                    prev = s.on_drop
                    s.on_drop = (lambda cid, _d=d, _p=prev:
                                 (_d.drop_cell_id(cid),
                                  _p(cid) if _p else None))
                else:
                    raise ValueError(f"unknown message ports {sp}->{dp}")
            else:
                raise ValueError(
                    f"unsupported connection {src}.{sp} -> {dst}.{dp}")
        assert self.stream_edges, "flowgraph has no stream path"

    def run(self, time_out: float = 2.0,
            chunk_samples: int = 19200) -> dict:
        """Drive the file source(s) through the trigger(s) until a trigger
        with exit_on_success fires or stream-time `time_out` elapses.
        Returns {cellstore_name: [cell dicts]}."""
        srcs = []
        for name, params in self.sources:
            iq = np.fromfile(params["file"], dtype=np.complex64)
            repeat = params.get("repeat") in (True, "True", "true")
            srcs.append((name, iq, repeat))
        total = int(time_out * 1.92e6)
        fed = 0
        t_end = time.time() + 10 * time_out + 30     # wall-clock safety
        while fed < total and time.time() < t_end:
            for name, iq, repeat in srcs:
                lo = fed % iq.size
                chunk = np.take(iq, np.arange(lo, lo + chunk_samples),
                                mode="wrap") if repeat else \
                    iq[lo:lo + chunk_samples]
                if chunk.size == 0:
                    fed = total
                    break
                for src_name, trg in self.stream_edges:
                    if src_name == name:
                        trg.process(chunk)
            fed += chunk_samples
            if any(t.done for _, t in self.stream_edges):
                break
        for _, t in self.stream_edges:
            t.flush()
        out = {}
        from ..runtime.cellstore import CellStore
        for name, blk in self.blocks.items():
            if isinstance(blk, CellStore):
                out[name] = [c.to_dict() for c in blk.cells()]
        return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="run_flowgraph")
    p.add_argument("flowgraph", help="path to a .grc YAML flowgraph")
    p.add_argument("--time-out", type=float, default=2.0,
                   help="stream seconds to feed before stopping")
    args = p.parse_args(argv)
    runner = FlowgraphRunner(args.flowgraph)
    out = runner.run(time_out=args.time_out)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

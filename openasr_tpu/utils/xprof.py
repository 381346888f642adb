"""Shared xplane trace collection: run a closure under jax.profiler and
return the DEVICE-lane events.

On relayed/remote TPU backends host wall-clock (even with
block_until_ready) can drastically over-report throughput — the
ready-future resolves before device execution completes.  The xplane
trace's device lane records the hardware's own timing.  Three
measurement tools (bench.py, tools/bench_flash.py, tools/profile_step.py)
need this; the trace-format handling (glob layout, gzip json, device-pid
metadata scan) lives here once so a profiler format change is a one-file
fix.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile
from typing import Callable, List, Optional


def collect_device_events(
    run: Callable[[], None],
    prefix: str = "openasr_trace_",
) -> Optional[List[dict]]:
    """Execute `run()` under `jax.profiler.start_trace` and return every
    complete ('X') event on a device lane, or None when tracing or trace
    parsing is unavailable (callers fall back to wall-clock).

    `run` must block until the profiled work is done (block_until_ready)
    so the spans land inside the trace window."""
    import jax

    logdir = tempfile.mkdtemp(prefix=prefix)
    try:
        jax.profiler.start_trace(logdir)
        try:
            run()
        finally:
            jax.profiler.stop_trace()
        traces = glob.glob(
            os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
        )
        if not traces:
            return None
        with gzip.open(traces[0]) as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        device_pids = {
            e["pid"]
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e.get("args", {}).get("name", "")
        }
        return [
            e for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids
        ]
    except Exception:
        return None
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def sum_span_us(events: List[dict], name_prefix: str) -> float:
    """Total duration (microseconds) of the spans whose name starts with
    `name_prefix` (e.g. the 'jit_<fn>' module spans)."""
    return float(sum(
        e["dur"] for e in events
        if e.get("name", "").startswith(name_prefix)
    ))

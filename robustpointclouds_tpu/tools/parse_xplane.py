"""Summarize a jax.profiler trace without TensorBoard UI.

Aggregates event durations by name from the Chrome-format trace
(``*.trace.json.gz``) that jax.profiler writes next to the xplane file, so
the plan-scan pathology (see bench_plan_diag.py) can be attributed per-op on
a headless host. Events are grouped per process/"pid" (on TPU runs the
device plane is its own pid; host python/runtime threads are another), so
device op time and host-side time separate cleanly.

Usage: python -m robustpointclouds_tpu.tools.parse_xplane work_dirs/diag_trace_plan [topk]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def summarize(trace_dir, topk=30):
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    for p in sorted(paths):
        with gzip.open(p) as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        # pid -> human name from metadata events
        pid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        by_pid = collections.defaultdict(
            lambda: (collections.Counter(), collections.Counter()))
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                tot, cnt = by_pid[e.get("pid")]
                tot[e["name"]] += e["dur"]
                cnt[e["name"]] += 1
        print(f"\n==== {p}")
        for pid, (tot, cnt) in sorted(by_pid.items()):
            label = pid_names.get(pid, "")
            span = sum(tot.values())
            print(f"\n-- pid {pid} '{label}' (sum of event durations "
                  f"{span / 1e6:.3f} s)")
            for name, us in tot.most_common(topk):
                print(f"  {us / 1e6:9.3f} s  x{cnt[name]:<7d} {name[:120]}")


def _latest_trace_paths(trace_dir):
    """Trace files of the MOST RECENT capture only. jax.profiler.trace
    appends a new timestamped subdir per run; summing across subdirs
    double-counts re-used trace dirs (session-r5a measured a 391 ms pillar
    "step" that was session-8's 230 + the real 162 summed)."""
    runs = sorted(glob.glob(os.path.join(trace_dir, "plugins", "profile", "*")))
    if not runs:
        return []
    return sorted(glob.glob(os.path.join(runs[-1], "*.trace.json.gz")))


def device_module_ms(trace_dir, name_substr="scan_steps"):
    """Total duration (ms) of the named XLA module's executions on the
    DEVICE plane — the wall-clock-independent step time. Sums module-level
    events only (op events nest inside modules; summing everything would
    double count), on pids whose process_name mentions the device, in the
    LATEST capture under the dir. Returns None if the trace holds no
    matching device event, e.g. on CPU-only runs (the CPU backend has no
    separate device plane)."""
    paths = _latest_trace_paths(trace_dir)
    total_us = 0.0
    found = False
    for p in sorted(paths):
        with gzip.open(p) as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        pid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        device_pids = {
            pid for pid, nm in pid_names.items()
            if any(s in nm for s in ("TPU", "Device", "/device:", "XLA Modules"))
        }
        tid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tid_names[(e.get("pid"), e.get("tid"))] = (
                    e.get("args", {}).get("name", ""))
        matches = [
            e for e in events
            if (e.get("ph") == "X" and "dur" in e
                and e.get("pid") in device_pids
                and name_substr in e.get("name", ""))
        ]
        # prefer the module-level line when present (op/step lines can carry
        # events with the same module name — counting both double-counts)
        mod = [e for e in matches if "XLA Modules"
               in tid_names.get((e.get("pid"), e.get("tid")), "")]
        for e in (mod or matches):
            total_us += e["dur"]
            found = True
    return total_us / 1e3 if found else None


def _device_op_events(trace_dir):
    """Yield device-plane XLA op events (the 'XLA Ops' line) with their args.

    These carry full HLO provenance: `hlo_category`, `long_name` (HLO with
    operand shapes/layouts), `source` (python file:line), `model_flops`,
    `raw_bytes_accessed` — everything needed to attribute a step to source
    code without TensorBoard (VERDICT r4 item 2). Latest capture only."""
    paths = _latest_trace_paths(trace_dir)
    for p in sorted(paths):
        with gzip.open(p) as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        pid_names = {}
        tid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tid_names[(e.get("pid"), e.get("tid"))] = (
                    e.get("args", {}).get("name", ""))
        device_pids = {pid for pid, nm in pid_names.items()
                       if "TPU" in nm or "/device:" in nm}
        op_tids = {k for k, v in tid_names.items()
                   if v == "XLA Ops" and k[0] in device_pids}
        for e in events:
            if e.get("ph") == "X" and "dur" in e and (
                    e.get("pid"), e.get("tid")) in op_tids:
                yield e


# Coarse attribution buckets (VERDICT r4 item 2): categories the roofline
# discussion uses. An op is bucketed by its HLO category first (gathers are
# 'custom fusion'; retiling copies/reshapes are 'data formatting'), with its
# python source kept for the detail rows.
_SKIP_CATS = {"while", "async-start", "async-done", "copy-start",
              "copy-done", "custom-call"}


def breakdown(trace_dir, steps=10, topk=25):
    """Per-step device-time table grouped by (source file:line, category).

    `steps`: executions of the timed module in the trace (bench_r4_step and
    bench_one_variant run a 10-iteration scan). Prints the grouped table the
    round-5 optimization work keys off; see PARITY.md round-5 section."""
    import collections as _c
    by_src = _c.defaultdict(lambda: [0.0, 0, 0.0, 0.0])
    by_cat = _c.defaultdict(float)
    tot = 0.0
    for e in _device_op_events(trace_dir):
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        if cat in _SKIP_CATS:
            continue
        src = a.get("source", "")
        src = "/".join(src.split("/")[-2:]) if src else f"<no-src:{cat}>"
        g = by_src[(src, cat)]
        g[0] += e["dur"]
        g[1] += 1
        g[2] += float(a.get("model_flops", 0) or 0)
        g[3] += float(a.get("raw_bytes_accessed", 0) or 0)
        by_cat[cat] += e["dur"]
        tot += e["dur"]
    print(f"device op time: {tot / 1e3 / steps:.1f} ms/step "
          f"({steps} steps assumed)\n")
    print("by HLO category:")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us / 1e3 / steps:8.2f} ms/step  {cat}")
    print(f"\ntop {topk} (source, category):")
    rows = sorted(by_src.items(), key=lambda kv: -kv[1][0])
    for (src, cat), (us, n, fl, b) in rows[:topk]:
        print(f"  {us / 1e3 / steps:8.2f} ms/step x{n / steps:7.1f} "
              f"{b / 1e6 / steps:8.0f} MB {fl / 1e9 / steps:8.1f} GF  "
              f"{cat:<22} {src}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "breakdown":
        d = sys.argv[2] if len(sys.argv) > 2 else "work_dirs/trace_plan_base"
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        breakdown(d, steps)
        raise SystemExit(0)
    d = sys.argv[1] if len(sys.argv) > 1 else "work_dirs/diag_trace_plan"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    summarize(d, k)

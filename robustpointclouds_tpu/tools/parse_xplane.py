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


def device_module_ms(trace_dir, name_substr="scan_steps"):
    """Total duration (ms) of the named XLA module's executions on the
    DEVICE plane — the wall-clock-independent step time. Sums module-level
    events only (op events nest inside modules; summing everything would
    double count), on pids whose process_name mentions the device. Returns
    None if the trace holds no matching device event, e.g. on CPU-only runs
    (the CPU backend has no separate device plane)."""
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
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


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "work_dirs/diag_trace_plan"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    summarize(d, k)

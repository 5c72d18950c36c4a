"""Measure ONE step-variant per process (round-4 session-4).

The round-4 on-chip diagnosis (PARITY.md) showed the resident-plan scan is
fast ONLY in a lean process: loading extra executables into the same process
pushes the axon runtime's handling of resident plan buffers onto a ~25 s/step
slow path. A multi-variant sweep inside one process would therefore measure
its own process state, not the levers. This runner measures exactly one
variant (configured via RPC_VAR_* env vars) and prints one JSON line; the
persistent .jax_cache keeps per-process compile cost down for repeated
shapes. Driven by tools/run_lever_sweep.sh.
"""
from __future__ import annotations

import json
import os


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from robustpointclouds_tpu.tools.bench_r4_step import measure

    e = os.environ.get
    trace_dir = None
    if e("RPC_VAR_TRACE", "0") == "1":
        here = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        trace_dir = os.path.join(
            here, "work_dirs", f"trace_{e('RPC_VAR_NAME', 'variant')}")
    r = measure(
        batch_size=int(e("RPC_VAR_B", "6")),
        plan_mode=e("RPC_VAR_PLAN", "1") == "1",
        save_col=e("RPC_VAR_SAVE_COL", "0") == "1",
        dw_gcol=e("RPC_VAR_DW_GCOL", "0") == "1",
        xwin_max_cin=int(e("RPC_VAR_MAX_CIN", "32")),
        xwin_split=int(e("RPC_VAR_XWIN_SPLIT", str(1 << 16))),
        assign=e("RPC_VAR_ASSIGN", "1") == "1",
        dense_gather=e("RPC_VAR_DENSE_GATHER", "0") == "1",
        fpn_d2s=e("RPC_VAR_FPN_D2S", "0") == "1",
        trace_dir=trace_dir,
        predispatch=e("RPC_VAR_PREDISP", "0") == "1",
        col3=e("RPC_VAR_COL3", "0") == "1",
        pert_bf16=e("RPC_VAR_PERT_BF16", "0") == "1",
        fingerprint=e("RPC_VAR_FINGERPRINT", "0") == "1",
        compact=e("RPC_VAR_COMPACT", "0") == "1",
    )
    r["backend"] = jax.default_backend()
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

"""Capture + parse a device profile of the flagship sampler step.

Runs a short bench-style sampling loop under `jax.profiler.trace`, then
parses the xplane with xprof's framework_op_stats converter (the recipe
from CLAUDE.md). Honors the same env knobs as bench.py
(LDT_BENCH_INT8 / LDT_ATTN_PHASED / LDT_BENCH_STEPS / LDT_BENCH_BATCH).

Usage (TPU): env JAX_PLATFORMS="" LDT_BENCH_STEPS=100 \
    python scripts/profile_sampler.py [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def report_op_stats(out_dir: str, top: int = 25) -> int:
    """Parse the newest xplane under `out_dir` with xprof's
    framework_op_stats converter and print per-op device self-times."""
    xplanes = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return 1
    xplane = max(xplanes, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    obj = json.loads(data)
    # gviz DataTable(s): {cols: [{label}], rows: [{c: [{v}]}]}
    tables = [t for t in (obj if isinstance(obj, list) else [obj])
              if isinstance(t, dict) and "cols" in t]
    if not tables:
        print(json.dumps(obj, indent=2)[:2000])
        return 0
    t = tables[0]
    cols = [c.get("label") or c.get("id") for c in t["cols"]]
    rows = [[c.get("v") if c else None for c in r["c"]] for r in t["rows"]]
    i_hd = cols.index("Host/device")
    i_type = cols.index("Operation Type")
    i_name = cols.index("Operation Name")
    i_occ = cols.index("#Occurrences")
    i_self = cols.index("Total self-time (us)")
    dev = [r for r in rows if r[i_hd] == "Device"
           and r[i_type] != "IDLE"]
    dev.sort(key=lambda r: -float(r[i_self] or 0))
    total = sum(float(r[i_self] or 0) for r in dev)
    print(f"{'type':<22}{'name':<44}{'occ':>7}{'self us':>11}{'%':>7}")
    for r in dev[:top]:
        print(f"{str(r[i_type])[:20]:<22}{str(r[i_name])[:42]:<44}"
              f"{int(r[i_occ]):>7}{float(r[i_self]):>11.0f}"
              f"{float(r[i_self]) / max(total, 1e-9):>7.1%}")
    print(f"TOTAL device self us (excl. IDLE): {total:.0f}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ldt_prof")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    os.environ.setdefault("LDT_BENCH_STEPS", "100")
    os.environ.setdefault("LDT_BENCH_REPS", "1")
    import bench

    os.makedirs(args.out, exist_ok=True)
    # warm-up/compile happens inside bench.main's first generate(); trace
    # only the timed reps by monkey-wrapping time.perf_counter is overkill —
    # instead trace the whole main() and read per-op totals (compile runs on
    # the host, not the device timeline).
    with jax.profiler.trace(args.out):
        bench.main()

    return report_op_stats(args.out, args.top)


if __name__ == "__main__":
    sys.exit(main())

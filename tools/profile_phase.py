#!/usr/bin/env python
"""Per-frame phase budget from a real jax.profiler trace of the parity step.

Captures a device trace over N tracked frames of the production tracker
(512x512, full delta set, 12 iterations — the bench.py parity mode), then
aggregates per-HLO-op self time into phase buckets using the op provenance
metadata (flax module scopes end up in HLO op_name / provenance strings).

This replaces the traced-ablation attribution (tools/attrib_bench.py) with
ground truth: every microsecond of device time lands in exactly one bucket,
so the buckets sum to the measured frame time instead of being differences
of noisy full-graph runs.

Usage (chip must be free):
    python tools/profile_phase.py [--size 512]
        [--frames 8] [--json out.json]

Prints an org-table of ms/frame per bucket + the top individual ops.
"""

import argparse
import glob
import json
import os
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

# bucket -> regexes matched (first hit wins, in order) against
# "<category> | <framework op name> | <hlo op name>". Calibrated against
# the round-5 512x512 parity trace (docs/PERFORMANCE.md phase table):
# the three pallas custom-call families are distinguished by their
# framework scopes (fused lookup lives under update_block/encoder because
# it fuses the motion encoder's convc1).
BUCKETS = [
    ("corr lookup (fused, pallas)",
     r"custom-call.*update_block/encoder/pallas_call"),
    ("corr lookup (last iter, pallas)",
     r"custom-call.*flow_from_features/pallas_call"),
    ("chain+select warp (pallas)", r"custom-call.*jit\(frame\)/pallas_call"),
    ("layout copies", r"^data formatting"),
    ("encoder convs (fnet+cnet)", r"RAFT\.encode.*conv"),
    ("update: GRU convs", r"gru/conv"),
    ("update: motion enc convs", r"encoder/conv"),
    ("update: flow/mask/OU convs",
     r"flow_head/conv|mask|occlusion_block.*conv"),
    ("corr pyramid dots", r"bpc,bqc|bpq"),
    ("convex upsample dots", r"bhwkd,bhwkc"),
    ("other convolution", r"conv_general_dilated|convolution"),
    ("ring gather/update", r"dynamic-update-slice|dynamic_update_slice|"
     r"dynamic-slice|dynamic_slice|gather|scatter"),
    ("host transfer", r"infeed|outfeed|copy-start|copy-done|transfer"),
]


def build_tracker(size, schedule=None):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    return bench.make_tracker(schedule)


def capture(tracker, size, n_frames, trace_dir):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
              for _ in range(n_frames + 5)]
    tracker.init(frames[0])
    for f in frames[1:4]:  # compile + warm
        meta = tracker.track(f)
    np.asarray(meta.result.occlusion[:1, :1])

    with jax.profiler.trace(str(trace_dir)):
        for f in frames[4:4 + n_frames]:
            meta = tracker.track(f)
        np.asarray(meta.result.occlusion[:1, :1])
    t0 = time.perf_counter()
    for f in frames[4:4 + n_frames]:
        meta = tracker.track(f)
    np.asarray(meta.result.occlusion[:1, :1])
    wall_ms = (time.perf_counter() - t0) / n_frames * 1000.0
    return wall_ms


def find_xplane(trace_dir):
    hits = glob.glob(str(trace_dir) + "/**/*.xplane.pb", recursive=True)
    if not hits:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    return max(hits, key=os.path.getmtime)


def op_table(xplane_path):
    """-> list of dict rows from the hlo op stats tool (self time us etc.)."""
    from xprof.convert import raw_to_tool_data

    for tool in ("hlo_op_stats", "hlo_stats", "framework_op_stats",
                 "tensorflow_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplane_path], tool, params={})
        except Exception:
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        try:
            table = json.loads(data)
        except Exception:
            continue
        rows = _gviz_rows(table)
        if rows:
            return tool, rows
    raise RuntimeError("no usable op-stats tool output")


def _gviz_rows(table):
    """Accept either gviz {cols,rows} or a list-of-lists JSON table."""
    if isinstance(table, dict) and "rows" in table and "cols" in table:
        names = [c.get("label") or c.get("id") for c in table["cols"]]
        out = []
        for r in table["rows"]:
            vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            out.append(dict(zip(names, vals)))
        return out
    if isinstance(table, list) and table and isinstance(table[0], dict):
        return table
    return []


def bucketize(rows, n_frames):
    """Aggregate self-time into phase buckets. Returns (bucket->ms, details)."""
    def col(row, *cands):
        for c in cands:
            for k in row:
                if k and c == k.lower().replace(" ", "_"):
                    return row[k]
        return None

    buckets = defaultdict(float)
    top = []
    total_us = 0.0
    for row in rows:
        # occurrences × avg self time, or total self time, in us
        t = col(row, "total_self_time_(us)", "total_self_time",
                "self_time_(us)", "self-time(us)", "total_self_time_in_us")
        if t is None:
            occ = col(row, "#occurrences", "occurrences", "count") or 0
            avg = col(row, "avg._self_time_(us)", "avg_self_time_(us)",
                      "avg_self_time") or 0
            t = float(occ) * float(avg)
        t = float(t or 0)
        if t <= 0:
            continue
        name = " | ".join(str(col(row, k) or "") for k in
                          ("hlo_op_category", "category",
                           "framework_op_name", "hlo_op_name", "op_name",
                           "hlo_op_text", "op_expression"))
        total_us += t
        top.append((t, name.strip()[:200]))
        for bname, pat in BUCKETS:
            if re.search(pat, name, re.IGNORECASE):
                buckets[bname] += t
                break
        else:
            buckets["other"] += t
    ms = {k: v / 1000.0 / n_frames for k, v in buckets.items()}
    top.sort(reverse=True)
    return ms, total_us / 1000.0 / n_frames, top[:25]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--xplane", default=None,
                    help="skip capture; parse an existing xplane.pb")
    args = ap.parse_args()

    if args.xplane:
        xp, wall_ms = args.xplane, float("nan")
    else:
        import jax
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        trace_dir = Path("/tmp/mft_trace")
        tracker = build_tracker(args.size)
        wall_ms = capture(tracker, args.size, args.frames, trace_dir)
        xp = find_xplane(trace_dir)
        print(f"# trace: {xp}")

    tool, rows = op_table(xp)
    ms, total_ms, top = bucketize(rows, args.frames)
    print(f"# tool={tool}  frames={args.frames}  wall={wall_ms:.1f} ms/frame  "
          f"device-total={total_ms:.1f} ms/frame")
    print("| phase | ms/frame |")
    print("|---|---|")
    for k, v in sorted(ms.items(), key=lambda kv: -kv[1]):
        print(f"| {k} | {v:.2f} |")
    print("\n# top ops (total us over all frames)")
    for t, name in top:
        print(f"{t:12.0f}  {name[:160]}")
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"wall_ms_per_frame": wall_ms, "device_ms_per_frame": total_ms,
             "buckets_ms": ms, "tool": tool}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

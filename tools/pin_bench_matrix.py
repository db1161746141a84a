"""Record the full bench matrix as a committed artifact (VERDICT r2 item 4).

Runs the three bench modes as subprocesses on the live TPU —
``bench.py --all`` (the 5 BASELINE workload configs), ``--niter 20`` (the
reference's converged iteration setting), ``--bf16`` (the rejected bf16
speed path with its precision budget), ``--grad`` (adjoint throughput:
one complete value+gradient evaluation) — annotates every JSON line with
provenance, and writes ``docs/BENCH_ALL.json`` (one JSON object per
line).  SCALING.md cites this artifact instead of prose ranges.

    make bench-matrix        (or: python tools/pin_bench_matrix.py)

Run with an otherwise idle host (slope-timing methodology, bench.py).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = [
    # --all runs WITH the default on-device fused-vs-jit parity gate
    # (VERDICT r3 item 3): every fused speed row (COARE3.6+skin, ECMWF
    # +skin, mixed ice+ocean) carries measured parity fields, at the cost
    # of one jit-path compile per workload.
    ("all", ["--all"]),
    # niter20 runs the gate too: measured 2026-08-21 (parity_ok=true,
    # significant-error fraction 0.0 at niter=20) — the feared
    # 4x-unrolled-graph compile cost turned out affordable (~10 min).
    ("niter20", ["--niter", "20"]),
    ("bf16", ["--bf16"]),
    ("grad", ["--grad"]),       # adjoint throughput (value+gradient)
    # end-to-end streamed production run: host->device feed of every
    # record + async output collection (VERDICT r3 item 1c)
    ("streamed", ["--streamed"]),
    # same with the int16 scale-offset wire format (half the H2D bytes —
    # the lever on a feed-bound link)
    ("streamed_i16", ["--streamed", "--wire-i16"]),
    # NB --collect-i16 (int16 read-back, bench metric *_i16out) measured
    # NEGATIVE on this tunnel: 9.4e5 pts/s vs 1.45e6 for i16-in-only —
    # the 8.3 MB/record D2H saving (~0.18 s at link rate) is outweighed
    # by the extra per-chunk packing dispatch + small-array RPCs
    # (docs/SCALING.md "Streamed").  Not pinned as a matrix row.
]


def main():
    stamp = sys.argv[1] if len(sys.argv) > 1 else "unstamped"
    out_lines = []
    for mode, args in MODES:
        print(f"=== bench.py {' '.join(args)} ===", flush=True)
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")]
                           + args, capture_output=True, text=True, cwd=ROOT)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"bench mode {mode} failed")
        for ln in r.stdout.splitlines():
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            rec = json.loads(ln)
            rec["bench_mode"] = mode
            rec["provenance"] = (
                f"bench.py {' '.join(args)}; slope-timed (median of 3), "
                f"idle host; recorded {stamp}")
            out_lines.append(rec)
            print(json.dumps(rec), flush=True)

    path = os.path.join(ROOT, "docs", "BENCH_ALL.json")
    with open(path, "w") as fh:
        for rec in out_lines:
            fh.write(json.dumps(rec) + "\n")
    print(f"wrote {path} ({len(out_lines)} records)")


if __name__ == "__main__":
    main()

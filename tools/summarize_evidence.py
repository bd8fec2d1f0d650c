"""Render the convergence-evidence tables in BASELINE.md from the raw
jsonl artifacts under evidence/ — regenerate after any new study run.

Usage: python tools/summarize_evidence.py
"""
from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EV = os.path.join(HERE, "evidence")


def load(name):
    path = os.path.join(EV, name)
    if not os.path.exists(path):
        return {}
    out = {}
    for line in open(path):
        r = json.loads(line)
        if "step" in r:
            out[r["step"]] = r["val_rel_error"]
        elif "Step" in r:                     # refinenet gsheet rows
            out[r["Step"]] = {k: v for k, v in r.items() if k != "Step"}
    return out


def table(title, columns):
    print(f"\n### {title}\n")
    keys = sorted(set().union(*[set(c.keys()) for _, c in columns if c]))
    print("| step | " + " | ".join(n for n, c in columns if c) + " |")
    print("|" + "---|" * (1 + sum(1 for _, c in columns if c)))
    for k in keys:
        cells = []
        for _, c in columns:
            if not c:
                continue
            v = c.get(k)
            cells.append(f"{v:.2f}" if isinstance(v, float) else "—")
        print(f"| {k} | " + " | ".join(cells) + " |")


def main() -> None:
    table("Seg2Eye 1500-step matched pair (val relative error)", [
        ("reference semantics", load("convergence_baseline.jsonl")),
        ("reuse_fake", load("convergence_reuse_fake.jsonl")),
        ("uint8 transport", load("convergence_u8.jsonl")),
    ])
    table("Seg2Eye 4500-step soak", [
        ("reference semantics", load("convergence_soak.jsonl")),
        ("reuse_fake", load("convergence_soak_reuse.jsonl")),
    ])
    seg = load("segnet_curve.jsonl")
    ref = load("refinenet_curve.jsonl")
    if seg and ref:
        print("\n### RefineNet pipeline\n")
        print("| step | segnet val acc | segnet val CE | refiner val score "
              "| val/pick1 score |")
        print("|---|---|---|---|---|")
        for s in sorted(set(seg) | set(ref)):
            a = seg.get(s, {})
            b = ref.get(s, {})
            def f(d, k):
                return f"{d[k]:.3f}" if k in d else "—"
            print(f"| {s} | {f(a, 'val/accuracy')} | {f(a, 'val/ce_loss')} |"
                  f" {f(b, 'val/score')} | {f(b, 'val/pick1/score')} |")


if __name__ == "__main__":
    sys.exit(main())

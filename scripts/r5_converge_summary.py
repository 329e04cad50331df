"""Summarize the round-5 matched-seed convergence A/B/C into one JSON.

Reads runs/converge_r5_{f32,bf16,exact}_metrics.csv + the eval JSON logs and
writes runs/converge_r5_summary.json with final/best loss_f, plateau means,
epoch times, and held-out eval CD/EMD per variant.
"""
import json
import os
import sys

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_csv(path):
    rows = []
    with open(path) as f:
        header = f.readline().strip().split(",")
        for line in f:
            vals = line.strip().split(",")
            rows.append(dict(zip(header, (float(v) for v in vals))))
    return rows


def main():
    out = {"protocol": "64 synthetic samples seed 0, B=2, 200 epochs, one "
                       "v5e; variants differ ONLY in the tagged dimension",
           "variants": {}}
    for tag in ("f32", "bf16", "exact"):
        csv = os.path.join(BASE, f"runs/converge_r5_{tag}_metrics.csv")
        if not os.path.exists(csv):
            continue
        rows = read_csv(csv)
        lf = [r["loss_f"] for r in rows]
        finite = [v for v in lf if v == v]
        rec = {
            "epochs": len(rows),
            "mean_epoch_time_s": round(
                sum(r["epoch_time_s"] for r in rows if "epoch_time_s" in r)
                / max(len(rows), 1), 2) if rows and "epoch_time_s" in rows[0]
            else None,
        }
        if len(finite) < len(lf):
            rec["diverged"] = True
            rec["nan_from_epoch"] = next(
                i for i, v in enumerate(lf) if v != v)
        if finite:
            rec.update({
                "final_loss_f": round(lf[-1], 4) if lf[-1] == lf[-1] else None,
                "best_loss_f": round(min(finite), 4),
                "plateau_mean_last30": round(
                    sum(lf[-30:]) / min(30, len(lf)), 4)
                if all(v == v for v in lf[-30:]) else None,
            })
        ev = os.path.join(BASE, f"runs/converge_r5_{tag}_eval.json.log")
        if os.path.exists(ev):
            for line in reversed(open(ev).read().splitlines()):
                if line.startswith("{"):
                    j = json.loads(line)
                    rec["eval"] = {k: round(v, 4) for k, v in j.items()
                                   if k.startswith(("cd_", "emd_"))}
                    break
        out["variants"][tag] = rec
    path = os.path.join(BASE, "runs/converge_r5_summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

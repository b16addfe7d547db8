"""Merge per-mode accuracy artifacts into one ACCURACY_r*.json.

The remote-TPU tunnel wedges sporadically on long processes, so accuracy
runs per mode (accuracy.py --modes geometric / --modes learned) and this
merges the results + recomputes the cross-mode summary.

    python scripts/merge_accuracy.py ACC_r05_geo.json ACC_r05_learned.json \
        --out ACCURACY_r05.json
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    merged = None
    for path in args.inputs:
        with open(path) as f:
            part = json.load(f)
        if merged is None:
            merged = part
            continue
        merged["modes"].update(part["modes"])
        merged["summary"].update(part.get("summary", {}))

    modes = merged["modes"]
    summary = merged.setdefault("summary", {})
    if "geometric" in modes:
        reg = modes["geometric"]["register"]
        summary["geometric_full_auc_adds"] = reg["full"]["overall_auc_adds"]
        summary["funnel_vs_full_auc_delta"] = round(
            reg["funnel"]["overall_auc_adds"] - reg["full"]["overall_auc_adds"], 4
        )
    if "learned" in modes:
        reg = modes["learned"]["register"]
        summary["learned_full_auc_adds"] = reg["full"]["overall_auc_adds"]
        if "overall_auc_adds" in reg.get("coarse112", {}):
            summary["learned_coarse112_vs_full_auc_delta"] = round(
                reg["coarse112"]["overall_auc_adds"]
                - reg["full"]["overall_auc_adds"], 4
            )
        if "track" in modes["learned"]:
            summary["learned_track_auc_adds"] = (
                modes["learned"]["track"]["overall_auc_adds"]
            )
            summary["learned_track_median_ate_m"] = (
                modes["learned"]["track"]["median_ate_m"]
            )
    if "learned_hybrid" in modes:
        blk = modes["learned_hybrid"]
        summary["hybrid_full_auc_adds"] = (
            blk["register"]["full"]["overall_auc_adds"]
        )
        summary["hybrid_funnel_auc_adds"] = (
            blk["register"].get("funnel", {}).get("overall_auc_adds")
        )
        if "track" in blk:
            summary["hybrid_track_auc_adds"] = blk["track"]["overall_auc_adds"]
            summary["hybrid_track_median_ate_m"] = blk["track"]["median_ate_m"]
    if "geometric" in modes and "learned" in modes:
        g = modes["geometric"]["register"]["full"]["scenes"]
        l = modes["learned"]["register"]["full"]["scenes"]
        common = sorted(set(g) & set(l))
        summary["learned_vs_geometric_adds_mean"] = {
            k: {"geometric": g[k]["adds_mean"], "learned": l[k]["adds_mean"]}
            for k in common
        }
        summary["learned_beats_geometric_scenes"] = sum(
            1 for k in common if l[k]["adds_mean"] <= g[k]["adds_mean"]
        )
        if "track" in modes["geometric"]:
            summary["geometric_track_auc_adds"] = (
                modes["geometric"]["track"]["overall_auc_adds"]
            )

    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

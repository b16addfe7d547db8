"""Merge a targeted scene re-measurement into a standing accuracy artifact.

Usage: python scripts/merge_accuracy.py BASE.json PATCH.json OUT.json

Replaces the per-scene entries of BASE with those PATCH re-measured (same
protocol, same schedules), then recomputes every pooled number from the
per-scene trial lists so overall AUCs reflect the merged data. Records which
scenes were re-measured (and from where) in the block meta so the artifact
stays honest about provenance.
"""

import json
import sys

import numpy as np


def _auc(errs, max_val=0.1):
    from foundationpose_tpu.core import metrics

    return round(metrics.compute_auc(np.asarray(errs), max_val=max_val), 4)


def merge(base, patch, note):
    for mode, pmd in patch["modes"].items():
        bmd = base["modes"].setdefault(mode, {})
        for sched, psd in pmd.get("register", {}).items():
            if not (isinstance(psd, dict) and "scenes" in psd):
                continue
            bsd = bmd.setdefault("register", {}).setdefault(sched, {"scenes": {}})
            if "scenes" not in bsd:  # BASE marked it equivalent_to; skip
                continue
            bsd["scenes"].update(psd["scenes"])
            pooled_adds, pooled_add = [], []
            for name, sc in bsd["scenes"].items():
                pooled_adds += sc["adds"]
                if sc.get("add_pooled", True):
                    pooled_add += sc["add"]
            bsd["overall_auc_adds"] = _auc(pooled_adds)
            bsd["overall_auc_add"] = _auc(pooled_add) if pooled_add else None
        pt = pmd.get("track", {})
        if "scenes" in pt:
            bt = bmd.setdefault("track", {"scenes": {}})
            bt["scenes"].update(pt["scenes"])
            ates = [v["ate_m"] for v in bt["scenes"].values()]
            bt["median_ate_m"] = round(float(np.median(ates)), 5)
            # pooled track AUC: compute_auc is a per-sample mean of the
            # trapezoid-integrated recall, so the pooled-union AUC equals the
            # n_frames-weighted mean of per-scene AUCs exactly (up to the 4
            # decimals the per-scene values are stored at)
            w = np.array([v["n_frames"] for v in bt["scenes"].values()], float)
            a = np.array([v["auc_adds"] for v in bt["scenes"].values()])
            bt["overall_auc_adds"] = round(float((w * a).sum() / w.sum()), 4)
        meta = bmd.setdefault("meta", {})
        meta.setdefault("remeasured", []).append(
            {"scenes": sorted({s for blk in ("register", "track")
                               for sd in pmd.get(blk, {}).values()
                               if isinstance(sd, dict)
                               for s in sd.get("scenes", {})}
                              | set(pmd.get("track", {}).get("scenes", {}))),
             "note": note}
        )
    return base


def main():
    base_p, patch_p, out_p = sys.argv[1:4]
    note = sys.argv[4] if len(sys.argv) > 4 else "targeted re-measurement"
    base = json.load(open(base_p))
    patch = json.load(open(patch_p))
    merged = merge(base, patch, note)
    with open(out_p, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", out_p)


if __name__ == "__main__":
    main()

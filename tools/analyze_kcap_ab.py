"""Summarize the K-escalation A/B (VERDICT r2 item 4 / r3 weak #3).

Reads artifacts/kcap_ab_escalating.json (K starts at 16, trainer doubles
it on observed rect truncation) and artifacts/kcap_ab_fixed64.json
(K=64 from step 0 — never truncates on this scene) and writes
artifacts/kcap_ab.json with the paired PSNR trajectories and their gap,
answering: does the brief pre-escalation truncation window hurt the
optimization trajectory at >=30k scale?

Run after tools/cpu_queue_r4.sh step 3:
    PYTHONPATH=. python tools/analyze_kcap_ab.py
"""

from __future__ import annotations

import json
import os

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")


def main():
    a = json.load(open(os.path.join(ART, "kcap_ab_escalating.json")))
    b = json.load(open(os.path.join(ART, "kcap_ab_fixed64.json")))
    pa = {p["i"]: p["psnr"] for p in a["psnr"]}
    pb = {p["i"]: p["psnr"] for p in b["psnr"]}
    common = sorted(set(pa) & set(pb))
    pairs = [{"i": i, "psnr_escalating": pa[i], "psnr_fixed64": pb[i],
              "gap_db": round(pa[i] - pb[i], 3)} for i in common]
    gaps = [p["gap_db"] for p in pairs]
    # compare only after both runs' schedules have stabilized: the
    # escalation settles within the first report interval (grow_tiles
    # events log exactly when)
    settle_i = max([e["i"] for e in a.get("grow_tiles", [])] or [0])
    post = [p["gap_db"] for p in pairs if p["i"] > settle_i]
    out = {
        "escalating": {"grow_tiles": a.get("grow_tiles", []),
                       "n_dropped_rect": a.get("n_dropped_rect", 0),
                       "final_alive": a.get("final_alive"),
                       "completed": a.get("completed", False)},
        "fixed64": {"n_dropped_rect": b.get("n_dropped_rect", 0),
                    "final_alive": b.get("final_alive"),
                    "completed": b.get("completed", False)},
        "pairs": pairs,
        "gap_final_db": gaps[-1] if gaps else None,
        "gap_mean_post_settle_db": (round(sum(post) / len(post), 3)
                                    if post else None),
        "verdict": None,
    }
    if gaps:
        ok = abs(out["gap_final_db"]) <= 0.3 and (
            out["gap_mean_post_settle_db"] is None
            or abs(out["gap_mean_post_settle_db"]) <= 0.3)
        out["verdict"] = (
            "escalating-K PSNR trajectory matches fixed K=64 within 0.3 dB"
            if ok else
            "trajectories diverge beyond 0.3 dB — see pairs")
    path = os.path.join(ART, "kcap_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: final gap {out['gap_final_db']} dB, "
          f"post-settle mean {out['gap_mean_post_settle_db']} dB")
    print(out["verdict"])


if __name__ == "__main__":
    main()

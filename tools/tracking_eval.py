"""Quantitative tracking eval on a trained synthetic sequence.

VERDICT r4 item 5 / BASELINE configs 4-5: the reference's headline claim is
*tracking* by persistent dynamic gaussians (/root/reference/README.md:3),
but its quantitative eval was "to be released" (README.md:74-78). This tool
closes the loop on the framework's own evidence: the synthetic GT scene's
foreground moves by a KNOWN rigid transform (data/synthetic.animate:46-56),
so any t=0 foreground point has an exact ground-truth trajectory — we
measure the trained model's tracking against it with the same metric
definitions the reference's metrics.py uses (PCK, ATE, RPE).

Inputs: the stacked params npz written by tools/dynamic_run.py
--save_params (same scene seed/args must be passed here).

Outputs: artifacts/tracking_eval.json with
  * 2D PCK @ 0.05*max(W,H) and @ 2px, median pixel error — averaged over
    the training camera rig, all timesteps
  * 3D track error (mean/median/p90 L2) per timestep summary
  * 6-DOF ATE / RPE (translation, rotation) of the tracked query poses

Usage:
  PYTHONPATH=. python tools/tracking_eval.py \
      --params artifacts/seq50_params.npz --n 50000 --timesteps 50 \
      --cams 8 --hw 256 --queries 256
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def gt_rigid(t: int, num_t: int):
    """The synthetic scene's fg motion (data/synthetic.animate:46-56)."""
    frac = t / max(num_t - 1, 1)
    ang = 0.6 * frac
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    shift = np.array([0.35 * frac, -0.15 * frac, 0.0], np.float32)
    return R, shift


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", type=str, required=True)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--timesteps", type=int, default=50)
    ap.add_argument("--cams", type=int, default=8)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="artifacts/tracking_eval.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.data import synthetic
    from dynamic3dgaussians_tpu.eval.metrics import ate, pck, rpe
    from dynamic3dgaussians_tpu.eval.tracking import (project_tracks,
                                                      track_points_3d,
                                                      track_rotations)
    from dynamic3dgaussians_tpu.ops.camera import orbit_cameras
    from dynamic3dgaussians_tpu.ops.quat import quat_to_rotmat
    from dynamic3dgaussians_tpu.viz.export import load_params

    stacked = load_params(args.params)
    T = stacked["means3D"].shape[0]
    assert T == args.timesteps, (T, args.timesteps)

    # the SAME scene dynamic_run built (seed-matched), for GT queries
    scene = synthetic.make_gt_scene(n_fg=args.n // 2, n_bg=args.n // 2,
                                    seed=args.seed)
    rng = np.random.RandomState(123)
    qi = rng.choice(scene["n_fg"], size=args.queries, replace=False)
    queries = scene["means"][qi].astype(np.float32)          # (Q, 3) at t=0

    gt3 = np.stack([queries @ gt_rigid(t, T)[0].T + gt_rigid(t, T)[1]
                    for t in range(T)])                      # (T, Q, 3)
    pred3 = np.asarray(track_points_3d(stacked, jnp.asarray(queries),
                                       k=args.knn))          # (T, Q, 3)
    err3 = np.linalg.norm(pred3 - gt3, axis=-1)              # (T, Q)

    # 2D PCK through the training rig (same orbit make_dataset builds)
    cams = orbit_cameras(center=(0.0, 0.0, 0.0), radius=4.0, height=-1.0,
                         n=args.cams, w=args.hw, h=args.hw,
                         f=float(args.hw) * 0.9)
    pck05, pck2px, px_med = [], [], []
    for cam in cams:
        p2 = np.asarray(project_tracks(jnp.asarray(pred3), cam))
        g2 = np.asarray(project_tracks(jnp.asarray(gt3), cam))
        pck05.append(float(pck(p2, g2, (args.hw, args.hw), ratio=0.05)))
        pck2px.append(float(pck(p2, g2, (args.hw, args.hw),
                                ratio=2.0 / args.hw)))
        px_med.append(float(np.median(np.linalg.norm(p2 - g2, axis=-1))))

    # 6-DOF: per-query pose series [R_rel(t) | x(t)] vs GT rigid motion
    pq = np.asarray(track_rotations(stacked, jnp.asarray(queries),
                                    k=args.knn))             # (T, Q, 4)
    Rp = np.asarray(quat_to_rotmat(jnp.asarray(pq.reshape(-1, 4)),
                                   normalized=True)).reshape(T, -1, 3, 3)
    ates, rpes_t, rpes_r = [], [], []
    for q in range(min(args.queries, 64)):   # pose metrics per query
        pred_pose = np.tile(np.eye(4, dtype=np.float64), (T, 1, 1))
        gt_pose = np.tile(np.eye(4, dtype=np.float64), (T, 1, 1))
        for t in range(T):
            Rg, sh = gt_rigid(t, T)
            pred_pose[t, :3, :3] = Rp[t, q]
            pred_pose[t, :3, 3] = pred3[t, q]
            gt_pose[t, :3, :3] = Rg
            gt_pose[t, :3, 3] = gt3[t, q]
        ates.append(ate(pred_pose, gt_pose))
        te, re = rpe(pred_pose, gt_pose)
        rpes_t.append(te)
        rpes_r.append(re)

    res = {
        "params": args.params, "timesteps": T, "queries": args.queries,
        "knn": args.knn, "img_hw": args.hw, "cams": args.cams,
        "pck_0.05": round(float(np.mean(pck05)), 4),
        "pck_2px": round(float(np.mean(pck2px)), 4),
        "px_err_median": round(float(np.mean(px_med)), 3),
        "err3d_mean": round(float(err3.mean()), 5),
        "err3d_median": round(float(np.median(err3)), 5),
        "err3d_p90": round(float(np.percentile(err3, 90)), 5),
        "err3d_final_t": round(float(err3[-1].mean()), 5),
        "ate_mean": round(float(np.mean(ates)), 5),
        "rpe_trans_mean": round(float(np.mean(rpes_t)), 6),
        "rpe_rot_deg_mean": round(float(np.mean(rpes_r)), 4),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

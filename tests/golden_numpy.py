"""Independent golden renderer: naive per-pixel NumPy, exact CUDA semantics.

This plays the role the reference's gsplat cross-checks play (SURVEY.md §4):
a second, independent implementation of the math in
…/cuda_rasterizer/forward.cu — per-pixel sequential front-to-back compositing
with the exact skip/terminate rules — against which both JAX renderers are
validated. Deliberately slow and simple; tiny scenes only.
"""

from __future__ import annotations

import numpy as np


def quat_to_rotmat_np(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - r * z)
    R[..., 0, 2] = 2 * (x * z + r * y)
    R[..., 1, 0] = 2 * (x * y + r * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - r * x)
    R[..., 2, 0] = 2 * (x * z - r * y)
    R[..., 2, 1] = 2 * (y * z + r * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def golden_render(w2c, proj_mat, fx, fy, cx, cy, W, H,
                  means3d, colors, opacity, scales, quats,
                  bg=None, near=0.01, early_stop=False,
                  tile_h=16, tile_w=16):
    """Render exactly as forward.cu does, one pixel at a time.

    Includes the tile-rect support cutoff (a gaussian only composites into
    pixels of tiles its 3-sigma rect touches, forward.cu:246-250 +
    renderCUDA's per-tile lists) — visible semantics, not an optimization.

    Returns dict(channels (H,W,C), depth (H,W), alpha (H,W), radii (N,)).
    """
    n = means3d.shape[0]
    C = colors.shape[1]
    bg = np.zeros(C) if bg is None else np.asarray(bg, np.float64)
    full = proj_mat @ w2c
    tan_fovx = W / (2 * fx)
    tan_fovy = H / (2 * fy)

    recs = []  # (depth, idx, mean2d, conic)
    radii = np.zeros(n, np.int32)
    for i in range(n):
        p = means3d[i]
        p_view = w2c[:3, :3] @ p + w2c[:3, 3]
        if p_view[2] <= near:
            continue
        ph = full @ np.append(p, 1.0)
        pw = 1.0 / (ph[3] + 1e-7)
        ndc = ph[:3] * pw
        mean2d = np.array([((ndc[0] + 1) * W - 1) / 2, ((ndc[1] + 1) * H - 1) / 2])

        R = quat_to_rotmat_np(quats[i])
        M = R @ np.diag(scales[i])
        V = M @ M.T
        t = p_view.copy()
        lim_x_pos = (W - cx) / fx + 0.3 * tan_fovx
        lim_x_neg = cx / fx + 0.3 * tan_fovx
        lim_y_pos = (H - cy) / fy + 0.3 * tan_fovy
        lim_y_neg = cy / fy + 0.3 * tan_fovy
        txtz, tytz = t[0] / t[2], t[1] / t[2]
        t[0] = min(lim_x_pos, max(-lim_x_neg, txtz)) * t[2]
        t[1] = min(lim_y_pos, max(-lim_y_neg, tytz)) * t[2]
        J = np.array([[fx / t[2], 0, -fx * t[0] / t[2] ** 2],
                      [0, fy / t[2], -fy * t[1] / t[2] ** 2]])
        Tm = J @ w2c[:3, :3]
        cov2d = Tm @ V @ Tm.T
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        if det <= 0:
            continue
        conic = np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]]) / det
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3 * np.sqrt(max(lam, 0.0)))
        if (mean2d[0] + radius < 0 or mean2d[0] - radius > W - 1
                or mean2d[1] + radius < 0 or mean2d[1] - radius > H - 1):
            continue
        radii[i] = int(radius)
        # tile rect (same formula as projection.tile_rect)
        grid_w, grid_h = -(-W // tile_w), -(-H // tile_h)
        tx0 = int(np.clip(np.floor((mean2d[0] - radius) / tile_w), 0, grid_w))
        ty0 = int(np.clip(np.floor((mean2d[1] - radius) / tile_h), 0, grid_h))
        tx1 = int(np.clip(np.floor((mean2d[0] + radius) / tile_w) + 1, 0, grid_w))
        ty1 = int(np.clip(np.floor((mean2d[1] + radius) / tile_h) + 1, 0, grid_h))
        recs.append((p_view[2], i, mean2d, conic, (tx0, ty0, tx1, ty1)))

    recs.sort(key=lambda r: r[0])  # stable, front-to-back

    channels = np.zeros((H, W, C))
    depth_img = np.zeros((H, W))
    alpha_img = np.zeros((H, W))
    for yy in range(H):
        for xx in range(W):
            T = 1.0
            ptx, pty = xx // tile_w, yy // tile_h
            for z, i, m2d, conic, rect in recs:
                if not (rect[0] <= ptx < rect[2] and rect[1] <= pty < rect[3]):
                    continue
                d0, d1 = m2d[0] - xx, m2d[1] - yy
                power = (-0.5 * (conic[0] * d0 * d0 + conic[2] * d1 * d1)
                         - conic[1] * d0 * d1)
                if power > 0:
                    continue
                a = min(0.99, opacity[i] * np.exp(power))
                if a < 1.0 / 255.0:
                    continue
                test_T = T * (1 - a)
                if early_stop and test_T < 1e-4:
                    break
                channels[yy, xx] += colors[i] * a * T
                depth_img[yy, xx] += z * a * T
                alpha_img[yy, xx] += a * T
                T = test_T
            channels[yy, xx] += T * bg
    return {"channels": channels, "depth": depth_img, "alpha": alpha_img,
            "radii": radii}

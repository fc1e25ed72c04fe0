"""NumPy oracle: loop-based transcription of the reference renderer semantics.

This mirrors the behavior of the reference Warp kernels
(/root/reference/forward.py and backward.py) step by step so the JAX/TPU
implementation can be tested for numerical parity (BASELINE.json: "rendered
images and pixel gradients allclose to forward.py/backward.py").  It is a test
oracle only — slow Python loops, tiny scenes.
"""

from __future__ import annotations

import numpy as np

TILE = 16
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396]
SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435]


def quat_to_rot(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def eval_sh_color(sh16, d, degree):
    x, y, z = d
    res = SH_C0 * sh16[0]
    if degree > 0:
        res = res - SH_C1 * y * sh16[1] + SH_C1 * z * sh16[2] - SH_C1 * x * sh16[3]
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (res + SH_C2[0] * xy * sh16[4] + SH_C2[1] * yz * sh16[5]
                   + SH_C2[2] * (2 * zz - xx - yy) * sh16[6]
                   + SH_C2[3] * xz * sh16[7] + SH_C2[4] * (xx - yy) * sh16[8])
            if degree > 2:
                res = (res + SH_C3[0] * y * (3 * xx - yy) * sh16[9]
                       + SH_C3[1] * xy * z * sh16[10]
                       + SH_C3[2] * y * (4 * zz - xx - yy) * sh16[11]
                       + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh16[12]
                       + SH_C3[4] * x * (4 * zz - xx - yy) * sh16[13]
                       + SH_C3[5] * z * (xx - yy) * sh16[14]
                       + SH_C3[6] * x * (xx - 3 * yy) * sh16[15])
    return res


def get_rect(px, py, radius, grid_x, grid_y):
    rmin_x = min(grid_x, max(0, int((px - radius) / TILE)))
    rmin_y = min(grid_y, max(0, int((py - radius) / TILE)))
    rmax_x = min(grid_x, max(0, int((px + radius + TILE - 1.0) / TILE)))
    rmax_y = min(grid_y, max(0, int((py + radius + TILE - 1.0) / TILE)))
    return rmin_x, rmin_y, rmax_x, rmax_y


def preprocess(means, scales, rotations, opacities, shs, view, proj, campos,
               W, H, tan_fovx, tan_fovy, degree, scale_modifier=1.0):
    """Oracle of wp_preprocess (forward.py:189-382)."""
    n = means.shape[0]
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    out = {
        "radii": np.zeros(n, np.int32),
        "xy": np.zeros((n, 2), np.float32),
        "depth": np.zeros(n, np.float32),
        "cov3d": np.zeros((n, 6), np.float32),
        "rgb": np.zeros((n, 3), np.float32),
        "conic": np.zeros((n, 3), np.float32),
        "opacity": np.zeros(n, np.float32),
        "tiles": np.zeros(n, np.int32),
        "rect": np.zeros((n, 4), np.int32),
        "clamped": np.zeros((n, 3), np.float32),
    }
    for i in range(n):
        p = np.append(means[i], 1.0).astype(np.float32)
        p_view = p @ view
        if p_view[2] < 0.2:
            continue
        p_hom = p @ proj
        p_w = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * p_w
        # cov3d
        R = quat_to_rot(rotations[i])
        S = np.diag(scale_modifier * scales[i]).astype(np.float32)
        M = R @ S
        sig = M @ M.T
        cov3d = np.array([sig[0, 0], sig[0, 1], sig[0, 2],
                          sig[1, 1], sig[1, 2], sig[2, 2]], np.float32)
        out["cov3d"][i] = cov3d
        # cov2d
        t = p @ view
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        txtz, tytz = t[0] / t[2], t[1] / t[2]
        tx = min(limx, max(-limx, txtz)) * t[2]
        ty = min(limy, max(-limy, tytz)) * t[2]
        fx = W / (2.0 * tan_fovx)
        fy = H / (2.0 * tan_fovy)
        J = np.array([[fx / t[2], 0, -(fx * tx) / (t[2] * t[2])],
                      [0, fy / t[2], -(fy * ty) / (t[2] * t[2])],
                      [0, 0, 0]], np.float32)
        W3 = view[:3, :3]
        T = J @ W3
        V = np.array([[cov3d[0], cov3d[1], cov3d[2]],
                      [cov3d[1], cov3d[3], cov3d[4]],
                      [cov3d[2], cov3d[4], cov3d[5]]], np.float32)
        cov = T @ V.T @ T.T
        a, b, c = cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3
        det = a * c - b * b
        if det == 0.0:
            continue
        det_inv = 1.0 / det
        conic = np.array([c * det_inv, -b * det_inv, a * det_inv], np.float32)
        mid = 0.5 * (a + c)
        l1 = mid + np.sqrt(max(0.1, mid * mid - det))
        l2 = mid - np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(max(l1, l2)))
        px = ((p_proj[0] + 1) * W - 1) * 0.5
        py = ((p_proj[1] + 1) * H - 1) * 0.5
        rect = get_rect(px, py, radius, grid_x, grid_y)
        if (rect[2] - rect[0]) * (rect[3] - rect[1]) == 0:
            continue
        d = means[i] - campos
        d = d / np.linalg.norm(d)
        rgb = eval_sh_color(shs[i], d, degree) + 0.5
        out["clamped"][i] = (rgb < 0).astype(np.float32)
        rgb = np.maximum(rgb, 0.0)
        out["rgb"][i] = rgb
        out["depth"][i] = p_view[2]
        out["radii"][i] = int(radius)
        out["xy"][i] = (px, py)
        out["conic"][i] = conic
        out["opacity"][i] = opacities[i]
        out["tiles"][i] = (rect[3] - rect[1]) * (rect[2] - rect[0])
        out["rect"][i] = rect
    return out


def binning(prep, W, H):
    """Oracle of duplicate+sort+ranges (forward.py:517-586, 753-840)."""
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    entries = []  # (tile, depth_bits, order, gauss)
    order = 0
    for i in range(prep["radii"].shape[0]):
        if prep["radii"][i] <= 0:
            continue
        px, py = prep["xy"][i]
        rect = get_rect(px, py, float(prep["radii"][i]), grid_x, grid_y)
        depth_bits = np.float32(prep["depth"][i]).view(np.uint32)
        for y in range(rect[1], rect[3]):
            for x in range(rect[0], rect[2]):
                entries.append((y * grid_x + x, int(depth_bits), order, i))
                order += 1
    entries.sort()
    ranges = {}
    for idx, (tile, _, _, g) in enumerate(entries):
        if tile not in ranges:
            ranges[tile] = [idx, idx + 1]
        else:
            ranges[tile][1] = idx + 1
    point_list = [e[3] for e in entries]
    return point_list, ranges


def rasterize(prep, point_list, ranges, W, H, bg):
    """Oracle of wp_render_gaussians (forward.py:384-515)."""
    grid_x = (W + TILE - 1) // TILE
    image = np.zeros((H, W, 3), np.float32)
    depth_img = np.zeros((H, W), np.float32)
    final_t = np.ones((H, W), np.float32)
    n_contrib = np.zeros((H, W), np.int32)
    for py in range(H):
        for px in range(W):
            tile = (py // TILE) * grid_x + (px // TILE)
            rng = ranges.get(tile)
            T = 1.0
            rgb = np.zeros(3, np.float32)
            inv_d = 0.0
            count = 0
            last = 0
            if rng is not None:
                for idx in range(rng[0], rng[1]):
                    g = point_list[idx]
                    count += 1
                    dx = prep["xy"][g][0] - px
                    dy = prep["xy"][g][1] - py
                    con = prep["conic"][g]
                    power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
                    if power > 0.0:
                        continue
                    alpha = min(0.99, prep["opacity"][g] * np.exp(power))
                    if alpha < 1.0 / 255.0:
                        continue
                    test_t = T * (1 - alpha)
                    if test_t < 1e-4:
                        break
                    rgb += prep["rgb"][g] * alpha * T
                    inv_d += (1.0 / prep["depth"][g]) * alpha * T
                    T = test_t
                    last = count
            image[py, px] = rgb + T * np.asarray(bg)
            depth_img[py, px] = inv_d
            final_t[py, px] = T
            n_contrib[py, px] = last
    return image, depth_img, final_t, n_contrib


def render(means, scales, rotations, opacities, shs, view, proj, campos,
           W, H, tan_fovx, tan_fovy, degree, bg, scale_modifier=1.0):
    prep = preprocess(means, scales, rotations, opacities, shs, view, proj,
                      campos, W, H, tan_fovx, tan_fovy, degree, scale_modifier)
    point_list, ranges = binning(prep, W, H)
    image, depth_img, final_t, n_contrib = rasterize(
        prep, point_list, ranges, W, H, bg)
    return image, depth_img, {"prep": prep, "point_list": point_list,
                              "ranges": ranges, "final_t": final_t,
                              "n_contrib": n_contrib}


# ---------------------------------------------------------------------------
# Backward oracle (backward.py)
# ---------------------------------------------------------------------------

def rasterize_backward(prep, point_list, ranges, final_t, n_contrib,
                       W, H, bg, dL_dpix):
    """Oracle of wp_render_backward_kernel (backward.py:558-706)."""
    n = prep["radii"].shape[0]
    grid_x = (W + TILE - 1) // TILE
    d_color = np.zeros((n, 3), np.float32)
    d_mean2d = np.zeros((n, 2), np.float32)
    d_conic = np.zeros((n, 3), np.float32)  # (a, b, c) slots
    d_opac = np.zeros(n, np.float32)
    ddelx_dx = 0.5 * W
    ddely_dy = 0.5 * H
    for py in range(H):
        for px in range(W):
            tile = (py // TILE) * grid_x + (px // TILE)
            rng = ranges.get(tile)
            if rng is None:
                continue
            T_final = final_t[py, px]
            last_kept = min(rng[1], rng[0] + n_contrib[py, px])
            T = T_final
            accum = np.zeros(3, np.float32)
            last_alpha = 0.0
            last_color = np.zeros(3, np.float32)
            dpix = dL_dpix[py, px]
            bg_dot = float(np.dot(bg, dpix))
            for idx in range(last_kept - 1, rng[0] - 1, -1):
                g = point_list[idx]
                dx = prep["xy"][g][0] - px
                dy = prep["xy"][g][1] - py
                con = prep["conic"][g]
                power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
                if power > 0.0:
                    continue
                G = np.exp(power)
                alpha = min(0.99, prep["opacity"][g] * G)
                if alpha < 1.0 / 255.0:
                    continue
                T = T / (1 - alpha)
                accum = last_alpha * last_color + (1 - last_alpha) * accum
                color = prep["rgb"][g]
                dL_dalpha = float(np.dot(color - accum, dpix))
                d_color[g] += alpha * T * dpix
                dL_dalpha *= T
                last_alpha = alpha
                last_color = color
                dL_dalpha += (-T_final / (1 - alpha)) * bg_dot
                dL_dG = prep["opacity"][g] * dL_dalpha
                gdx, gdy = G * dx, G * dy
                dG_ddelx = -gdx * con[0] - gdy * con[1]
                dG_ddely = -gdy * con[2] - gdx * con[1]
                d_mean2d[g] += (dL_dG * dG_ddelx * ddelx_dx,
                                dL_dG * dG_ddely * ddely_dy)
                d_conic[g] += (-0.5 * gdx * dx * dL_dG,
                               -0.5 * gdx * dy * dL_dG,
                               -0.5 * gdy * dy * dL_dG)
                d_opac[g] += G * dL_dalpha
    return d_color, d_mean2d, d_conic, d_opac


def cov2d_backward(means, cov3d, radii, fx, fy, tan_fovx, tan_fovy, view,
                   dL_dconic):
    """Oracle of compute_cov2d_backward_kernel (backward.py:258-435)."""
    n = means.shape[0]
    dmeans = np.zeros((n, 3), np.float32)
    dcov3d = np.zeros((n, 6), np.float32)
    for i in range(n):
        if radii[i] <= 0:
            continue
        p = np.append(means[i], 1.0).astype(np.float32)
        t = p @ view
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        tz = t[2]
        inv_tz = 1.0 / tz
        txtz, tytz = t[0] * inv_tz, t[1] * inv_tz
        xmul = 0.0 if (txtz < -limx or txtz > limx) else 1.0
        ymul = 0.0 if (tytz < -limy or tytz > limy) else 1.0
        tx = min(limx, max(-limx, txtz)) * tz
        ty = min(limy, max(-limy, tytz)) * tz
        inv_tz2 = inv_tz * inv_tz
        inv_tz3 = inv_tz2 * inv_tz
        J00, J11 = fx * inv_tz, fy * inv_tz
        J02 = -fx * tx * inv_tz2
        J12 = -fy * ty * inv_tz2
        J = np.array([[J00, 0, J02], [0, J11, J12], [0, 0, 0]], np.float32).T
        W3 = view[:3, :3]
        T = W3 @ J
        c6 = cov3d[i]
        Vrk = np.array([[c6[0], c6[1], c6[2]], [c6[1], c6[3], c6[4]],
                        [c6[2], c6[4], c6[5]]], np.float32)
        cov2d = T.T @ Vrk.T @ T
        a = cov2d[0, 0] + 0.3
        b = cov2d[0, 1]
        c = cov2d[1, 1] + 0.3
        denom = a * c - b * b
        dca, dcb, dcc = dL_dconic[i]
        dL_da = dL_db = dL_dc = 0.0
        if denom != 0.0:
            d2 = 1.0 / (denom * denom + 1e-7)
            dL_da = d2 * (-c * c * dca + 2 * b * c * dcb + (denom - a * c) * dcc)
            dL_dc = d2 * (-a * a * dcc + 2 * a * b * dcb + (denom - a * c) * dca)
            dL_db = d2 * 2 * (b * c * dca - (denom + 2 * b * b) * dcb + a * b * dcc)
        dcov3d[i] = [
            T[0, 0] * T[0, 0] * dL_da + T[0, 0] * T[0, 1] * dL_db + T[0, 1] * T[0, 1] * dL_dc,
            2 * T[0, 0] * T[1, 0] * dL_da + (T[0, 0] * T[1, 1] + T[1, 0] * T[0, 1]) * dL_db + 2 * T[0, 1] * T[1, 1] * dL_dc,
            2 * T[0, 0] * T[2, 0] * dL_da + (T[0, 0] * T[2, 1] + T[2, 0] * T[0, 1]) * dL_db + 2 * T[0, 1] * T[2, 1] * dL_dc,
            T[1, 0] * T[1, 0] * dL_da + T[1, 0] * T[1, 1] * dL_db + T[1, 1] * T[1, 1] * dL_dc,
            2 * T[2, 0] * T[1, 0] * dL_da + (T[1, 0] * T[2, 1] + T[2, 0] * T[1, 1]) * dL_db + 2 * T[1, 1] * T[2, 1] * dL_dc,
            T[2, 0] * T[2, 0] * dL_da + T[2, 0] * T[2, 1] * dL_db + T[2, 1] * T[2, 1] * dL_dc,
        ]
        def dT(r0, r1, da, db):
            return (2 * (T[0, r0] * Vrk[0, r1] + T[1, r0] * Vrk[1, r1] + T[2, r0] * Vrk[2, r1]) * da
                    + (T[0, 1 - r0] * Vrk[0, r1] + T[1, 1 - r0] * Vrk[1, r1] + T[2, 1 - r0] * Vrk[2, r1]) * db)
        dT00 = dT(0, 0, dL_da, dL_db)
        dT01 = dT(0, 1, dL_da, dL_db)
        dT02 = dT(0, 2, dL_da, dL_db)
        dT10 = dT(1, 0, dL_dc, dL_db)
        dT11 = dT(1, 1, dL_dc, dL_db)
        dT12 = dT(1, 2, dL_dc, dL_db)
        dJ00 = W3[0, 0] * dT00 + W3[1, 0] * dT01 + W3[2, 0] * dT02
        dJ02 = W3[0, 2] * dT00 + W3[1, 2] * dT01 + W3[2, 2] * dT02
        dJ11 = W3[0, 1] * dT10 + W3[1, 1] * dT11 + W3[2, 1] * dT12
        dJ12 = W3[0, 2] * dT10 + W3[1, 2] * dT11 + W3[2, 2] * dT12
        dtx = -fx * inv_tz2 * dJ02
        dty = -fy * inv_tz2 * dJ12
        dtz = (-fx * inv_tz2 * dJ00 - fy * inv_tz2 * dJ11
               + 2 * fx * tx * inv_tz3 * dJ02 + 2 * fy * ty * inv_tz3 * dJ12)
        dt4 = np.array([dtx * xmul, dty * ymul, dtz, 1.0], np.float32)
        dmeans[i] = (dt4 @ view.T)[:3]
    return dmeans, dcov3d


def projection_backward(means, radii, proj, dL_dmean2d):
    """Oracle of compute_projection_backward_kernel (backward.py:708-768)."""
    n = means.shape[0]
    out = np.zeros((n, 3), np.float32)
    for i in range(n):
        if radii[i] <= 0:
            continue
        p = np.append(means[i], 1.0).astype(np.float32)
        m_hom = p @ proj
        m_w = 1.0 / (m_hom[3] + 1e-7)
        mul1 = m_hom[0] * m_w * m_w
        mul2 = m_hom[1] * m_w * m_w
        gx, gy = dL_dmean2d[i]
        for k in range(3):
            out[i, k] = ((proj[k, 0] * m_w - proj[k, 3] * mul1) * gx
                         + (proj[k, 1] * m_w - proj[k, 3] * mul2) * gy)
    return out


def sh_backward(means, shs, radii, campos, clamped, dL_dcolor, degree):
    """Oracle of sh_backward_kernel (backward.py:68-255)."""
    n = means.shape[0]
    dsh = np.zeros((n, 16, 3), np.float32)
    dmean = np.zeros((n, 3), np.float32)
    for i in range(n):
        if radii[i] <= 0:
            continue
        dir_orig = means[i] - campos
        L = np.linalg.norm(dir_orig)
        if L < 1e-8:
            continue
        d = dir_orig / L
        x, y, z = d
        dL_dRGB = dL_dcolor[i] * (1.0 - clamped[i])
        dRx = np.zeros(3, np.float32)
        dRy = np.zeros(3, np.float32)
        dRz = np.zeros(3, np.float32)
        dsh[i, 0] = SH_C0 * dL_dRGB
        if degree > 0:
            sh = shs[i]
            dsh[i, 1] = -SH_C1 * y * dL_dRGB
            dsh[i, 2] = SH_C1 * z * dL_dRGB
            dsh[i, 3] = -SH_C1 * x * dL_dRGB
            dRx = -SH_C1 * sh[3]
            dRy = -SH_C1 * sh[1]
            dRz = SH_C1 * sh[2]
            if degree > 1:
                xx, yy, zz = x * x, y * y, z * z
                xy, yz, xz = x * y, y * z, x * z
                dsh[i, 4] = SH_C2[0] * xy * dL_dRGB
                dsh[i, 5] = SH_C2[1] * yz * dL_dRGB
                dsh[i, 6] = SH_C2[2] * (2 * zz - xx - yy) * dL_dRGB
                dsh[i, 7] = SH_C2[3] * xz * dL_dRGB
                dsh[i, 8] = SH_C2[4] * (xx - yy) * dL_dRGB
                dRx = dRx + (SH_C2[0] * y * sh[4] + SH_C2[2] * 2 * -x * sh[6]
                             + SH_C2[3] * z * sh[7] + SH_C2[4] * 2 * x * sh[8])
                dRy = dRy + (SH_C2[0] * x * sh[4] + SH_C2[1] * z * sh[5]
                             + SH_C2[2] * 2 * -y * sh[6] + SH_C2[4] * 2 * -y * sh[8])
                dRz = dRz + (SH_C2[1] * y * sh[5] + SH_C2[2] * 4 * z * sh[6]
                             + SH_C2[3] * x * sh[7])
                if degree > 2:
                    dsh[i, 9] = SH_C3[0] * y * (3 * xx - yy) * dL_dRGB
                    dsh[i, 10] = SH_C3[1] * xy * z * dL_dRGB
                    dsh[i, 11] = SH_C3[2] * y * (4 * zz - xx - yy) * dL_dRGB
                    dsh[i, 12] = SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * dL_dRGB
                    dsh[i, 13] = SH_C3[4] * x * (4 * zz - xx - yy) * dL_dRGB
                    dsh[i, 14] = SH_C3[5] * z * (xx - yy) * dL_dRGB
                    dsh[i, 15] = SH_C3[6] * x * (xx - 3 * yy) * dL_dRGB
                    dRx = dRx + (SH_C3[0] * sh[9] * 6 * xy + SH_C3[1] * sh[10] * yz
                                 + SH_C3[2] * sh[11] * -2 * xy
                                 + SH_C3[3] * sh[12] * -6 * xz
                                 + SH_C3[4] * sh[13] * (-3 * xx + 4 * zz - yy)
                                 + SH_C3[5] * sh[14] * 2 * xz
                                 + SH_C3[6] * sh[15] * 3 * (xx - yy))
                    dRy = dRy + (SH_C3[0] * sh[9] * 3 * (xx - yy)
                                 + SH_C3[1] * sh[10] * xz
                                 + SH_C3[2] * sh[11] * (-3 * yy + 4 * zz - xx)
                                 + SH_C3[3] * sh[12] * -6 * yz
                                 + SH_C3[4] * sh[13] * -2 * xy
                                 + SH_C3[5] * sh[14] * -2 * yz
                                 + SH_C3[6] * sh[15] * -6 * xy)
                    dRz = dRz + (SH_C3[1] * sh[10] * xy + SH_C3[2] * sh[11] * 8 * yz
                                 + SH_C3[3] * sh[12] * 3 * (2 * zz - xx - yy)
                                 + SH_C3[4] * sh[13] * 8 * xz
                                 + SH_C3[5] * sh[14] * (xx - yy))
        dL_ddir = np.array([np.dot(dRx, dL_dRGB), np.dot(dRy, dL_dRGB),
                            np.dot(dRz, dL_dRGB)], np.float32)
        # dnormvdv (backward.py:42-64)
        v = dir_orig
        sum2 = float(np.dot(v, v))
        inv32 = 1.0 / np.sqrt(sum2 ** 3)
        vdv = float(np.dot(v, dL_ddir))
        dmean[i] = (sum2 * dL_ddir - v * vdv) * inv32
    return dsh, dmean


def cov3d_backward(scales, rotations, radii, scale_modifier, dL_dcov3d):
    """Oracle of compute_cov3d_backward_kernel (backward.py:438-556)."""
    n = scales.shape[0]
    dscale = np.zeros((n, 3), np.float32)
    drot = np.zeros((n, 4), np.float32)
    for i in range(n):
        if radii[i] <= 0:
            continue
        q = rotations[i]
        r, x, y, z = q[3], q[0], q[1], q[2]
        R = quat_to_rot(q)
        s = scale_modifier * scales[i]
        S = np.diag(s).astype(np.float32)
        M = S @ R
        d = dL_dcov3d[i]
        dSigma = np.array([[d[0], 0.5 * d[1], 0.5 * d[2]],
                           [0.5 * d[1], d[3], 0.5 * d[4]],
                           [0.5 * d[2], 0.5 * d[4], d[5]]], np.float32)
        dM = 2.0 * M @ dSigma
        Rt = R.T
        dMt = dM.T
        dscale[i] = [np.dot(Rt[0], dMt[0]), np.dot(Rt[1], dMt[1]),
                     np.dot(Rt[2], dMt[2])]
        dscale[i] *= scale_modifier
        m = dMt * s[:, None]
        dr = 2 * (z * (m[0, 1] - m[1, 0]) + y * (m[2, 0] - m[0, 2])
                  + x * (m[1, 2] - m[2, 1]))
        dx = (2 * (y * (m[1, 0] + m[0, 1]) + z * (m[2, 0] + m[0, 2])
                   + r * (m[1, 2] - m[2, 1])) - 4 * x * (m[2, 2] + m[1, 1]))
        dy = (2 * (x * (m[1, 0] + m[0, 1]) + r * (m[2, 0] - m[0, 2])
                   + z * (m[1, 2] + m[2, 1])) - 4 * y * (m[2, 2] + m[0, 0]))
        dz = (2 * (r * (m[0, 1] - m[1, 0]) + x * (m[2, 0] + m[0, 2])
                   + y * (m[1, 2] + m[2, 1])) - 4 * z * (m[1, 1] + m[0, 0]))
        drot[i] = [dx, dy, dz, dr]
    return dscale, drot


def backward(means, scales, rotations, opacities, shs, view, proj, campos,
             W, H, tan_fovx, tan_fovy, degree, bg, dL_dpix,
             scale_modifier=1.0):
    """Full backward oracle (backward.py:955-1196)."""
    prep = preprocess(means, scales, rotations, opacities, shs, view, proj,
                      campos, W, H, tan_fovx, tan_fovy, degree, scale_modifier)
    point_list, ranges = binning(prep, W, H)
    _, _, final_t, n_contrib = rasterize(prep, point_list, ranges, W, H, bg)
    d_color, d_mean2d, d_conic, d_opac = rasterize_backward(
        prep, point_list, ranges, final_t, n_contrib, W, H, bg, dL_dpix)
    fx = W / (2.0 * tan_fovx)
    fy = H / (2.0 * tan_fovy)
    dmean_cov, dcov3d = cov2d_backward(means, prep["cov3d"], prep["radii"],
                                       fx, fy, tan_fovx, tan_fovy, view, d_conic)
    dmean_proj = projection_backward(means, prep["radii"], proj, d_mean2d)
    dsh, dmean_sh = sh_backward(means, shs, prep["radii"], campos,
                                prep["clamped"], d_color, degree)
    dscale, drot = cov3d_backward(scales, rotations, prep["radii"],
                                  scale_modifier, dcov3d)
    return {
        "dL_dmean3D": dmean_cov + dmean_proj + dmean_sh,
        "dL_dcolor": d_color,
        "dL_dshs": dsh,
        "dL_dopacity": d_opac,
        "dL_dscale": dscale,
        "dL_drot": drot,
        "dL_dmean2D": d_mean2d,
        "dL_dconic": d_conic,
    }

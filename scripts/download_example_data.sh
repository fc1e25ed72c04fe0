#!/bin/sh
# NeRF example data fetcher — mirror of the reference's
# download_example_data.sh (reference repo root, 5 lines).  In the build
# container the Lego split is already mounted read-only at
# /root/reference/data/lego (zero egress), so this script is only needed on
# machines with network access; `scripts/make_tiny_nerf.py` generates an
# offline synthetic dataset for smoke tests.
set -e
wget http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz
mkdir -p data
cd data
wget http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/nerf_example_data.zip
unzip nerf_example_data.zip
cd ..

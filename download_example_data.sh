#!/usr/bin/env bash
# Fetch the NeRF-synthetic example scenes (lego etc.) into ./data/, the
# layout train.py expects (--dataset ./data/lego).  Analog of the
# reference's download_example_data.sh (reference: download_example_data.sh:1-5);
# same upstream archive.  In the air-gapped build container the dataset is
# pre-staged read-only at /root/reference/data — symlink it instead of
# downloading.
set -euo pipefail
mkdir -p data
if [ -d /root/reference/data/lego ] && [ ! -e data/lego ]; then
    ln -s /root/reference/data/lego data/lego
    echo "linked pre-staged lego dataset -> data/lego"
    exit 0
fi
cd data
wget http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/nerf_example_data.zip
unzip nerf_example_data.zip

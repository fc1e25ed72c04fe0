#!/usr/bin/env bash
# Round-4 TPU capture, priority-ordered for a tight wall clock:
# the must-have evidence (bench + 7k official training) runs FIRST, and
# artifacts land in the repo after EACH stage so a mid-run cutoff still
# leaves committed evidence.  Same stage/timeout shape as tpu_round4.sh.
#
# Usage: bash scripts/tpu_round4_run.sh [logdir]   (default /tmp/tpu_round4)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_round4}
mkdir -p "$LOGDIR" assets

FAILS=0
stage() {  # stage <name> <timeout-sec> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
        echo "    ok: $(tail -1 "$LOGDIR/$name.log" | head -c 200)"
    else
        echo "    FAILED rc=$? (see $LOGDIR/$name.log)"
        FAILS=$((FAILS + 1))
    fi
}

land() {  # copy whatever exists so far into assets/ (stages this script runs)
    for a in bench r4_kernels profile_full bench_trained \
             scaling_100k scaling_1000k; do
        [ -f "$LOGDIR/$a.log" ] && cp "$LOGDIR/$a.log" "assets/${a}_r4.log"
    done
    for run in /tmp/lego_official_7k /tmp/lego_official_15k /tmp/lego_l1_7k; do
        [ -f "$run/metrics.jsonl" ] && \
            cp "$run/metrics.jsonl" "assets/$(basename "$run")_metrics.jsonl"
    done
}

# 0. quick probe
if ! timeout 120 python -c "import jax; print(jax.devices())" \
        > "$LOGDIR/probe.log" 2>&1; then
    echo "TPU probe failed/hung — backend still down"; exit 1
fi
echo "TPU up: $(tail -1 "$LOGDIR/probe.log")"

# 1. headline bench (compiled-Pallas parity gate + vs_sol)
stage bench 1800 python bench.py
land

# 2. official 3DGS recipe on Lego, 7k — ONLY if the parity gate is green
if grep -q '"pallas_parity_ok": true' "$LOGDIR/bench.log"; then
    PARITY_OK=1
    stage train_7k 3600 python train.py --dataset /root/reference/data/lego \
        --output /tmp/lego_official_7k --pallas --activated \
        --lambda-dssim 0.2 --sh-warmup 1000 --iterations 7000
    PLY7=$(ls -t /tmp/lego_official_7k/point_cloud/*/point_cloud.ply \
           2>/dev/null | head -1)
    [ -n "$PLY7" ] && cp "$PLY7" assets/lego_trained.ply
    land
else
    PARITY_OK=0
    echo "=== SKIPPING trainings: parity gate not green ==="
fi

# 3. fitted stage decomposition of the current frame (VERDICT item 1)
stage profile_full 1500 python -m scripts.profile_stages --fitted
stage r4_kernels 1200 python -u scripts/r4_kernels.py
land

# 4. scaling proxy v3 (honesty flags per ADVICE r3) at bench scale + 1M
stage scaling_100k 2400 python scripts/scaling_proxy.py
stage scaling_1000k 2400 python scripts/scaling_proxy.py --n 1000000
land

# 5. reference-recipe (L1-only) 7k + the 15k official run, best effort
if [ "$PARITY_OK" = 1 ]; then
    stage train_7k_l1 3600 python train.py \
        --dataset /root/reference/data/lego \
        --output /tmp/lego_l1_7k --pallas --iterations 7000
    land
    stage train_15k 7200 python train.py --dataset /root/reference/data/lego \
        --output /tmp/lego_official_15k --pallas --activated \
        --lambda-dssim 0.2 --sh-warmup 1000 --iterations 15000
    land
fi

# 6. qualitative artifacts + trained-scene bench from the best point cloud
PLY=$(ls -t /tmp/lego_official_15k/point_cloud/*/point_cloud.ply 2>/dev/null \
      | head -1)
[ -z "$PLY" ] && PLY=$(ls -t /tmp/lego_official_7k/point_cloud/*/point_cloud.ply \
      2>/dev/null | head -1)
if [ -n "$PLY" ]; then
    stage turntable 1200 python -m scripts.render_turntable --ply "$PLY" \
        --out "$LOGDIR/turntable.gif"
    stage bench_trained 1800 python -m scripts.bench_suite --ply "$PLY"
fi
for run in /tmp/lego_official_15k /tmp/lego_official_7k; do
    if ls "$run"/render_*.png >/dev/null 2>&1; then
        stage train_gif 600 python -m scripts.make_train_gif --run "$run" \
            --out "$LOGDIR/train_progress.gif"
        break
    fi
done
for a in turntable.gif train_progress.gif; do
    [ -f "$LOGDIR/$a" ] && cp "$LOGDIR/$a" "assets/$a"
done
land

echo "=== done ($(date +%H:%M:%S)); logs in $LOGDIR; $FAILS stage(s) failed ==="
[ "$FAILS" -eq 0 ]

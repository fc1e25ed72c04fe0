#!/usr/bin/env bash
# Round-5 TPU capture, priority-ordered: must-have evidence first, artifacts
# land in the repo after EACH stage so a mid-run cutoff still leaves
# committed evidence.  Exits nonzero if any stage failed (ADVICE r4).
#
# Usage: bash scripts/tpu_round5_run.sh [logdir]   (default /tmp/tpu_round5)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_round5}
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

land() {  # copy whatever exists so far into assets/ (only stages run here)
    for a in bench profile_full scaling_100k scaling_1000k eval_15k; do
        [ -f "$LOGDIR/$a.log" ] && cp "$LOGDIR/$a.log" "assets/${a}_r5.log"
    done
    for run in /tmp/lego_official_15k /tmp/lego_l1_7k; do
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

# 1. headline bench (compiled-Pallas parity gate + vs_sol + trained scene)
stage bench 1800 python bench.py
land

# 2. official recipe 15k (skipped if the artifact already exists from the
#    interactive run) — ONLY if the parity gate is green
if grep -q '"pallas_parity_ok": true' "$LOGDIR/bench.log"; then
    if [ ! -f /tmp/lego_official_15k/metrics.jsonl ] || \
       ! grep -q '"event": "done"' /tmp/lego_official_15k/metrics.jsonl; then
        stage train_15k 7200 python train.py \
            --dataset /root/reference/data/lego \
            --output /tmp/lego_official_15k --pallas --activated \
            --lambda-dssim 0.2 --sh-warmup 1000 --iterations 15000
    fi
    land
    # 3. reference-recipe (L1-only) 7k
    if [ ! -f /tmp/lego_l1_7k/metrics.jsonl ] || \
       ! grep -q '"event": "done"' /tmp/lego_l1_7k/metrics.jsonl; then
        stage train_7k_l1 3600 python train.py \
            --dataset /root/reference/data/lego \
            --output /tmp/lego_l1_7k --pallas --iterations 7000
    fi
    land
else
    echo "=== SKIPPING trainings: parity gate not green ==="
    FAILS=$((FAILS + 1))
fi

# 4. scaling v3 with median-of-5 noise control (VERDICT r3 item 4)
stage scaling_100k 3000 python scripts/scaling_proxy.py --repeats 5
stage scaling_1000k 3000 python scripts/scaling_proxy.py --n 1000000 --repeats 3
land

# 5. fitted stage decomposition of the current frame
stage profile_full 1500 python -m scripts.profile_stages --fitted
land

# 6. qualitative artifacts + full-split eval from the best checkpoint
PLY=$(ls -t /tmp/lego_official_15k/point_cloud/*/point_cloud.ply 2>/dev/null \
      | head -1)
if [ -n "$PLY" ]; then
    stage turntable 1200 python -m scripts.render_turntable --ply "$PLY" \
        --out "$LOGDIR/turntable.gif"
    stage eval_15k 2400 python -m scripts.eval_model --ply "$PLY" \
        --dataset /root/reference/data/lego --split test
fi
if ls /tmp/lego_official_15k/render_*.png >/dev/null 2>&1; then
    stage train_gif 600 python -m scripts.make_train_gif \
        --run /tmp/lego_official_15k --out "$LOGDIR/train_progress.gif"
fi
for a in turntable.gif train_progress.gif; do
    [ -f "$LOGDIR/$a" ] && cp "$LOGDIR/$a" "assets/$a"
done
land

echo "=== done ($(date +%H:%M:%S)); logs in $LOGDIR; $FAILS stage(s) failed ==="
[ "$FAILS" -eq 0 ]

#!/usr/bin/env bash
# One-shot TPU capture for round 3: run every TPU-dependent yardstick in
# priority order, tolerating per-stage failure (the axon tunnel has had
# multi-hour outages — round 2's BENCH_r02 was lost to one).  Each stage
# logs to $LOGDIR/<stage>.log; a stage failure does not stop later stages.
#
# Usage: bash scripts/tpu_round3.sh [logdir]   (default /tmp/tpu_round3)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_round3}
mkdir -p "$LOGDIR"

stage() {  # stage <name> <timeout-sec> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
        echo "    ok: $(tail -1 "$LOGDIR/$name.log" | head -c 200)"
    else
        echo "    FAILED rc=$? (see $LOGDIR/$name.log)"
    fi
}

# 0. quick probe — if the backend is down, bail early
if ! timeout 120 python -c "import jax; print(jax.devices())" \
        > "$LOGDIR/probe.log" 2>&1; then
    echo "TPU probe failed/hung — backend still down"; exit 1
fi
echo "TPU up: $(cat "$LOGDIR/probe.log")"

# 1. headline bench (includes compiled-Pallas parity gate + vs_sol)
stage bench 2400 python bench.py

# 2. speed-of-light floor refresh
stage sol 1800 python scripts/sol_model.py

# 3. scaling proxy at 100k (SCALING.json) and 1M (SCALING_1000k.json),
#    plus per-stage decompositions of the full frame and the worst 8-way
#    band so the non-scaling terms are attributed, not guessed
stage scaling_100k 2400 python scripts/scaling_proxy.py
stage scaling_1000k 3000 python scripts/scaling_proxy.py --n 1000000
stage profile_full 1800 python -m scripts.profile_stages --fitted
stage profile_band8 1800 python -m scripts.profile_stages --fitted --band 8

# 4. official 3DGS recipe on Lego: 7k and 15k budgets
stage train_7k 4200 python train.py --dataset /root/reference/data/lego \
    --output /tmp/lego_official_7k --pallas --activated \
    --lambda-dssim 0.2 --sh-warmup 1000 --iterations 7000
stage train_15k 7200 python train.py --dataset /root/reference/data/lego \
    --output /tmp/lego_official_15k --pallas --activated \
    --lambda-dssim 0.2 --sh-warmup 1000 --iterations 15000

# 5. qualitative artifacts from the 15k (fall back to 7k) point cloud
PLY=$(ls -t /tmp/lego_official_15k/point_cloud/*/point_cloud.ply 2>/dev/null \
      | head -1)
[ -z "$PLY" ] && PLY=$(ls -t /tmp/lego_official_7k/point_cloud/*/point_cloud.ply \
      2>/dev/null | head -1)
if [ -n "$PLY" ]; then
    stage turntable 1200 python -m scripts.render_turntable --ply "$PLY" \
        --out "$LOGDIR/turntable.gif"
fi
for run in /tmp/lego_official_15k /tmp/lego_official_7k; do
    if ls "$run"/render_*.png >/dev/null 2>&1; then
        stage train_gif 600 python -m scripts.make_train_gif --run "$run" \
            --out "$LOGDIR/train_progress.gif"
        break
    fi
done

# 6. trainer-vs-bench throughput check (VERDICT r2 item 3 "done" criterion):
#    median trained step_ms from the 7k run's metrics.jsonl beside bench.py's
#    per-frame number, with the pair counts that contextualize them
stage step_vs_bench 120 python - "$LOGDIR" <<'PY'
import json, statistics, sys
logdir = sys.argv[1]
steps, pairs = [], []
for line in open("/tmp/lego_official_7k/metrics.jsonl"):
    r = json.loads(line)
    if "step_ms" in r:
        steps.append((r["iteration"], r["step_ms"]))
    if r.get("event") in ("pair_capacity_grow", "pair_capacity_shrink"):
        pairs.append((r["iteration"], r["capacity"]))
# step_ms is logged every 50 iterations: a run that died early may have
# event records but no step records — still emit what we have
tail = [ms for it, ms in steps if it >= steps[-1][0] // 2] if steps else []
out = {"median_step_ms_last_half":
       round(statistics.median(tail), 2) if tail else None,
       "n_step_records": len(steps),
       "final_pair_capacity": pairs[-1][1] if pairs else None,
       "note": "compare against bench.py per-frame ms at similar pairs"}
json.dump(out, open(f"{logdir}/step_vs_bench.json", "w"), indent=1)
print(out)
PY

# 7. land the qualitative + quantitative artifacts in the repo so the
#    driver's end-of-round commit captures them even if no session is live
#    (SOL.json / SCALING*.json already write to the repo root)
mkdir -p assets
for a in turntable.gif train_progress.gif step_vs_bench.json; do
    [ -f "$LOGDIR/$a" ] && cp "$LOGDIR/$a" "assets/$a"
done
for run in /tmp/lego_official_7k /tmp/lego_official_15k; do
    if [ -f "$run/metrics.jsonl" ]; then
        cp "$run/metrics.jsonl" "assets/$(basename "$run")_metrics.jsonl"
    fi
done

echo "=== done ($(date +%H:%M:%S)); logs in $LOGDIR ==="

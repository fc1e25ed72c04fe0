#!/usr/bin/env bash
# One-shot TPU capture for round 4 (same outage-tolerant shape as round 3:
# per-stage logs + timeouts, later stages survive earlier failures).
#
# Round-4 additions vs tpu_round3.sh:
#   - kernel/epilogue isolation profilers (r4_kernels / r4_micro) and the
#     fitted stage decomposition land as committed artifacts (VERDICT r4
#     item 1 "decomposition artifact committed");
#   - the official-recipe trainings are GATED on the bench parity check
#     (pallas_parity_ok) so a Mosaic regression cannot burn hours training
#     garbage;
#   - trained-scene bench extra (VERDICT item 7) comes from bench_suite
#     against the freshly trained point cloud.
#
# Usage: bash scripts/tpu_round4.sh [logdir]   (default /tmp/tpu_round4)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_round4}
mkdir -p "$LOGDIR" assets

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

# 2. round-4 kernel isolation + micro decompositions (committed artifacts)
stage r4_kernels 1800 python -u scripts/r4_kernels.py
stage r4_micro 1800 python -u scripts/r4_micro.py

# 3. speed-of-light floor refresh + fitted stage decomposition
stage sol 1800 python scripts/sol_model.py
stage profile_full 1800 python -m scripts.profile_stages --fitted
stage profile_band8 1800 python -m scripts.profile_stages --fitted --band 8

# 4. scaling proxy v3 (clamp/floor flags per ADVICE r3) at 100k and 1M
stage scaling_100k 2400 python scripts/scaling_proxy.py
stage scaling_1000k 3000 python scripts/scaling_proxy.py --n 1000000

# 5. official 3DGS recipe on Lego — ONLY if the parity gate was green
if grep -q '"pallas_parity_ok": true' "$LOGDIR/bench.log"; then
    stage train_7k 4200 python train.py --dataset /root/reference/data/lego \
        --output /tmp/lego_official_7k --pallas --activated \
        --lambda-dssim 0.2 --sh-warmup 1000 --iterations 7000
    stage train_15k 7800 python train.py --dataset /root/reference/data/lego \
        --output /tmp/lego_official_15k --pallas --activated \
        --lambda-dssim 0.2 --sh-warmup 1000 --iterations 15000
    stage train_7k_l1 4200 python train.py \
        --dataset /root/reference/data/lego \
        --output /tmp/lego_l1_7k --pallas --iterations 7000
else
    echo "=== SKIPPING trainings: parity gate not green in bench.log ==="
fi

# 6. qualitative artifacts from the 15k (fall back to 7k) point cloud
PLY=$(ls -t /tmp/lego_official_15k/point_cloud/*/point_cloud.ply 2>/dev/null \
      | head -1)
[ -z "$PLY" ] && PLY=$(ls -t /tmp/lego_official_7k/point_cloud/*/point_cloud.ply \
      2>/dev/null | head -1)
if [ -n "$PLY" ]; then
    stage turntable 1200 python -m scripts.render_turntable --ply "$PLY" \
        --out "$LOGDIR/turntable.gif"
    # trained-scene headline companion (VERDICT r4 item 7)
    stage bench_trained 2400 python -m scripts.bench_suite --ply "$PLY"
fi
for run in /tmp/lego_official_15k /tmp/lego_official_7k; do
    if ls "$run"/render_*.png >/dev/null 2>&1; then
        stage train_gif 600 python -m scripts.make_train_gif --run "$run" \
            --out "$LOGDIR/train_progress.gif"
        break
    fi
done

# 7. trainer-vs-bench throughput: median trained step_ms beside bench.py's
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
tail = [ms for it, ms in steps if it >= steps[-1][0] // 2] if steps else []
out = {"median_step_ms_last_half":
       round(statistics.median(tail), 2) if tail else None,
       "n_step_records": len(steps),
       "final_pair_capacity": pairs[-1][1] if pairs else None,
       "note": "compare against bench.py per-frame ms at similar pairs"}
json.dump(out, open(f"{logdir}/step_vs_bench.json", "w"), indent=1)
print(out)
PY

# 8. land artifacts in the repo so the round commit captures them.
# The 7k point cloud becomes the committed trained-scene bench input
# (bench.py extra.trained_scene_ms finds assets/lego_trained.ply).
PLY7=$(ls -t /tmp/lego_official_7k/point_cloud/*/point_cloud.ply 2>/dev/null \
       | head -1)
[ -n "$PLY7" ] && cp "$PLY7" assets/lego_trained.ply
for a in turntable.gif train_progress.gif step_vs_bench.json; do
    [ -f "$LOGDIR/$a" ] && cp "$LOGDIR/$a" "assets/$a"
done
for a in bench r4_kernels r4_micro profile_full profile_band8 bench_trained; do
    [ -f "$LOGDIR/$a.log" ] && cp "$LOGDIR/$a.log" "assets/${a}_r4.log"
done
for run in /tmp/lego_official_7k /tmp/lego_official_15k /tmp/lego_l1_7k; do
    if [ -f "$run/metrics.jsonl" ]; then
        cp "$run/metrics.jsonl" "assets/$(basename "$run")_metrics.jsonl"
    fi
done

echo "=== done ($(date +%H:%M:%S)); logs in $LOGDIR ==="

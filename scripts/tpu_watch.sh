#!/usr/bin/env bash
# Watch for the axon TPU backend to come back; when it does, wait for any
# CPU-heavy jobs (pytest / compare_ref_training) to drain — the host has
# ONE CPU and concurrent runs corrupt TPU timings — then fire the round-4
# capture (scripts/tpu_round4.sh).  Runs until the capture has happened.
set -u
cd "$(dirname "$0")/.."
MARK=/tmp/tpu_round4_done
while true; do
    if [ -e "$MARK" ]; then exit 0; fi
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "$(date) TPU UP" >> /tmp/tpu_watch.log
        # drain CPU jobs (checked by full command line of OTHER processes)
        for _ in $(seq 1 240); do
            busy=$(ps -eo args | grep -E "pytest|compare_ref_training" \
                   | grep -cv grep || true)
            [ "$busy" -eq 0 ] && break
            sleep 30
        done
        bash scripts/tpu_round4.sh /tmp/tpu_round4 \
            > /tmp/tpu_round4_run.log 2>&1
        touch "$MARK"
        echo "$(date) capture finished" >> /tmp/tpu_watch.log
        exit 0
    fi
    echo "$(date) tpu down" >> /tmp/tpu_watch.log
    sleep 240
done

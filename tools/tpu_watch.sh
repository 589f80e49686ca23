#!/bin/bash
# Probe the TPU tunnel until it answers, then run the queued task
# (default: the bench_gate regression check).  Usage: tpu_watch.sh [task...]
# Probe = subprocess jax init + tiny matmul + fetch (CLAUDE.md outage rule:
# import jax can block ~30 min uninterruptible when the tunnel is down, so
# always probe under timeout in a child process).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
TASK=${@:-bench_gate}
PROBE='import jax, jax.numpy as jnp; x=jnp.ones((256,256),jnp.bfloat16); print("TPU_OK", float((x@x).sum()), jax.devices())'
while true; do
    if timeout 120 python -c "$PROBE" 2>/dev/null | grep -q TPU_OK; then
        echo "[tpu_watch] tunnel UP at $(date)"
        break
    fi
    echo "[tpu_watch] tunnel down at $(date); retry in 300s"
    sleep 300
done
echo "[tpu_watch] running: $TASK"
set -o pipefail  # report run.sh's exit code, not tee's
./run.sh $TASK 2>&1 | tee /tmp/tpu_watch_task.log
rc=$?
echo "[tpu_watch] $TASK DONE rc=$rc at $(date)"
exit $rc

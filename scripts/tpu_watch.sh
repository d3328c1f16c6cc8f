#!/bin/bash
# Poll for the axon TPU tunnel; when it is up, drain the dynamic queue
# .tpu_queue/queue.d/*.sh in lexical order (each entry is a small shell
# script run with bash).  An entry runs ONCE: after an attempt its name
# is recorded in .tpu_queue/done/ with the rc.  New entries can be added
# at any time — the watcher keeps polling forever, so gates written
# mid-round run as soon as (a) they exist and (b) the tunnel is up.
#
# Logs land in .tpu_queue/<name>.log; status lines in .tpu_queue/status.
set -u
Q=/root/repo/.tpu_queue
mkdir -p "$Q/queue.d" "$Q/done"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform not in ("cpu",), ds
EOF
}

up=0
while true; do
  if ! probe; then
    up=0
    echo "$(date -Is) tunnel down" >>"$Q/status"
    sleep 300
    continue
  fi
  if [ "$up" = 0 ]; then
    echo "$(date -Is) tunnel UP" >>"$Q/status"
    up=1
  fi
  # Never contend with a driver-launched bench for the single chip:
  # concurrent TPU runs poison both runs' timing (and can wedge the
  # tunnel).  pgrep is detection only — nothing is killed.
  if pgrep -f "python.*bench\.py" >/dev/null 2>&1; then
    echo "$(date -Is) external bench.py running; deferring queue" >>"$Q/status"
    sleep 120
    continue
  fi
  ran=0
  for f in "$Q"/queue.d/*.sh; do
    [ -e "$f" ] || continue
    name=$(basename "$f" .sh)
    [ -e "$Q/done/$name" ] && continue
    echo "$(date -Is) start $name" >>"$Q/status"
    # Advertise the running entry: bench.py's supervisor waits for this
    # file to clear (unless the bench IS the entry, flagged via env) so
    # the driver's round-end bench never contends with a mid-flight gate.
    echo "$name $$" >"$Q/RUNNING"
    TPU_QUEUE_ENTRY=1 timeout 5400 bash "$f" >"$Q/$name.log" 2>&1
    rc=$?
    rm -f "$Q/RUNNING"
    echo "rc=$rc $(date -Is)" >"$Q/done/$name"
    echo "$(date -Is) done $name rc=$rc" >>"$Q/status"
    ran=1
    break  # re-probe between entries (tunnel may drop mid-queue)
  done
  [ "$ran" = 0 ] && sleep 60
done

#!/bin/bash
# Poll for the axon TPU tunnel; when it comes back, run the queued
# round-2 TPU experiments (correctness gates first, then the hash_rows
# A/B).  Logs land in /root/repo/.tpu_queue/.  The script exits when the
# queue is done, so a background launcher gets a completion event.
#
# Queue (from the round-2 finale): the fused-brute emit sub-blocking
# (BruteParams.hash_rows) landed trace-checked but UNMEASURED because the
# tunnel went down; gate it bit-exact, then A/B eth + rmd160.
set -u
LOG=/root/repo/.tpu_queue
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform not in ("cpu",), ds
EOF
}

while ! probe; do
  echo "$(date -Is) tunnel down" >>"$LOG/status"
  sleep 300
done
echo "$(date -Is) tunnel UP - running queue" >>"$LOG/status"

run() {
  name=$1; shift
  echo "$(date -Is) start $name" >>"$LOG/status"
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  rc=$?  # capture BEFORE the next command substitution resets $?
  echo "$(date -Is) done $name rc=$rc" >>"$LOG/status"
}

# (the default check_pbrute run already includes the bucketed gate —
# ONLY='all'; no separate buckets entry, the tunnel window is precious)
run check_pbrute        python scripts/check_pbrute.py
run check_pbrute_extras python scripts/check_pbrute.py extras
run validate_pwalk      python scripts/validate_pwalk.py
run check_sbrute        python scripts/check_sbrute.py
CHECK_HASH_ROWS=8 run check_pbrute_hr8 python scripts/check_pbrute.py
run exp_hash_rows       python scripts/exp_hash_rows.py eth rmd160
run exp_buckets         python scripts/exp_buckets.py
# warm the compile caches + sanity the headline so the driver's
# round-end bench run starts hot (first compiles are ~minutes each)
BENCH_DEADLINE=5400 run bench_warm python bench.py
echo "$(date -Is) queue complete" >>"$LOG/status"

#!/bin/bash
# Mirror device-gate evidence from the gitignored .tpu_queue/ into the
# tracked docs/gates/ directory and commit it, so gate logs survive even
# if no interactive session is alive when the watcher drains the queue.
#
# Runs forever; cheap (one stat pass per minute).  Commits touch ONLY
# docs/gates/ and retry on index-lock contention with other committers.
set -u
Q=/root/repo/.tpu_queue
G=/root/repo/docs/gates
mkdir -p "$G"
cd /root/repo

while true; do
  changed=0
  for d in "$Q"/done/*; do
    [ -e "$d" ] || continue
    name=$(basename "$d")
    log="$Q/$name.log"
    # copy once per completed entry (done marker is written after the log)
    if [ ! -e "$G/$name.log" ] || ! cmp -s "$d" "$G/$name.rc" 2>/dev/null; then
      [ -e "$log" ] && cp "$log" "$G/$name.log"
      cp "$d" "$G/$name.rc"
      changed=1
    fi
  done
  if [ -e "$Q/status" ] && ! cmp -s "$Q/status" "$G/status.log" 2>/dev/null; then
    # status is appended every poll; only sync it when a gate also ran
    # (avoid committing "tunnel down" heartbeats), except sync at most
    # hourly so the up/down history is preserved.
    now=$(date +%s)
    last=$(stat -c %Y "$G/status.log" 2>/dev/null || echo 0)
    if [ "$changed" = 1 ] || [ $((now - last)) -ge 3600 ]; then
      cp "$Q/status" "$G/status.log"
      [ "$changed" = 1 ] || changed=2  # status-only refresh: no commit
    fi
  fi
  if [ "$changed" = 1 ]; then
    for attempt in 1 2 3 4 5; do
      git add docs/gates >/dev/null 2>&1 \
        && git commit -q \
             -m "Record device gate logs from the TPU queue" \
             -m "No-Verification-Needed: log-only evidence record" \
             -- docs/gates \
        && break
      sleep $((attempt * 7))
    done
  fi
  sleep 60
done

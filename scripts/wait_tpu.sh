#!/bin/bash
# Block until the axon TPU tunnel answers (it can die mid-session —
# jax.devices() then hangs forever; see BASELINE.md benchmark caveats and
# .claude/skills/verify/SKILL.md).  Probes every ~4 min; exits 0 the
# moment a device enumerates, 1 after ~4 h of failures.
for i in $(seq 1 60); do
  if timeout 60 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TPU reachable at $(date -Is)"
    exit 0
  fi
  echo "probe $i: tunnel unreachable at $(date -Is)" >&2
  sleep 240
done
exit 1

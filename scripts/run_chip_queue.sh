#!/bin/bash
# Round-5 serialized chip queue: the box has ONE remote TPU chip, so every
# hardware measurement runs through this script one at a time.  Each step
# logs to /tmp/r5_<name>.log and the queue continues past failures (a
# failed step must not starve the rest of the round's evidence).
# Ordered by evidence value (VERDICT r4 items 2,3,4,5,7): the flagship
# headline and gate first, then the two missing evidence artifacts, the
# high-churn flagship, the SDF fast-path proof, the mesh(1) re-measure,
# then the rest of the scene matrix and the optional precision A/B.
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== [$name] start $(date +%H:%M:%S)" | tee -a /tmp/r5_queue.log
  timeout "${QUEUE_TIMEOUT:-3000}" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== [$name] exit=$? $(date +%H:%M:%S)" | tee -a /tmp/r5_queue.log
}

run flagship   python bench.py                      # VALIDATE gate + 25M headline
run soak       python scripts/soak_precision.py     # SOAK_PRECISION.json (shipping defaults)
run k4         python scripts/prof_k4.py            # K4_JUSTIFY.json
run dambreak12m python bench.py --scene=dambreak12m
run dambreak_sdf python bench.py --scene=dambreak_sdf
QUEUE_TIMEOUT=5000 run multichip  python scripts/prof_multichip.py --config5shard
run dambreak_hs python bench.py --scene=dambreak_hs
run dambreak   python bench.py --scene=dambreak
run sand       python bench.py --scene=sand
run nacc       python bench.py --scene=nacc
run multimat   python bench.py --scene=multimat
run cube       python bench.py --scene=cube
# A/B: 1-pass P2G dot (mxu default; exact-mass side dot is independent).
# The soak's bf16_default row already bounds its physics; if this wins
# big, flip the default and re-run gate + flagship.
run flagship_p2g1 python bench.py --precision=default
echo "=== queue done $(date +%H:%M:%S)" | tee -a /tmp/r5_queue.log

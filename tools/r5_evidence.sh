#!/bin/bash
# Round-5 evidence runner: once tools/babysit_struct.sh finishes the big
# struct training (checkpoints/struct_big.json + /tmp weights), run the
# full hardware matrix sequentially — ONE TPU process at a time, each step
# tunnel-probed first, failures logged but non-blocking. Logs in /tmp/r5/.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p /tmp/r5
BLOG=/tmp/r5/runner.log
blog() { echo "[r5 $(date +%H:%M:%S)] $*" >> "$BLOG"; }

probe_ok() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((4,4)).sum()))" >/dev/null 2>&1
}

# wait for training to finish (babysitter exits on success)
while [ ! -f "$REPO/checkpoints/struct_big.json" ] \
      || [ ! -f /tmp/struct_base_big.npz ]; do
  blog "waiting for struct_big training..."
  sleep 180
done
blog "struct_big artifacts present — starting evidence matrix"

step() {
  local name=$1; shift
  until probe_ok; do blog "$name: tunnel down, waiting"; sleep 150; done
  blog "START $name: $*"
  (cd "$REPO" && env "$@" > "/tmp/r5/$name.log" 2>&1)
  blog "END $name rc=$?"
}

# 1. full serving matrix on the trained struct base (r4 verdict #1 + #3)
step suite_struct SUITE_MODEL=struct python tools/bench_suite.py

# 2. tree-shape sweep (depth x tau x total) x T{0,1} on the struct base
step sweep_struct python tools/struct_sweep.py

# 3. 13B longgen + stream, right-sized (r4 verdict #5 / r3 #5)
step suite_13b SUITE_MODEL=13b SUITE_BATCH=2 SUITE_MODES=longgen,stream \
     SUITE_LONG_TOKENS=1024 SUITE_LONG_MSEQ=1408 python tools/bench_suite.py

# 4. serve-dispatch budget profile on the struct base (r4 verdict #9)
step profile_serve PROFILE_MODEL=struct python tools/profile_serve.py

# 5. headline bench rows on the struct base (greedy + T=1)
step bench_struct BENCH_MODEL=struct python bench.py
step bench_struct_t1 BENCH_MODEL=struct BENCH_TEMP=1 python bench.py

blog "ALL DONE"

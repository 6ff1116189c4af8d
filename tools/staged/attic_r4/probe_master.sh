#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/tmp/rtk_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
# wait for all earlier chains to be gone
for pid in /tmp/probe_r2b.pid /tmp/probe_r2c.pid /tmp/probe_r2d.pid /tmp/probe_r2e.pid; do
  while kill -0 $(cat $pid 2>/dev/null) 2>/dev/null; do sleep 60; done
done
# wait for tunnel, indefinitely
while true; do
  timeout 90 python -c "
import jax
(jax.numpy.ones((128,128)) @ jax.numpy.ones((128,128))).block_until_ready()
" >/dev/null 2>&1 && { echo "[master] TPU back $(date)"; break; }
  echo "[master] down $(date)"
  sleep 90
done
run_if_missing() {  # $1 tag, $2 script, $3 grep-marker of success
  if ! grep -q "$3" /tmp/probe_r2*.out 2>/dev/null && ! grep -q "$3" /tmp/probe_master.out 2>/dev/null; then
    echo "=== [master] $1 ==="
    timeout 3600 python "$2" 2>&1
  else
    echo "=== [master] $1 already done ==="
  fi
}
run_if_missing grid_caps /tmp/grid_caps.py "shrink-caps:"
run_if_missing sah_67m /tmp/sah_67m.py "sah:"
run_if_missing leaf4 /tmp/leaf4_67m.py "sah-k4"
run_if_missing inst /tmp/inst_only.py "4-bounce wavefront:"
run_if_missing sahvar /tmp/sah_variants.py "sah dual ordered"
run_if_missing ppkt /tmp/ppkt_67m.py "P=4 pkt=2048"
run_if_missing anyhit /tmp/anyhit_diag.py "any dual:"
run_if_missing prefetch /tmp/prefetch_tpu.py "DONE prefetch-dma"
run_if_missing aot /tmp/aot_tpu.py "DONE aot-tpu"
if ! grep -q '"metric"' /tmp/probe_r2c.out 2>/dev/null; then
  echo "=== [master] bench ==="
  timeout 5400 python bench.py 2>&1
fi
echo "=== master done ==="

#!/usr/bin/env bash
# CI entry point (mirrors the reference's .github/workflows/ci.yaml:14-27:
# build + lint + test; here: native build, unit suite, bench smoke).
set -euo pipefail
cd "$(dirname "$0")"

echo "== native build =="
make -C native

echo "== unit tests (8 virtual CPU devices) =="
python -m pytest tests/ -x -q

echo "== bench smoke (tiny frame, CPU ok) =="
python bench.py --smoke

echo "== graft entry + 8-device dryrun (virtual CPU mesh) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn)(*args)
g.dryrun_multichip(8)
print("entry + dryrun ok")
PY

echo "CI OK"

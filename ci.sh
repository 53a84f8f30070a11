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

echo "CI OK"

#!/bin/bash
# Single-command build-and-test flow, mirroring the reference CI
# (.github/workflows/cmake-single-platform.yml: configure -> build -> ctest).
set -euo pipefail
cd "$(dirname "$0")"

echo "== build native extension =="
python -m simplemath_tpu.native.build || echo "native build skipped (toolchain unavailable)"

echo "== unit + distributed tests (CPU backend, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== quick benchmark smoke =="
python bench.py --quick

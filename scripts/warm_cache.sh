#!/usr/bin/env bash
# Prime the persistent XLA compile caches so subsequent test/bench runs hit
# their documented warm-cache times (STATUS.md). The suite and bench both
# point JAX_COMPILATION_CACHE_DIR at /tmp — after a machine wipe or cache
# eviction the FIRST run pays every compile over the tunneled chip:
#   fast tier cold ~7:30, warm ~3:15;  bench.py cold ~15 min, warm ~2 min.
#
# Usage: scripts/warm_cache.sh [fast|bench|all]   (default: all)
set -euo pipefail
cd "$(dirname "$0")/.."

what="${1:-all}"

if [[ "$what" == "fast" || "$what" == "all" ]]; then
  echo "== warming fast-tier compile cache (/tmp/jax_test_cache)"
  python -m pytest tests/ -q -m "not slow" -p no:cacheprovider -x
fi

if [[ "$what" == "bench" || "$what" == "all" ]]; then
  echo "== warming bench compile cache (/tmp/jax_bench_cache)"
  PYTHONPATH="$PWD:${PYTHONPATH:-}" python bench.py
fi

echo "caches warm"

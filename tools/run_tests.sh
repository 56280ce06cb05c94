#!/usr/bin/env bash
# Run the test suite in sequential per-chunk processes.
#
# Why not one `pytest tests/`? Two reasons on this host:
#  - the suite is XLA-compile-dominated on a single core, and a long-lived
#    process accumulates hundreds of compiled CPU executables; XLA's CPU
#    compiler has been observed to segfault non-deterministically deep into
#    such a process (the same test passes in isolation);
#  - chunked processes bound each run well under external timeout budgets.
#
# Usage:
#   tools/run_tests.sh            # fast subset (default pytest selection)
#   tools/run_tests.sh -m ""      # everything, incl. slow-marked tests
set -u
cd "$(dirname "$0")/.."

# The CPU suite must be immune to TPU-tunnel outages: the ambient
# PYTHONPATH injects a sitecustomize that hooks jax's backend lookup and
# BLOCKS every jax call (even CPU-pinned ones) while the tunnel is down.
# The suite forces the CPU platform anyway (tests/conftest.py), so drop the
# hook unless the run explicitly targets the real chip.
if [ -z "${IEF_TEST_TPU:-}" ]; then
  export PYTHONPATH=""
fi

chunks=(
  "tests/test_scheduler.py tests/test_seq_aligner.py tests/test_tokenizer.py tests/test_controls.py tests/test_models.py"
  "tests/test_flash_attention.py tests/test_flash_grad.py tests/test_ring_attention.py tests/test_parallel.py"
  "tests/test_pipeline.py tests/test_bf16.py"
  "tests/test_xl_pipeline.py tests/test_batched.py"
  "tests/test_cli.py tests/test_sweep.py tests/test_serve.py"
  "tests/test_loader.py tests/test_convert_ldm.py tests/test_registry.py tests/test_native.py"
)
# any test file not named above still runs, in a final catch-all chunk
listed=$(echo "${chunks[@]}" | tr ' ' '\n' | sort)
all=$(ls tests/test_*.py | sort)
rest=$(comm -23 <(echo "$all") <(echo "$listed") | tr '\n' ' ')
if [ -n "${rest// /}" ]; then
  chunks+=("$rest")
fi

fail=0
for c in "${chunks[@]}"; do
  echo "=== pytest $c $* ==="
  # shellcheck disable=SC2086
  python -m pytest $c -q "$@" || { fail=$?; break; }
done

# The batched==serial equivalence suite is slow-marked, so a default run
# never sees the flagship beyond-reference claim. Always finish with one
# representative equivalence test (~40 s) so the fast subset covers it.
if [ $fail -eq 0 ] && [ $# -eq 0 ]; then
  echo "=== pytest equivalence representative ==="
  python -m pytest "tests/test_batched.py::test_batched_p2p_matches_per_image" \
    -q -m "" || fail=$?
fi
exit $fail

#!/usr/bin/env bash
# Reproducibly-green suite invocation.
#
# Why multiple pytest processes: XLA:CPU aborts/segfaults when compiling
# its ~150th program into one long-lived process (the known long-process
# failure documented in tests/conftest.py — same tests pass in isolation).
# Splitting the suite keeps each process under the cliff; the split is by
# file and deterministic. The two loop-closure e2e classes are the
# heaviest program producers (two full-stack orbit runs) and get their
# own process.
set -e
cd "$(dirname "$0")/.."

H1="tests/test_ba_dense.py tests/test_collab.py tests/test_compact.py \
tests/test_descriptors.py tests/test_frontend_ops.py tests/test_geometry.py \
tests/test_init_reloc.py tests/test_loop.py tests/test_optim.py \
tests/test_parallel.py tests/test_place.py"

H3="tests/test_pipeline.py tests/test_pose_graph.py \
tests/test_rectify.py tests/test_shm_transport.py tests/test_solvers.py \
tests/test_stream.py tests/test_structured_world.py tests/test_system.py \
tests/test_transport.py tests/test_viz.py"

python -m pytest $H1 -q "$@"
python -m pytest tests/test_loop_e2e.py -q -k TestLoopClosureEndToEnd "$@"
python -m pytest tests/test_loop_e2e.py -q -k TestMultiLoopEndToEnd "$@"
python -m pytest tests/test_loop_e2e.py -q -k TestMonoLoopEndToEnd "$@"
python -m pytest $H3 -q "$@"
echo "SUITE GREEN (all five parts)"

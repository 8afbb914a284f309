#!/bin/bash
# Test runner: CPU-only JAX with an 8-device virtual mesh.
#
# This container bakes JAX_PLATFORMS=axon plus a sitecustomize that dials the
# TPU tunnel from EVERY python process (slow, and serialized across
# processes). Unsetting PALLAS_AXON_POOL_IPS skips that registration so tests
# start in ~2s and can run concurrently with TPU benchmarks.
cd "$(dirname "$0")"
if [ $# -eq 0 ]; then
    set -- tests/ -x -q
fi
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp \
    python -m pytest "$@"

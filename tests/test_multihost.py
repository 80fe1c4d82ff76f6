"""Multi-host (DCN) dryrun: the generation program sharded across
PROCESSES, not just devices — jax.distributed wires 2 controller processes
(2 virtual CPU devices each) into one global mesh; the child processes
assert shard-level determinism and cross-host agreement
(dreamlab_tpu/parallel/multihost.py). SURVEY §2.5: the reference has no
distributed backend at all; this is the last parallelism axis."""

from dreamlab_tpu.parallel.multihost import dryrun_multihost, dryrun_router


def test_dryrun_multihost_two_processes():
    dryrun_multihost(2, local_devices=2, timeout=300)


def test_router_serves_generate_across_processes():
    """The multi-host serving router (round 4): process 0 runs the real
    aiohttp stack over a RouterPipeline, broadcasts each accepted request to
    the follower controller, both execute the same SPMD program over the
    global mesh, image shards gather back, and the HTTP responses are
    deterministic (same seed ⇒ same PNG bytes through the router)."""
    dryrun_router(2, local_devices=2, timeout=300)

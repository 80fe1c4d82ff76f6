"""Multi-host (DCN) dryrun: the generation program sharded across
PROCESSES, not just devices — jax.distributed wires 2 controller processes
(2 virtual CPU devices each) into one global mesh; the child processes
assert shard-level determinism and cross-host agreement
(dreamlab_tpu/parallel/multihost.py). SURVEY §2.5: the reference has no
distributed backend at all; this is the last parallelism axis."""

from dreamlab_tpu.parallel.multihost import dryrun_multihost


def test_dryrun_multihost_two_processes():
    dryrun_multihost(2, local_devices=2, timeout=300)

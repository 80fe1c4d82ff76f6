"""Per-step callback parity with the reference pipeline's hook
(/root/reference/backends/rknnlcm.py:464-604): callback(step, timestep,
latents) fires every callback_steps steps during the denoise loop."""

import numpy as np
import pytest

from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.testing import random_bundle


@pytest.fixture(scope="module")
def pipe():
    return LCMPipeline(random_bundle("sd15", tiny=True))


def test_callback_fires_every_step(pipe):
    calls = []
    res = pipe.generate(
        "cb", height=128, width=128, num_inference_steps=4, seed=7,
        callback=lambda i, t, lat: calls.append((i, t, lat)),
    )
    assert [c[0] for c in calls] == [0, 1, 2, 3]
    sched = pipe._schedule(4, None)
    assert [c[1] for c in calls] == [int(t) for t in sched.timesteps]
    # latents arrive NCHW like the reference's (rknnlcm.py:601-604)
    h_lat = 128 // pipe.vae_scale
    for _, _, lat in calls:
        assert lat.shape == (1, pipe.latent_channels, h_lat, h_lat)
    assert res.images.shape == (1, 128, 128, 3)


def test_callback_steps_filters(pipe):
    calls = []
    pipe.generate(
        "cb", height=128, width=128, num_inference_steps=4, seed=7,
        callback=lambda i, t, lat: calls.append(i), callback_steps=2,
    )
    # reference rule: i % callback_steps == 0 (rknnlcm.py:603)
    assert calls == [0, 2]


def test_callback_does_not_change_output(pipe):
    base = pipe.generate(
        "determinism", height=128, width=128, num_inference_steps=4, seed=11
    )
    withcb = pipe.generate(
        "determinism", height=128, width=128, num_inference_steps=4, seed=11,
        callback=lambda i, t, lat: None,
    )
    np.testing.assert_array_equal(base.images, withcb.images)


def test_callback_without_latents(pipe):
    calls = []
    pipe.generate(
        "cheap", height=128, width=128, num_inference_steps=4, seed=3,
        callback=lambda i, t, lat: calls.append((i, lat)),
        callback_latents=False,
    )
    assert [i for i, _ in calls] == [0, 1, 2, 3]
    assert all(lat is None for _, lat in calls)


def test_broken_callback_does_not_break_generation(pipe):
    def boom(i, t, lat):
        raise RuntimeError("user callback bug")

    res = pipe.generate(
        "robust", height=128, width=128, num_inference_steps=4, seed=5,
        callback=boom,
    )
    assert res.images.shape == (1, 128, 128, 3)


def test_registry_cleaned_up(pipe):
    pipe.generate(
        "cleanup", height=128, width=128, num_inference_steps=4, seed=1,
        callback=lambda i, t, lat: None,
    )
    assert pipe._progress_registry == {}


def test_progress_monotonic_drops_late_steps(pipe):
    """jax.debug.callback(..., ordered=False) may deliver steps out of
    order; the emit trampoline must monotonize so /generate/stream clients
    (which may render latent previews) never see a step go backwards."""
    calls = []
    token = next(pipe._progress_tokens)
    with pipe._progress_lock:
        pipe._progress_registry[token] = (
            lambda i, t, lat: calls.append(i), 1, {"last": -1},
        )
    try:
        for step in [0, 2, 1, 3, 3, 2, 4]:
            pipe._progress_emit(token, step, 999)
    finally:
        with pipe._progress_lock:
            pipe._progress_registry.pop(token, None)
    assert calls == [0, 2, 3, 4]  # late + duplicate steps dropped
    assert calls == sorted(set(calls))


def test_progress_monotonic_respects_callback_steps(pipe):
    calls = []
    token = next(pipe._progress_tokens)
    with pipe._progress_lock:
        pipe._progress_registry[token] = (
            lambda i, t, lat: calls.append(i), 2, {"last": -1},
        )
    try:
        for step in [1, 0, 2, 3, 4]:  # 1 filtered by modulo, not recorded
            pipe._progress_emit(token, step, 999)
    finally:
        with pipe._progress_lock:
            pipe._progress_registry.pop(token, None)
    assert calls == [0, 2, 4]


def test_progress_monotonic_under_concurrency(pipe):
    """ordered=False callbacks may run CONCURRENTLY; the gate and the
    delivery are atomic under the lock, so no interleaving can hand the
    client a step lower than one it already saw (code-review r5: gating
    outside the lock let a gated-in earlier step overtake a later one
    between the gate and the call)."""
    import random
    import threading

    calls = []
    token = next(pipe._progress_tokens)
    with pipe._progress_lock:
        pipe._progress_registry[token] = (
            lambda i, t, lat: calls.append(i), 1, {"last": -1},
        )
    steps = list(range(200)) * 2  # every step delivered twice
    random.Random(0).shuffle(steps)
    chunks = [steps[i::4] for i in range(4)]
    threads = [
        threading.Thread(
            target=lambda ss=ss: [pipe._progress_emit(token, s, 1)
                                  for s in ss]
        )
        for ss in chunks
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        with pipe._progress_lock:
            pipe._progress_registry.pop(token, None)
    assert calls == sorted(calls), "a client saw a step go backwards"
    assert len(calls) == len(set(calls)), "duplicate step delivered"

"""Multi-chip sharding on the virtual 8-device CPU mesh: the real jitted
programs run data-parallel (and tensor-parallel) without model-code changes,
and match single-device outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dreamlab_tpu import loader
from dreamlab_tpu.parallel import make_mesh, unet_tp_shardings
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.testing import random_bundle


@pytest.fixture(scope="module")
def bundle():
    return random_bundle("sd15", tiny=True)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh(8, model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_data_parallel_matches_single_device(bundle):
    kw = dict(height=32, width=32, num_inference_steps=2, seed=11, batch=8)
    single = LCMPipeline(bundle, dtype=jnp.float32)
    res1 = single.generate("a cat", **kw)

    mesh = make_mesh(8)
    dp = LCMPipeline(bundle, dtype=jnp.float32, mesh=mesh)
    res8 = dp.generate("a cat", **kw)
    # uint8 quantization: allow off-by-one from reduction-order differences
    diff = np.abs(res1.images.astype(int) - res8.images.astype(int))
    assert diff.max() <= 1


def test_tensor_parallel_matches_replicated(bundle):
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3, batch=4)
    mesh = make_mesh(4, model=2)
    tp = LCMPipeline(bundle, dtype=jnp.float32, mesh=mesh, tensor_parallel=True)
    res_tp = tp.generate("a dog", **kw)
    single = LCMPipeline(bundle, dtype=jnp.float32)
    res_s = single.generate("a dog", **kw)
    diff = np.abs(res_tp.images.astype(int) - res_s.images.astype(int))
    assert diff.max() <= 1


def test_tp_sharding_tree_structure(bundle):
    mesh = make_mesh(2, model=2)
    sh = unet_tp_shardings(bundle.unet_params, mesh)
    flat_p = jax.tree_util.tree_leaves(bundle.unet_params)
    flat_s = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert len(flat_p) == len(flat_s)
    # at least the attention projections must actually shard
    specs = [s.spec for s in flat_s]
    assert any("model" in str(s) for s in specs)


def test_sdxl_tensor_parallel_matches_single_device():
    bundle_xl = random_bundle("sdxl", tiny=True)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=6, batch=4,
              guidance_scale=7.5, negative_prompt="bad")
    single = LCMPipeline(bundle_xl, dtype=jnp.float32)
    res_s = single.generate("a castle", **kw)
    mesh = make_mesh(4, model=2)
    tp = LCMPipeline(bundle_xl, dtype=jnp.float32, mesh=mesh,
                     tensor_parallel=True)
    res_tp = tp.generate("a castle", **kw)
    diff = np.abs(res_tp.images.astype(int) - res_s.images.astype(int))
    assert diff.max() <= 1

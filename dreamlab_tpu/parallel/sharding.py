"""Device mesh + sharding rules: data parallel serving, tensor parallel UNet.

The reference scales by pinning whole pipelines to NPU cores / worker
threads (/root/reference/server/lcm_sr_server.py:140-152, 213-233). The TPU
equivalent is a ``jax.sharding.Mesh``:

- **data axis** — batched requests shard on the batch dimension; each chip
  runs the full model on its slice (the analogue of N worker pipelines, but
  inside one XLA program with no queue hop).
- **model axis** — Megatron-style tensor parallelism over attention heads
  and MLP width for HBM-bound configs (SDXL 1024² on 16 GB v5e chips,
  SURVEY.md §7.3). Annotating the weight pytree with NamedShardings is all
  GSPMD needs; XLA inserts the all-reduces on the out-projections, riding
  ICI.

All rules are *annotations over the same pure functions* — no model code
changes between 1-chip and N-chip execution.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def parse_mesh_spec(spec: str) -> dict:
    """'data=8' or 'data=4,model=2' → {'data': 4, 'model': 2}.

    The serving config exposes this as ``DREAMLAB_MESH`` so a deployment
    declares its chip layout; the worker factory builds the mesh once and
    every loaded pipeline shards over it."""
    out = {"data": 1, "model": 1}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in out:
            raise ValueError(f"unknown mesh axis {k!r} (use data/model)")
        out[k] = int(v)
    if out["data"] < 1 or out["model"] < 1:
        raise ValueError(f"invalid mesh spec {spec!r}")
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


# ---------------------------------------------------------------------------
# tensor parallelism for the UNet
# ---------------------------------------------------------------------------


def _tp_spec_for_path(path: str, ndim: int):
    """Megatron pattern over transformer blocks:
    - q/k/v projections: split output features (head-parallel attention),
    - attention out and FF out-projections: split input features
      (GSPMD completes the psum).
    GEGLU in-projections stay replicated: their output is split in half for
    the gate, which does not align with feature shards. Convs / norms /
    embeddings stay replicated — channel-sharded convs would all-gather at
    every GroupNorm.
    """
    # packed projections (pipeline packs at placement time): w [Cin, S, Cout]
    # shards the OUTPUT features — each model shard holds its head-columns of
    # every stacked projection, so the post-matmul q/k/v slices stay local
    # (the Megatron head-parallel property survives packing because the stack
    # axis is separate, not concatenated into the feature axis)
    for tag in ("attn1.qkv", "attn2.kv"):
        if path.endswith(tag + ".w"):
            return P(None, None, "model")
        if path.endswith(tag + ".b"):
            return P(None, "model")
    col = ("attn1.q", "attn1.k", "attn1.v", "attn2.q", "attn2.k", "attn2.v")
    row = ("attn1.out", "attn2.out", "ff_out")
    for tag in col:
        if path.endswith(tag + ".w"):
            return P(None, "model")
        if path.endswith(tag + ".b"):
            return P("model")
    for tag in row:
        if path.endswith(tag + ".w"):
            return P("model", None)
        if path.endswith(tag + ".b"):
            return P()  # bias added after the psum
    return P()


def _leaf_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, f"{prefix}{k}." if prefix or True else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaf_paths(v, f"{prefix}{i}.")
    else:
        yield prefix.rstrip("."), tree


def unet_tp_shardings(unet_params, mesh: Mesh):
    """NamedSharding tree for a UNet param pytree (same structure)."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + k + ".") for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, f"{prefix}{i}.") for i, v in enumerate(tree)]
        path = prefix.rstrip(".")
        ndim = getattr(tree, "ndim", 0)
        return NamedSharding(mesh, _tp_spec_for_path(path, ndim))

    return walk(unet_params)


def shard_params(params, shardings):
    """Place a param tree on device according to a sharding tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def replicate_params(params, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)

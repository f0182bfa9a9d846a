"""Device-mesh data parallelism.

The reference has **zero** distributed code (SURVEY.md §2.3): batching is a
Python loop inside graph construction, and its only nod to multi-device is an
unused ``GPU_COUNT``/``IMAGES_PER_GPU`` config stub (shapes.py:27-28).

Here scaling is first-class and TPU-native: a `jax.sharding.Mesh` with a
``data`` axis, batches laid out as global `jax.Array`s sharded over that axis,
and plain `jax.jit` compiling the global program — XLA inserts the ICI
collectives (psum for loss/grad reductions) automatically. This is the
NCCL-free, mesh-declarative equivalent of a DDP wrapper.

For these model sizes (~45-65M params) data parallelism is the supported
scaling story; the mesh helper accepts extra axes so a ``model`` axis can
shard heads later without API changes (documented out-of-scope for parity,
SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from objectdetection_tpu import detector as detector_lib
from objectdetection_tpu.config import DetectorConfig


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (one process per host feeding its shard).

    Thin wrapper over `jax.distributed.initialize` — on TPU pods the
    arguments are auto-detected from the environment; pass them explicitly
    elsewhere. After this, `jax.devices()` is global and the same
    `make_mesh()` / `shard_batch()` code runs unchanged across hosts with
    collectives on ICI within a slice and DCN across slices.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D (or reshapeable) mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the `data` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays as global arrays sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sh) if x is not None else None,
        batch,
        is_leaf=lambda x: x is None,
    )


def make_parallel_infer_fn(
    config: DetectorConfig, mesh: Mesh, with_masks: bool = True
):
    """Data-parallel inference: variables replicated, batch sharded.

    The per-image pipeline has no cross-image communication, so XLA compiles
    this to fully parallel per-device programs — the multi-chip equivalent of
    the reference's single-image `inference.py` with zero code changes.
    """
    rep, sh = replicated(mesh), batch_sharding(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, sh, sh),
        out_shardings=sh,
    )
    def infer_fn(variables, images, windows):
        return detector_lib.forward_inference(
            variables, images, windows, config, with_masks
        )

    return infer_fn


def make_parallel_train_step(
    config: DetectorConfig, mesh: Mesh, with_masks: bool = False
):
    """Data-parallel training: state replicated, batch sharded, grads psum'd.

    Losses are global masked means over the sharded batch, so XLA emits the
    cross-device reductions (psum over ICI) inside the step — no manual
    collectives, no gradient-sync code.
    """
    rep, sh = replicated(mesh), batch_sharding(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    def step(state, batch, rng):
        return detector_lib.train_step(state, batch, rng, config, with_masks)

    return step


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


# ---------------------------------------------------------------------------
# Optional tensor parallelism over a `model` axis
# ---------------------------------------------------------------------------


def make_dp_tp_mesh(dp: int, tp: int) -> Mesh:
    """2-D mesh: batch over `data`, large head matmuls over `model`."""
    devices = jax.devices()[: dp * tp]
    return Mesh(np.array(devices).reshape(dp, tp), ("data", "model"))


def shard_state_tp(state, mesh: Mesh, min_dim: int = 512):
    """Place a train state with large dense kernels sharded over `model`.

    The sharding rule: any float param whose last dim is ≥ `min_dim` and
    divisible by the model-axis size is split on that dim (the box head's
    [12544, 1024] / [1024, 1024] matmuls and the widest backbone kernels);
    everything else is replicated. Optimizer state follows automatically
    because optax momenta mirror the param tree structure.

    Placement is by `device_put`; the jitted step is compiled with inferred
    shardings ("computation follows data"), so XLA inserts the tensor-
    parallel collectives without any model-code changes.
    """
    tp = mesh.shape["model"]

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating)
            and x.shape[-1] >= min_dim
            and x.shape[-1] % tp == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, state)


def make_tp_train_step(config: DetectorConfig, mesh: Mesh, with_masks: bool = False):
    """dp×tp train step: batch sharded over `data`, heavy matmuls over
    `model`; shardings inferred from the placed inputs."""
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        return detector_lib.train_step(state, batch, rng, config, with_masks)

    def run(state, batch, rng):
        batch = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sh) if x is not None else None,
            batch,
            is_leaf=lambda x: x is None,
        )
        return step(state, batch, jax.device_put(rng, rep))

    return run

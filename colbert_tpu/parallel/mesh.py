"""Device mesh helpers.

The reference is single-GPU by construction (``rank``/``nranks`` are config
placeholders — reference: src/infra/config.jl:13-14, SURVEY §2); here the
mesh is first-class. Axis convention:

  - ``data``: shards batches / collection rows / candidate sets / k-means
    points. Collectives over this axis ride ICI.
  - ``model``: reserved for tensor-parallel sharding of the encoder (ColBERT
    encoders are BERT-sized so the default is 1, but the axis exists so
    larger encoder backbones shard without API changes).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(
    n_data: int = -1, n_model: int = 1, *, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {use} devices, have {len(devices)}")
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, *, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

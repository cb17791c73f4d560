"""Device-mesh construction and sharding helpers.

The reference has NO distributed machinery of any kind (SURVEY.md section
2.5) — single process, one device, sweeps run sequentially in for-loops.
Parallelism is therefore a new first-class design dimension here, not a port:

- the dominant scale axis in this domain is the SAMPLE axis (hyperspectral
  images yield 10^4-10^6 pixel spectra per class; SURVEY.md section 5.7), so
  the canonical mesh axis is ``'data'`` — spectra shard across chips over
  ICI, models stay replicated, and cross-shard statistics (covariance, score
  moments) reduce with ``psum``;
- the secondary axis is ``'model'`` for embarrassingly-parallel fit batches
  (CV folds x LV x grid combos, sweep configs) — distinct model fits placed
  on distinct chips.

Everything composes with single-chip code: meshes of size 1 work, and all
sharded entry points fall back to plain jit when no mesh is given.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    Default: 1-D data-parallel mesh over all devices.  ``shape`` must
    multiply to the device count used.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def require_mesh_axis(mesh: Mesh, axis: str) -> None:
    """Raise a uniform error when ``axis`` is not one of the mesh's axes
    (shared guard for every axis-named sharded entry point)."""
    if axis not in mesh.shape:
        raise ValueError(
            f"mesh has no axis {axis!r} (axes: "
            f"{tuple(mesh.axis_names)}); build one with "
            f"make_mesh((n,), ({axis!r},)) or pass the axis name")


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (sample) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Place an (N, ...) array with its sample axis sharded over the mesh.

    N must divide evenly by the axis size (pad upstream; chemometric
    batches are cheap to pad with masked rows).
    """
    n_shards = mesh.shape[axis]
    if x.shape[0] % n_shards:
        raise ValueError(
            f"sample count {x.shape[0]} not divisible by mesh axis "
            f"{axis!r} of size {n_shards}; pad the batch first")
    return jax.device_put(x, batch_sharding(mesh, axis))


def cyclic_pad(arrays, multiple: int):
    """Pad each array's leading axis to a multiple by cyclic repetition.

    Maps an arbitrary unit count (CV folds, class x fold cells, HPO
    configs) onto a mesh axis: padded units are repeats of real ones, so
    they compute real (discarded) results instead of degenerate masks.
    Returns ``(padded_arrays, pad)``; callers drop the last ``pad`` rows
    of every output.  Array types are preserved (np stays host-side, jnp
    — including PRNG key arrays — stays jnp).
    """
    n = arrays[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return list(arrays), 0
    return [cyclic_pad_to(a, n + pad) for a in arrays], pad


def cyclic_pad_to(a, n: int):
    """Extend an array's leading axis to exactly ``n`` rows by verbatim
    cyclic repetition — the pad-to-size sibling of :func:`cyclic_pad`
    (which pads to a multiple).  Array types are preserved (np stays
    host-side, jnp stays on device)."""
    if a.shape[0] == n:
        return a
    return a[np.arange(n) % a.shape[0]]


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad with repeated last rows to a multiple; returns (padded, n_true)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(np.asarray(x), pad_widths, mode="edge"), n

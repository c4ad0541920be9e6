"""Device mesh construction and batch sharding helpers.

Axes:
  carrier — component carriers / cells (reference analog: one process per
            cell, lib/src/radio/radio_multi.cc; eMBMS multi-cell pmch.c)
  sf      — subframe batch (reference analog: the PHY worker pipeline,
            lib/include/srslte/common/thread_pool.h:46)

Shardings are plain NamedShardings over leading batch dims; XLA SPMD
inserts the collectives. The turbo sequence-parallel axis is handled
separately in turbo_sp.py via shard_map + ppermute.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, carriers: int | None = None,
              devices=None, hosts: int | None = None) -> Mesh:
    """Build a (carrier, sf) mesh over the given/available devices.

    ``carriers`` defaults to the largest power-of-two <= sqrt(n) so both
    axes are populated when possible. ``hosts`` prepends a host axis
    (single-process shape parity with the multi-process mesh built by
    dist.make_global_mesh, which maps that axis onto real processes).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if hosts:
        assert n_devices % hosts == 0, (n_devices, hosts)
        per = n_devices // hosts
        if carriers is None:
            carriers = 1
        assert per % carriers == 0, (per, carriers)
        sf = per // carriers
        return Mesh(devices.reshape(hosts, carriers, sf),
                    axis_names=("host", "carrier", "sf"))
    if carriers is None:
        carriers = 1
        while carriers * 2 * carriers * 2 <= n_devices:
            carriers *= 2
        while n_devices % carriers:
            carriers //= 2
    sf = n_devices // carriers
    return Mesh(devices.reshape(carriers, sf), axis_names=("carrier", "sf"))


def shard_batch(mesh: Mesh, x, carrier_dim: int = 0, sf_dim: int = 1):
    """Place an array with leading [carrier, sf, ...] dims onto the mesh."""
    spec = [None] * x.ndim
    spec[carrier_dim] = "carrier"
    spec[sf_dim] = "sf"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def batch_sharding(mesh: Mesh, ndim: int, carrier_dim: int = 0,
                   sf_dim: int = 1) -> NamedSharding:
    spec = [None] * ndim
    spec[carrier_dim] = "carrier"
    spec[sf_dim] = "sf"
    return NamedSharding(mesh, P(*spec))

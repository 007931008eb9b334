"""Host->device feed utilities for corpora too large to live in HBM.

The default training path keeps the whole fold on device and samples there
(`data/sampler.py`) — no feed needed. These helpers cover the other regime
(the role of the reference's 4-worker DataLoaders, `sed.py:153-156`): a
double-buffered prefetch iterator that keeps `depth` batches in flight via
async `device_put`, and a sharded variant placing per-device sub-batches for
a data-parallel mesh."""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_prefetch(batches: Iterable, depth: int = 2) -> Iterator:
    """Yield device-resident batches while the next `depth` transfer
    asynchronously — host preprocessing of batch k+depth overlaps device
    compute on batch k."""
    if depth < 1:
        raise ValueError("prefetch depth must be >= 1")
    queue = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while queue:
        ready = queue.popleft()
        try:
            queue.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield ready


def sharded_prefetch(
    batches: Iterable,
    mesh: Mesh,
    axis_name: str = "data",
    depth: int = 2,
    spec: Optional[P] = None,
) -> Iterator:
    """Like `device_prefetch`, but each batch pytree is placed batch-sharded
    over the mesh (leading axis split across `axis_name`)."""
    sharding = NamedSharding(mesh, spec if spec is not None else P(axis_name))

    def put(batch):
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    return device_prefetch(map(put, iter(batches)), depth=depth)

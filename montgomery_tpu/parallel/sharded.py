"""Multi-chip MSM: points sharded over a device mesh, buckets combined with
point-add collectives.

TPU-native equivalent of the reference's shared-memory thread parallelism
(SURVEY.md §2.3/§2.4): `range(N)` point sharding becomes a jax.sharding.Mesh
axis; the atomic bucket counters and barriers disappear (each device
accumulates its own full bucket grid over its point shard); the cross-thread
bucket-chunk aggregation (msm-batched-affine.ts:306-318) becomes a butterfly
(XOR-pattern) ppermute all-reduce whose reduction operator is the GROUP ADD,
not a numeric sum (psum of limb arrays would be wrong — SURVEY.md §7.3
item 6). The final triangle+Horner reduction is computed redundantly on every
device (it is tiny relative to the accumulation phase).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..msm.pippenger import bucket_accumulate, reduce_buckets


def msm_sharded(group, points, digits, c: int, mesh: Mesh, axis: str = "dp",
                window_chunk: int | None = None):
    """MSM with points/digits sharded along `axis` of `mesh`.

    points: group point batch (leaves (n, N) / (N,)), N divisible by mesh size
    digits: (K, N) int32 signed digits
    Returns a replicated group point with trailing shape (1,).
    """
    D = mesh.shape[axis]
    assert D & (D - 1) == 0, "mesh axis size must be a power of two"

    def point_spec(a):
        return P(*([None] * (a.ndim - 1) + [axis]))

    in_specs = (
        jax.tree.map(point_spec, points),
        P(None, axis),
    )
    out_specs = jax.tree.map(lambda a: P(), points)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    def run(points_local, digits_local):
        buckets, K_pad, L = bucket_accumulate(
            group, points_local, digits_local, c, window_chunk
        )
        # butterfly all-reduce over the mesh axis with the group add
        s = 1
        while s < D:
            perm = [(i, i ^ s) for i in range(D)]
            other = jax.tree.map(
                lambda a: jax.lax.ppermute(a, axis, perm), buckets
            )
            buckets = group.add(buckets, other)
            s <<= 1
        # triangle + horner, redundantly replicated on each device
        return reduce_buckets(group, buckets, c, K_pad, L)

    return run(points, digits)


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (axis,), devices=devs)


def shard_points(points, digits, mesh: Mesh, axis: str = "dp"):
    """Place host arrays with the canonical MSM sharding (points along axis)."""

    def put(a):
        spec = P(*([None] * (a.ndim - 1) + [axis]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, points), jax.device_put(
        digits, NamedSharding(mesh, P(None, axis))
    )

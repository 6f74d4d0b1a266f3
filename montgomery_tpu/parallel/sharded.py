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

Correctness note (round-3 verdict fix): the cross-shard combine ALWAYS runs in
complete projective coordinates with the RCB complete add, regardless of how
the per-shard accumulation ran. Cross-shard bucket grids structurally contain
empty buckets (infinity) and can contain equal bucket sums (doubling case);
the unsafe affine add silently drops infinity flags and divides by zero on
equal points, so it must never be the all-reduce operator. The reference's
cross-thread aggregation is likewise exact (msm-batched-affine.ts:306-318,
projective addAssign).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..msm.pippenger import bucket_accumulate, reduce_buckets


def _butterfly_allreduce(group, buckets, axis: str, D: int):
    """All-reduce a bucket tree over the mesh axis with the GROUP ADD as the
    reduction operator (a psum of limb planes would be numerically wrong —
    bucket entries are curve points)."""
    s = 1
    while s < D:
        perm = [(i, i ^ s) for i in range(D)]
        other = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), buckets)
        buckets = group.add(buckets, other)
        s <<= 1
    return buckets


def msm_sharded(group, points, digits, c: int, mesh: Mesh, axis: str = "dp",
                window_chunk: int | None = None, reduce_group=None,
                to_reduce=None):
    """MSM with points/digits sharded along `axis` of `mesh`.

    points: group point batch (leaves (n, N) / (N,)), N divisible by mesh size
    digits: (K, N) int32 signed digits
    reduce_group/to_reduce: optional separate group for the bucket reduction
    (the batched-affine path accumulates in affine coordinates but reduces in
    complete projective coordinates, mirroring the reference's
    normalizeBucketsStorage step, msm-batched-affine.ts:289-297).
    Returns a replicated group point with trailing shape (1,).
    """
    D = mesh.shape[axis]
    assert D & (D - 1) == 0, "mesh axis size must be a power of two"

    def point_spec(a):
        return P(*([None] * (a.ndim - 1) + [axis]))

    rg = reduce_group if reduce_group is not None else group
    in_specs = (
        jax.tree.map(point_spec, points),
        P(None, axis),
    )
    probe = rg.zero_like((1,))
    out_specs = jax.tree.map(lambda a: P(), probe)

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
        # cross-shard combine must be COMPLETE (empty/equal buckets are
        # structural): convert to the reduce group first, then butterfly
        # all-reduce with its complete add
        if to_reduce is not None:
            buckets = to_reduce(buckets)
        buckets = _butterfly_allreduce(rg, buckets, axis, D)
        # triangle + horner, redundantly replicated on each device
        return reduce_buckets(rg, buckets, c, K_pad, L)

    return run(points, digits)


def msm_full_sharded(ctx, points, scalar_limbs, c: int, mesh: Mesh,
                     axis: str = "dp", affine: bool = True,
                     unsafe: bool = False, window_chunk: int | None = None):
    """The FLAGSHIP multi-chip pipeline: everything on device, points and
    scalars sharded along `axis` — GLV point expansion (endomorphism), GLV
    decomposition + signed-digit slicing, packed batched-affine bucket
    accumulation on each shard, butterfly point-add all-reduce of the bucket
    grids over ICI, replicated projective reduction + Horner combine.

    The TPU analog of the reference's full parallel msm
    (msm-batched-affine.ts:69-339: range(N)-sharded prep, per-thread bucket
    accumulation, cross-thread chunk aggregation, main-thread combine).

    ctx: WeierstrassMsm; points: AffineBatch (N); scalar_limbs: (ns, N).
    """
    D = mesh.shape[axis]
    assert D & (D - 1) == 0, "mesh axis size must be a power of two"
    from ..scalar.device import digits_glv_device

    group = ctx.aff_adapter_unsafe if unsafe else ctx.aff_adapter
    if not affine:
        group = ctx.adapter
    rg = ctx.adapter

    def point_spec(a):
        return P(*([None] * (a.ndim - 1) + [axis]))

    in_specs = (jax.tree.map(point_spec, points), P(None, axis))
    out_specs = jax.tree.map(lambda a: P(), rg.zero_like((1,)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    def run(pts_local, limbs_local):
        # per-shard prep: endomorphism expansion + device GLV digits
        # (reference: range(N)-sharded preparePointsAndScalars); on the
        # affine path the expansion is fused with the 16-bit row packing
        digits_local = digits_glv_device(ctx.glv_dev, limbs_local, c)
        if affine:
            src = ctx.affine.pack_rows_glv(pts_local)
        else:
            src = rg.from_points(ctx.expand_points_glv(pts_local))
        buckets, K_pad, L = bucket_accumulate(
            group, src, digits_local, c, window_chunk
        )
        # cross-shard combine in COMPLETE projective coordinates (see module
        # docstring): empty buckets (inf) and equal cross-shard bucket sums
        # are structural; the RCB complete add handles both, the unsafe
        # affine add does not.
        if affine:
            buckets = group.to_projective(buckets)
        buckets = _butterfly_allreduce(rg, buckets, axis, D)
        return reduce_buckets(rg, buckets, c, K_pad, L)

    return run(points, scalar_limbs)


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

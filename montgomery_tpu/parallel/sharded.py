"""Multi-chip MSM: points sharded over a device mesh, buckets combined with
point-add collectives.

TPU-native equivalent of the reference's shared-memory thread parallelism
(SURVEY.md §2.3/§2.4): `range(N)` point sharding becomes a jax.sharding.Mesh
axis; the atomic bucket counters and barriers disappear (each device
accumulates its own full bucket grid over its point shard); the cross-thread
bucket-chunk aggregation (msm-batched-affine.ts:306-318) becomes a butterfly
(XOR-pattern) ppermute REDUCE-SCATTER over the window axis whose reduction
operator is the GROUP ADD, not a numeric sum (psum of limb arrays would be
wrong — SURVEY.md §7.3 item 6). Each device then reduces only its own
windows — the TPU analog of the reference's bucket-space work split
(msm-common.ts:72-172 splitBuckets) — and the tiny per-window sums are
all-gathered for a replicated Horner combine.

vs the round-4 all-reduce + replicated reduction: ICI traffic drops from
log2(D) full bucket grids to (1 - 1/D) of one grid, and the O(K*L) bucket
reduction parallelizes D ways instead of being Amdahl's serial term (at
2^16 / 8 devices the replicated reduction alone capped scaling efficiency
at ~59%; see doc/PERF.md).

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

from ..msm.pippenger import (
    bucket_accumulate,
    combine_windows,
    reduce_buckets,
    window_sums,
)


def _butterfly_allreduce(group, buckets, axis: str, D: int):
    """All-reduce a bucket tree over the mesh axis with the GROUP ADD as the
    reduction operator (a psum of limb planes would be numerically wrong —
    bucket entries are curve points). Kept for the generic path and tests;
    the flagship path uses the cheaper reduce-scatter below."""
    s = 1
    while s < D:
        perm = [(i, i ^ s) for i in range(D)]
        other = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), buckets)
        buckets = group.add(buckets, other)
        s <<= 1
    return buckets


def _pad_windows(group, buckets, K_pad: int, K2: int):
    """Pad the window axis (second-to-last) with identity windows."""
    if K2 == K_pad:
        return buckets
    probe = jax.tree.leaves(buckets)[0]
    L = probe.shape[-1]
    ident = group.zero_like((K2 - K_pad, L))

    def cat(a, z):
        ax = a.ndim - 2
        return jnp.concatenate([a, z], axis=ax)

    return jax.tree.map(cat, buckets, ident)


def _win_slice(buckets, lo: int, hi: int):
    def sl(a):
        return jax.lax.slice_in_dim(a, lo, hi, axis=a.ndim - 2)

    return jax.tree.map(sl, buckets)


def _butterfly_reduce_scatter(group, buckets, axis: str, D: int, K2: int):
    """Hypercube reduce-scatter over the WINDOW axis with the group add:
    log2(D) steps, each exchanging HALF the currently-live window range
    (total traffic (1 - 1/D) of one grid vs log2(D) grids for all-reduce).
    After the last step device d holds windows [d*K2/D, (d+1)*K2/D) fully
    summed across all devices. K2 must be divisible by D."""
    assert K2 % D == 0
    idx = jax.lax.axis_index(axis)
    width = K2
    s = D >> 1
    while s >= 1:
        h = width // 2
        bit = (idx // s) % 2  # 0: keep low half, 1: keep high half
        low = _win_slice(buckets, 0, h)
        high = _win_slice(buckets, h, width)
        # send the half I am giving up; receive the partner's matching half
        send = jax.tree.map(
            lambda a, b: jnp.where(bit == 0, b, a), low, high
        )
        perm = [(i, i ^ s) for i in range(D)]
        recv = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), send)
        keep = jax.tree.map(
            lambda a, b: jnp.where(bit == 0, a, b), low, high
        )
        buckets = group.add(keep, recv)
        width = h
        s >>= 1
    return buckets


def _reduce_scatter_windows(rg, buckets, c: int, mesh_axis: str, D: int,
                            K_pad: int, L: int):
    """Reduce-scatter bucket grids over windows, reduce locally, all-gather
    the per-window sums, combine replicated. Returns the final point (1,)."""
    K2 = -(-K_pad // D) * D if D > 1 else K_pad
    buckets = _pad_windows(rg, buckets, K_pad, K2)
    if D > 1:
        buckets = _butterfly_reduce_scatter(rg, buckets, mesh_axis, D, K2)
    Kloc = K2 // D
    W = window_sums(rg, buckets, Kloc, L)  # leaves (n, Kloc, 1)
    W = jax.tree.map(lambda a: a.reshape(*a.shape[:-2], a.shape[-2]), W)
    if D > 1:
        W = jax.tree.map(
            lambda a: jax.lax.all_gather(
                a, mesh_axis, axis=a.ndim - 1, tiled=True
            ),
            W,
        )  # leaves (n, K2), natural window order
    return combine_windows(rg, W, c, K2)


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
        # structural): convert to the reduce group first, then window
        # reduce-scatter with its complete add
        if to_reduce is not None:
            buckets = to_reduce(buckets)
        return _reduce_scatter_windows(rg, buckets, c, axis, D, K_pad, L)

    return run(points, digits)


def msm_full_sharded(ctx, points, scalar_limbs, c: int, mesh: Mesh,
                     axis: str = "dp", affine: bool = True,
                     unsafe: bool = False, window_chunk: int | None = None):
    """The FLAGSHIP multi-chip pipeline: everything on device, points and
    scalars sharded along `axis` — GLV point expansion (endomorphism), GLV
    decomposition + signed-digit slicing, packed batched-affine bucket
    accumulation on each shard, butterfly point-add reduce-scatter of the
    bucket grids over ICI, per-device window reduction, all-gathered Horner
    combine.

    The TPU analog of the reference's full parallel msm
    (msm-batched-affine.ts:69-339: range(N)-sharded prep, per-thread bucket
    accumulation, bucket-space-split reduction, main-thread combine).

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
            group, src, digits_local, c, window_chunk, prepacked=affine
        )
        # cross-shard combine in COMPLETE projective coordinates (see module
        # docstring): empty buckets (inf) and equal cross-shard bucket sums
        # are structural; the RCB complete add handles both, the unsafe
        # affine add does not.
        if affine:
            buckets = group.to_projective(buckets)
        return _reduce_scatter_windows(rg, buckets, c, axis, D, K_pad, L)

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

"""Multi-chip MSM on a virtual 8-device CPU mesh: sharded result must equal
the single-device result and the oracle (mirror of the reference's real
16-worker pool integration test, src/msm.test.ts:22-119).

Field kernels run in callback mode here (each fused formula is ONE opaque op
evaluated eagerly): the shard_map program — sharding specs, ppermute
butterfly, digit pipeline — is identical to production, while XLA compile
drops from minutes (fully inlined limb arithmetic) to seconds. The inlined
path is covered by the driver's dryrun (MSM_DRYRUN_MODE=inline) and by the
single-chip TPU bench."""

import jax
import jax.numpy as jnp
import pytest

from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
from montgomery_tpu.concrete import BLS12_377, PALLAS
from montgomery_tpu.msm import WeierstrassMsm
from montgomery_tpu.ops import kernels
from montgomery_tpu.parallel import make_mesh, msm_sharded, msm_full_sharded, shard_points


def test_msm_sharded_8dev(rng):
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual CPU devices"
    C = WeierstrassCurve(PALLAS)
    ctx = WeierstrassMsm(PALLAS)
    N, c = 32, 4
    pts = C.random_points(N, rng)
    sc = [rng.randrange(PALLAS.order) for _ in range(N)]
    sc[0] = 0
    pts[2] = pts[1]

    mesh = make_mesh(8)
    d = jnp.asarray(ctx.digits(sc, c))
    A = ctx.adapter.from_points(ctx.proj.affine_to_device(pts))
    A, d = shard_points(A, d, mesh)
    exp = oracle_msm(C, sc, pts)

    with kernels.force_pallas(True, callback=True):
        fn = jax.jit(
            lambda a, dg: msm_sharded(ctx.adapter, a, dg, c, mesh)
        )
        S = fn(A, d)
        got = ctx.proj.to_host(S)[0]
        assert C.equal(got, exp)

        # 2-device mesh must agree as well (different butterfly depth)
        mesh2 = make_mesh(2)
        A2 = ctx.adapter.from_points(ctx.proj.affine_to_device(pts))
        A2, d2 = shard_points(A2, jnp.asarray(ctx.digits(sc, c)), mesh2)
        S2 = jax.jit(lambda a, dg: msm_sharded(ctx.adapter, a, dg, c, mesh2))(A2, d2)
        got2 = ctx.proj.to_host(S2)[0]
        assert C.equal(got2, exp)


def test_msm_sharded_edwards(rng):
    """Twisted-Edwards MSM sharded over the mesh (generic engine + the
    window reduce-scatter): TE adds are complete, so the same collective
    structure applies without a coordinate change. D = 2: an 8-partition
    run deadlocks nondeterministically on this 2-core host (see
    test_msm_sharded_production_shape)."""
    from montgomery_tpu.bigint import TwistedEdwardsCurve
    from montgomery_tpu.concrete import ED_ON_BLS12_377
    from montgomery_tpu.msm import EdwardsMsm

    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    ctx = EdwardsMsm(ED_ON_BLS12_377)
    N, c = 32, 4
    pts = [E.scale(rng.randrange(1, 1 << 62), E.generator) for _ in range(N)]
    sc = [rng.randrange(1 << 62) for _ in range(N)]
    sc[0] = 0
    pts[9] = pts[1]
    sc[9] = sc[1]
    mesh = make_mesh(2)
    d = jnp.asarray(ctx.digits(sc, c, scalar_bits=64))
    P = ctx.ed.to_device(pts)
    P, d = shard_points(P, d, mesh)
    with kernels.force_pallas(True, callback=True):
        S = jax.jit(lambda a, dg: msm_sharded(ctx.adapter, a, dg, c, mesh))(P, d)
        got = ctx.ed.to_host(S)[0]
    exp = oracle_msm(E, sc, pts)
    assert E.equal(got, exp)


@pytest.mark.slow
def test_msm_sharded_production_shape(rng):
    """Production-regime sharded run (round-4 verdict item #7): c = 10 (so
    K_pad/L match the single-chip production MSM), 2^10 points per shard,
    window_chunk set, SAFE engine, vs the oracle.

    D = 2 (not 8): XLA:CPU deadlocks nondeterministically when 8 blocking
    callback partitions share this host's 2-core client pool (see the
    dryrun notes in __graft_entry__.py); two partitions exercise the same
    reduce-scatter/collective structure and run reliably (green in
    .logs/prod_shape_d2.log: 280 s)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    n_dev, c = 2, 10
    N = n_dev * (1 << 10)
    base = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(64)]
    pts = [base[i % 64] for i in range(N)]
    sc = [rng.randrange(BLS12_377.order) for _ in range(N)]
    A = ctx.proj.affine_to_device(pts)
    limbs = jnp.asarray(ctx.scalars_to_limbs(sc))
    mesh = make_mesh(n_dev)

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*([None] * (a.ndim - 1) + ["dp"])))
        )

    A = jax.tree.map(put, A)
    limbs = put(limbs)
    with kernels.force_pallas(True, callback=True):
        S = jax.jit(
            lambda a, sl: msm_full_sharded(
                ctx, a, sl, c, mesh, unsafe=False, window_chunk=7
            )
        )(A, limbs)
        got = ctx.proj.to_host(S)[0]
    assert C.equal(got, oracle_msm(C, sc, pts))


@pytest.mark.parametrize("unsafe", [True, False])
def test_msm_flagship_sharded_8dev(rng, unsafe):
    """The FLAGSHIP pipeline (GLV expand + device GLV digits + packed
    batched-affine accumulation + complete-projective butterfly all-reduce)
    under shard_map, vs the oracle — both accumulation variants.

    Structural hazards for the cross-shard combine are planted deliberately:
    a zero scalar (empty buckets everywhere) and a point duplicated ACROSS
    shards with equal scalars (equal per-shard bucket sums -> the butterfly
    add must double, not divide by zero). This is the regression test for
    the round-3 false green (unsafe affine add in the butterfly)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    N, c = 32, 4
    pts = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(N)]
    sc = [rng.randrange(BLS12_377.order) for _ in range(N)]
    sc[0] = 0
    # duplicate across shards (shard size = 4): same point+scalar in shard 0
    # and shard 2 -> equal bucket sums meet in the butterfly
    pts[9] = pts[1]
    sc[9] = sc[1]
    A = ctx.proj.affine_to_device(pts)
    limbs = jnp.asarray(ctx.scalars_to_limbs(sc))
    mesh = make_mesh(8)

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*([None] * (a.ndim - 1) + ["dp"])))
        )

    A = jax.tree.map(put, A)
    limbs = put(limbs)
    with kernels.force_pallas(True, callback=True):
        S = jax.jit(
            lambda a, sl: msm_full_sharded(ctx, a, sl, c, mesh, unsafe=unsafe)
        )(A, limbs)
        got = ctx.proj.to_host(S)[0]
    assert C.equal(got, oracle_msm(C, sc, pts))

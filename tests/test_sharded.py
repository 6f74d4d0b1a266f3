"""Multi-chip MSM on a virtual 8-device CPU mesh: sharded result must equal
the single-device result and the oracle (mirror of the reference's real
16-worker pool integration test, src/msm.test.ts:22-119)."""

import jax
import jax.numpy as jnp
import pytest

from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
from montgomery_tpu.concrete import PALLAS
from montgomery_tpu.msm import WeierstrassMsm
from montgomery_tpu.parallel import make_mesh, msm_sharded, shard_points


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

    fn = jax.jit(
        lambda a, dg: msm_sharded(ctx.adapter, a, dg, c, mesh)
    )
    S = fn(A, d)
    got = ctx.proj.to_host(S)[0]
    exp = oracle_msm(C, sc, pts)
    assert C.equal(got, exp)

    # 2-device mesh must agree as well (different butterfly depth)
    mesh2 = make_mesh(2)
    A2 = ctx.adapter.from_points(ctx.proj.affine_to_device(pts))
    A2, d2 = shard_points(A2, jnp.asarray(ctx.digits(sc, c)), mesh2)
    S2 = jax.jit(lambda a, dg: msm_sharded(ctx.adapter, a, dg, c, mesh2))(A2, d2)
    got2 = ctx.proj.to_host(S2)[0]
    assert C.equal(got2, exp)


def test_msm_flagship_sharded_8dev(rng):
    """The FLAGSHIP pipeline (GLV expand + device GLV digits + packed
    batched-affine accumulation + butterfly all-reduce) under shard_map,
    vs the oracle."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from montgomery_tpu.bigint import msm as _oracle
    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.parallel import msm_full_sharded

    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    N, c = 32, 4
    pts = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(N)]
    sc = [rng.randrange(BLS12_377.order) for _ in range(N)]
    sc[0] = 0
    A = ctx.proj.affine_to_device(pts)
    limbs = jnp.asarray(ctx.scalars_to_limbs(sc))
    mesh = make_mesh(8)

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*([None] * (a.ndim - 1) + ["dp"])))
        )

    A = jax.tree.map(put, A)
    limbs = put(limbs)
    S = jax.jit(
        lambda a, sl: msm_full_sharded(ctx, a, sl, c, mesh, unsafe=True)
    )(A, limbs)
    got = ctx.proj.to_host(S)[0]
    assert C.equal(got, _oracle(C, sc, pts))

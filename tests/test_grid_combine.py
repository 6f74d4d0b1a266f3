"""Cross-shard bucket-grid combine correctness (round-3 verdict item #1).

The multi-chip butterfly all-reduce combines per-shard bucket grids that
STRUCTURALLY contain empty buckets (infinity) and can contain equal bucket
sums (doubling) or negated sums (cancellation). These tests combine two
accumulated grids directly (no shard_map, so no minutes-long compile) and
check every lane against the bigint oracle:

- the COMPLETE projective combine (what parallel/sharded.py now uses for the
  butterfly: to_projective + RCB complete add),
- the SAFE affine batch_add at grid width > _BATCH_INV_STOP = 512, so
  poisoned-lane substitution must survive the shared batch-inversion TREE
  (one zero denominator above 512 lanes would otherwise corrupt every lane),
- the masked UNSAFE add with the poisoned lanes excluded via the validity
  mask (the pair-halving engine's contract).

Reference analog: the cross-thread bucket aggregation is exact,
msm-batched-affine.ts:306-318.
"""

import jax
import jax.numpy as jnp
import numpy as np

from montgomery_tpu.bigint import WeierstrassCurve
from montgomery_tpu.concrete import BLS12_377
from montgomery_tpu.curves.projective import AffineBatch
from montgomery_tpu.msm import WeierstrassMsm


def _build_grids(C, ctx, W, rng):
    """Two W-lane affine grids with structural edge lanes at the front and
    generic random pairs behind; returns (G, H, expected host points)."""
    from montgomery_tpu.bigint.weierstrass import AffinePoint

    zero = AffinePoint.zero()
    base = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(8)]
    g, h = [], []
    # lane 0: empty + empty
    g.append(zero); h.append(zero)
    # lane 1: empty + P
    g.append(zero); h.append(base[0])
    # lane 2: P + empty
    g.append(base[1]); h.append(zero)
    # lane 3: equal (doubling in the combine)
    g.append(base[2]); h.append(base[2])
    # lane 4: cancellation (P + -P)
    g.append(base[3]); h.append(C.neg(base[3]))
    # lane 5: second cancellation lane (cancel next to cancel in the grid)
    g.append(base[4]); h.append(C.neg(base[4]))
    # rest: generic random pairs (cheap: small multiples of earlier points)
    while len(g) < W:
        k = rng.randrange(1, 1 << 30)
        g.append(C.scale(k, base[len(g) % 8]))
        h.append(C.scale(k + 1, base[(len(g) + 3) % 8]))
    exp = [C.add(a, b) for a, b in zip(g, h)]
    G = ctx.proj.affine_to_device(g)
    H = ctx.proj.affine_to_device(h)
    return G, H, exp


def test_grid_combine_complete_projective(rng):
    """The butterfly operator: complete projective add over a mixed grid."""
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    W = 64
    G, H, exp = _build_grids(C, ctx, W, rng)
    out = jax.jit(
        lambda a, b: ctx.proj.add(ctx.proj.from_affine(a), ctx.proj.from_affine(b))
    )(G, H)
    got = ctx.proj.to_host(out)
    for i, (gp, ep) in enumerate(zip(got, exp)):
        assert C.equal(gp, ep), f"lane {i}: {gp} != {ep}"


def test_grid_combine_safe_affine_wide(rng):
    """Safe affine batch_add on a grid WIDER than the 512-lane batch-inv tree
    stop: edge lanes (inf, equal, cancel) must not poison the shared
    inversion tree for the generic lanes."""
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    W = 640  # > FieldOps._BATCH_INV_STOP = 512 -> exercises the tree fold
    G, H, exp = _build_grids(C, ctx, W, rng)
    out = jax.jit(ctx.affine.batch_add)(G, H)
    got = ctx.proj.affine_to_host(out)
    for i, (gp, ep) in enumerate(zip(got, exp)):
        assert C.equal(gp, ep), f"lane {i}: {gp} != {ep}"


def test_grid_combine_masked_unsafe(rng):
    """Masked unsafe add: lanes with structural hazards are excluded via the
    validity mask (pass-through), matching the pair-halving engine's use."""
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    W = 640
    G, H, exp = _build_grids(C, ctx, W, rng)
    valid = np.ones(W, dtype=bool)
    valid[:6] = False  # hazard lanes pass G through unchanged
    vmask = jnp.asarray(valid)
    # invalid lanes are unspecified in the kernel output; the engine applies
    # the pass-through select outside (pippenger.pair_round) — emulate that
    out = jax.jit(
        lambda a, b: ctx.affine.select(
            vmask, ctx.affine.batch_add_unsafe(a, b, valid=vmask), a
        )
    )(G, H)
    got = ctx.proj.affine_to_host(out)
    gh = ctx.proj.affine_to_host(G)
    for i in range(W):
        want = exp[i] if valid[i] else gh[i]
        assert C.equal(got[i], want), f"lane {i}"

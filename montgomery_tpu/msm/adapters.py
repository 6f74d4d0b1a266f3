"""Group adapters: the minimal batched-group interface the MSM engine needs.

Mirrors the reference's msm-basic input record {add, double, addMixed,
setZero, ...} (msm-basic.ts:16-32) — any curve exposing complete batched
add/double/select/gather can be fed to the Pippenger engine:
ProjectiveAdapter (Weierstrass) and EdwardsAdapter (twisted Edwards).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curves.edwards import EdwardsBatch, EdwardsOps
from ..curves.projective import AffineBatch, ProjectiveBatch, ProjectiveOps
from ..ops.field import Array, FieldOps


def _take(P, idx):
    return jax.tree.map(lambda a: jnp.take(a, idx, axis=-1), P)


class ProjectiveAdapter:
    """Weierstrass MSM accumulation in masked-complete projective coords."""

    def __init__(self, proj: ProjectiveOps):
        self.proj = proj
        self.f: FieldOps = proj.f

    def zero_like(self, shape) -> ProjectiveBatch:
        f = self.f
        one = jnp.broadcast_to(
            jnp.asarray(f.one_mont).reshape((f.n,) + (1,) * max(1, len(shape))),
            (f.n, *shape),
        )
        z = jnp.zeros((f.n, *shape), dtype=jnp.int32)
        return ProjectiveBatch(z, one, z)

    def from_points(self, A: AffineBatch) -> ProjectiveBatch:
        return self.proj.from_affine(A)

    def add(self, P, Q, valid=None):
        return self.proj.add(P, Q)

    def double(self, P):
        return self.proj.double(P)

    def double_n(self, P, k: int):
        return self.proj.double_n(P, k)

    def select(self, mask, a, b):
        return self.proj.select(mask, a, b)

    def gather(self, P, idx):
        return _take(P, idx)

    def neg_where(self, P, mask):
        f = self.f
        return ProjectiveBatch(P.X, f._sel(mask, f.neg(P.Y), P.Y), P.Z)

    def reshape(self, P, shape):
        n = self.f.n
        return jax.tree.map(lambda a: a.reshape((n, *shape) if a.shape[0] == n else shape), P)


class AffineAccumAdapter:
    """Batched-affine accumulation adapter: pair-halving rounds run on
    AffineBatch with the shared-batch-inversion complete add — the TPU analog
    of the reference's flagship batched-affine accumulation
    (msm-batched-affine.ts:243-283 + curve-affine.ts batchAddNew).
    ~8M/add (incl. amortized inversion) vs ~14M for projective RCB."""

    def __init__(self, aff, proj: ProjectiveOps, unsafe: bool = False):
        self.aff = aff
        self.proj = proj
        self.unsafe = unsafe
        self.f: FieldOps = aff.f

    def zero_like(self, shape) -> AffineBatch:
        f = self.f
        z = jnp.zeros((f.n, *shape), dtype=jnp.int32)
        return AffineBatch(z, z, jnp.ones(shape, dtype=bool))

    def from_points(self, A: AffineBatch) -> AffineBatch:
        return A

    def add(self, P, Q, valid=None):
        if self.unsafe:
            return self.aff.batch_add_unsafe(P, Q, valid=valid)
        return self.aff.batch_add(P, Q)

    def select(self, mask, a, b):
        return self.aff.select(mask, a, b)

    def gather(self, P, idx):
        return _take(P, idx)

    def neg_where(self, P, mask):
        f = self.f
        return AffineBatch(P.x, f._sel(mask, f.neg(P.y), P.y), P.inf)

    def to_projective(self, A: AffineBatch):
        return self.proj.from_affine(A)

    # --- packed fast path (see AffineOps packed form): the MSM engine keeps
    #     points as ONE (2n+1, M) array so each pair round is one gather ---

    @property
    def packed_rows(self) -> int:
        return self.aff.packed_rows

    def pack_rows(self, A: AffineBatch):
        return self.aff.pack_rows(A)

    def unpack_rows(self, P):
        return self.aff.unpack_rows(P)

    def add_packed(self, A, B, sA, sB, valid):
        return self.aff.add_packed(A, B, sA, sB, valid, unsafe=self.unsafe)

    def buckets_from_packed(self, Bp, valid) -> AffineBatch:
        """Packed bucket gather -> point batch; invalid (empty) buckets
        become the identity (inf)."""
        ub = self.unpack_rows(Bp)
        return AffineBatch(ub.x, ub.y, ub.inf | jnp.logical_not(valid))


class EdwardsAdapter:
    """Twisted-Edwards MSM accumulation in extended coords (no masks needed)."""

    def __init__(self, ed: EdwardsOps):
        self.ed = ed
        self.f: FieldOps = ed.f

    def zero_like(self, shape) -> EdwardsBatch:
        f = self.f
        one = jnp.broadcast_to(
            jnp.asarray(f.one_mont).reshape((f.n,) + (1,) * max(1, len(shape))),
            (f.n, *shape),
        )
        z = jnp.zeros((f.n, *shape), dtype=jnp.int32)
        return EdwardsBatch(z, one, one, z)

    def from_points(self, P: EdwardsBatch) -> EdwardsBatch:
        return P

    def add(self, P, Q, valid=None):
        return self.ed.add(P, Q)

    def double(self, P):
        return self.ed.double(P)

    def double_n(self, P, k: int):
        return jax.lax.fori_loop(0, k, lambda _, Q: self.ed.double(Q), P)

    def select(self, mask, a, b):
        return self.ed.select(mask, a, b)

    def gather(self, P, idx):
        return _take(P, idx)

    def neg_where(self, P, mask):
        f = self.f
        return EdwardsBatch(
            f._sel(mask, f.neg(P.X), P.X), P.Y, P.Z, f._sel(mask, f.neg(P.T), P.T)
        )

    def reshape(self, P, shape):
        n = self.f.n
        return jax.tree.map(lambda a: a.reshape((n, *shape) if a.shape[0] == n else shape), P)

    # --- packed fast path (EdwardsOps packed form): ONE (4*half, M) array
    #     per point set -> one lane gather + ONE fused add per pair round
    #     (the TE add is inversion-free; reference flagship TE engine) ---

    @property
    def packed_rows(self) -> int:
        return self.ed.packed_rows

    def pack_rows(self, P: EdwardsBatch):
        return self.ed.pack_rows(P)

    def unpack_rows(self, A):
        return self.ed.unpack_rows(A)

    def add_packed(self, A, B, sA, sB, valid):
        return self.ed.add_packed(A, B, sA, sB, valid)

    def buckets_from_packed(self, Bp, valid) -> EdwardsBatch:
        ub = self.ed.unpack_rows(Bp)
        f = self.f
        one = f.bc_full(f.one_mont, ub.Y)
        z = jnp.zeros_like(ub.X)
        zero = EdwardsBatch(z, one, one, z)
        return self.ed.select(valid, ub, zero)

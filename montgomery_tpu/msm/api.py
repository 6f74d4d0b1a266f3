"""High-level MSM API: curve contexts with cached jitted pipelines.

The analog of the reference's instantiation layer (parallel.ts
createWeierstraß/createTwistedEdwards + concrete singletons): build a curve
context once, then call `.msm(scalars, points)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.twisted_edwards import EdwardsParams, EdwardsPoint
from ..bigint.weierstrass import AffinePoint, CurveParams
from ..curves.affine import AffineOps
from ..curves.edwards import EdwardsOps
from ..curves.projective import ProjectiveOps
from ..ops.field import create_field_ops
from ..scalar.slicing import num_windows, signed_digits
from .adapters import AffineAccumAdapter, EdwardsAdapter, ProjectiveAdapter
from .pippenger import msm_digits, msm_digits_affine, window_size


# One context per (class, params, w) — the analog of the reference's
# per-curve singletons (concrete/bls12-377.ts:6-7). Contexts are stateless
# apart from compiled-executable caches, and sharing them means every test
# file / caller on the same curve reuses ONE set of compiled kernels.
_CTX_CACHE: dict = {}


class _MemoizedCtx:
    def __new__(cls, params, w: int = 13):
        key = (cls, params, w)
        inst = _CTX_CACHE.get(key)
        if inst is None:
            inst = super().__new__(cls)
            _CTX_CACHE[key] = inst
        return inst


class WeierstrassMsm(_MemoizedCtx):
    """MSM context for a short-Weierstrass curve (reference createWeierstraß,
    parallel.ts:40-177)."""

    def __init__(self, params: CurveParams, w: int = 13):
        if getattr(self, "_ctx_ready", False):
            return
        self._ctx_ready = True
        # w=13 (n=30 for 377-bit) measured 11% faster Montgomery muls than
        # w=12 (n=32) on TPU v5e (.logs/experiments_r4.log) — the limb-size
        # sweep the reference prescribes (doc/zprize22.md:184-185)
        self.params = params
        self.fops = create_field_ops(params.modulus, w=w)
        self.proj = ProjectiveOps(self.fops, params)
        self.affine = AffineOps(self.fops, params)
        self.adapter = ProjectiveAdapter(self.proj)
        self.aff_adapter = AffineAccumAdapter(self.affine, self.proj)
        self.aff_adapter_unsafe = AffineAccumAdapter(
            self.affine, self.proj, unsafe=True
        )
        self.scalar_bits = params.order.bit_length()
        self.glv = None
        if params.endomorphism is not None:
            from ..scalar.glv import glv_params

            self.glv = glv_params(params.order, params.endomorphism.lam)
        self._jits = {}

    # --- device entry point (traceable) ---
    def msm_device(self, points_affine, digits, c: int, window_chunk=None,
                   affine: bool = False, unsafe: bool = False):
        """affine=True uses batched-affine accumulation (reference flagship
        path); affine=False uses complete projective accumulation.
        unsafe=True skips the equal-x/infinity triage in the affine adds
        (reference msmUnsafe, msm-batched-affine.ts:585-599) — wrong results
        are possible only for adversarial inputs with colliding x inside one
        bucket; negligible for random inputs."""
        if affine:
            return msm_digits_affine(
                self.aff_adapter_unsafe if unsafe else self.aff_adapter,
                self.adapter, points_affine, digits, c,
                window_chunk=window_chunk,
            )
        P = self.adapter.from_points(points_affine)
        return msm_digits(self.adapter, P, digits, c, window_chunk=window_chunk)

    # --- host convenience ---
    def digits(self, scalars: list[int], c: int,
               scalar_bits: int | None = None) -> np.ndarray:
        """scalar_bits: optional tighter bound on the scalars (fewer windows
        -> shorter Horner chains; tests with small scalars use this, the
        full-width path is exercised by the production-shape tests)."""
        b = scalar_bits or self.scalar_bits
        sc = [s % self.params.order for s in scalars]
        assert all(v.bit_length() <= b for v in sc)
        return signed_digits(sc, b, c)

    def msm(self, scalars, points: list[AffinePoint], c: int | None = None,
            affine: bool = False, unsafe: bool = False,
            scalar_bits: int | None = None) -> AffinePoint:
        N = len(points)
        assert len(scalars) == N and N > 0
        if c is None:
            c = window_size(self.fops.mp.length_p, max(1, N.bit_length() - 1))
        d = jnp.asarray(self.digits(scalars, c, scalar_bits=scalar_bits))
        A = self.proj.affine_to_device(points)
        key = (N, d.shape[0], c, affine, unsafe)
        if key not in self._jits:
            self._jits[key] = jax.jit(
                lambda pts, dg: self.msm_device(pts, dg, c, affine=affine,
                                                unsafe=unsafe)
            )
        S = self._jits[key](A, d)
        return self.proj.to_host(S)[0]

    # --- GLV path: halved windows over the doubled point list [P, phi(P)]
    #     (reference msm-batched-affine.ts:350-421 4-variant preparation;
    #     signs live in the digits, so 2 variants suffice here) ---
    def expand_points_glv(self, A):
        """AffineBatch (N) -> AffineBatch (2N): [P..., phi(P)...]."""
        import jax.numpy as jnp

        E = self.proj.endomorphism_affine(A)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), A, E
        )

    def digits_glv(self, scalars, c: int) -> np.ndarray:
        from ..scalar.glv import signed_digits_glv

        assert self.glv is not None, "curve has no endomorphism"
        return signed_digits_glv(self.glv, scalars, c)

    def msm_glv(self, scalars, points: list[AffinePoint], c: int | None = None) -> AffinePoint:
        N = len(points)
        assert len(scalars) == N and N > 0
        if c is None:
            c = window_size(self.fops.mp.length_p, max(1, N.bit_length() - 1))
        d = jnp.asarray(self.digits_glv(scalars, c))
        A = self.proj.affine_to_device(points)
        key = ("glv", N, d.shape[0], c)
        if key not in self._jits:
            self._jits[key] = jax.jit(
                lambda pts, dg: self.msm_device(self.expand_points_glv(pts), dg, c)
            )
        S = self._jits[key](A, d)
        return self.proj.to_host(S)[0]

    # --- fully device-side pipeline: scalar limbs -> GLV digits -> MSM
    #     (the serve hot path; reference compute_msm does decomposition
    #     inside the parallel msm, scripts/zprize23/submission.ts:26-30) ---
    @property
    def glv_dev(self):
        if getattr(self, "_glv_dev", None) is None:
            from ..scalar.device import glv_device

            assert self.glv is not None, "curve has no endomorphism"
            self._glv_dev = glv_device(self.glv, w=self.fops.w)
        return self._glv_dev

    def scalars_to_limbs(self, scalars) -> np.ndarray:
        """Host ingestion: python ints or packed little-endian bytes ->
        (ns, N) int32 limb planes (vectorized numpy, no per-scalar loop)."""
        from ..scalar.device import bytes_to_limbs_np, ints_to_limbs_np

        bq = self.params.order.bit_length()
        w = self.fops.w
        ns = -(-bq // w)
        if isinstance(scalars, (bytes, bytearray)):
            nb = -(-bq // 8)
            return bytes_to_limbs_np(scalars, nb, w, ns)
        return ints_to_limbs_np(
            [s % self.params.order for s in scalars], bq, w, ns
        )

    def points_from_bytes(self, data) -> "AffineBatch":
        """Packed little-endian bytes (x || y per point, n_packed_bytes each
        coordinate) -> Montgomery-form device AffineBatch with NO per-point
        Python (reference parallel.ts pointsFromBytes :97-133: thread-sharded
        wasm fromPackedBytes + toMontgomery; here vectorized numpy limb
        extraction + ONE device to-Montgomery kernel over both coordinates).
        (0, 0) encodes the point at infinity."""
        from ..curves.projective import AffineBatch
        from ..ops import limbs as codec

        f = self.fops
        nb = f.mp.n_packed_bytes
        B = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, 2 * nb)
        N = B.shape[0]
        xl = codec.bytes_to_limbs(B[:, :nb].tobytes(), nb, f.w, f.n)
        yl = codec.bytes_to_limbs(B[:, nb:].tobytes(), nb, f.w, f.n)
        inf = ~(np.any(xl != 0, axis=0) | np.any(yl != 0, axis=0))
        both = jnp.concatenate([jnp.asarray(xl), jnp.asarray(yl)], axis=-1)
        both = f.jitted("to_montgomery")(both)
        return AffineBatch(both[:, :N], both[:, N:], jnp.asarray(inf))

    def msm_device_full(self, points_affine, scalar_limbs, c: int,
                        affine: bool = False, window_chunk=None,
                        unsafe: bool = False):
        """Traceable end-to-end step: GLV decompose + digit slicing + MSM,
        all on device. points_affine: AffineBatch (N); scalar_limbs (ns, N).

        On the batched-affine path the GLV point expansion is FUSED with the
        16-bit row packing (AffineOps.pack_rows_glv): one kernel emits packed
        rows for [P..., phi(P)...] directly, instead of a separate
        endomorphism mul + concat + pack chain (round-3 profile: the expand
        phase was ~99% dispatch overhead)."""
        from ..scalar.device import digits_glv_device

        digits = digits_glv_device(self.glv_dev, scalar_limbs, c)
        if affine:
            rows = self.affine.pack_rows_glv(points_affine)
            return msm_digits_affine(
                self.aff_adapter_unsafe if unsafe else self.aff_adapter,
                self.adapter, rows, digits, c, window_chunk=window_chunk,
                prepacked=True,
            )
        return self.msm_device(self.expand_points_glv(points_affine), digits, c,
                               affine=affine, window_chunk=window_chunk,
                               unsafe=unsafe)

    def msm_phases(self, points_affine, scalar_limbs, c: int,
                   affine: bool = True, unsafe: bool = False):
        """Run the pipeline as separately-jitted phases with a device sync
        between each, returning (result, PhaseLog) — the TPU analog of the
        reference's deferred per-phase logs attached to the msm result
        (msm-common.ts:176-214, msm-batched-affine.ts:306-339; on TPU the
        production path is ONE fused executable, so phase timing requires
        phase-split executables)."""
        from ..scalar.device import digits_glv_device
        from ..utils.timing import PhaseLog, sync
        from .pippenger import bucket_accumulate, reduce_buckets

        group = self.aff_adapter_unsafe if unsafe else self.aff_adapter
        if not affine:
            group = self.adapter
        j = self._jits
        key = ("phases", c, affine, unsafe)
        if key not in j:
            L = 1 << (c - 1)
            K_pad = num_windows(self.glv_dev.max_bits_eff, c)
            f_digits = jax.jit(lambda sl: digits_glv_device(self.glv_dev, sl, c))
            if affine:
                f_expand = jax.jit(self.affine.pack_rows_glv)
                f_acc = jax.jit(
                    lambda p, d: bucket_accumulate(group, p, d, c,
                                                   prepacked=True)[0])
                f_red = jax.jit(
                    lambda b: reduce_buckets(
                        self.adapter, group.to_projective(b), c, K_pad, L))
            else:
                f_expand = jax.jit(self.expand_points_glv)
                f_acc = jax.jit(
                    lambda p, d: bucket_accumulate(
                        group, group.from_points(p), d, c)[0])
                f_red = jax.jit(
                    lambda b: reduce_buckets(self.adapter, b, c, K_pad, L))
            j[key] = (f_digits, f_expand, f_acc, f_red)
        f_digits, f_expand, f_acc, f_red = j[key]
        log = PhaseLog()
        # warm/compile pass (excluded)
        S = f_red(f_acc(f_expand(points_affine), f_digits(scalar_limbs)))
        sync(S)
        digits = f_digits(scalar_limbs)
        P2 = f_expand(points_affine)
        buckets = f_acc(P2, digits)
        sync(buckets)

        # Timing protocol: switching executables on the axon tunnel costs
        # ~450 ms (measured: any phase timed as a single fresh call reports
        # ~450 ms + its true time, while the fused pipeline runs in ~136 ms
        # total). So each phase is called once un-timed to absorb the
        # program switch, then timed over 4 back-to-back async dispatches.
        def timed(label, fn, *args):
            out = fn(*args)
            sync(out)
            with log.phase(label):
                for _ in range(4):
                    out = fn(*args)
                sync(out)
            log.entries[-1] = (label, log.entries[-1][1] / 4)
            return out

        digits = timed("digits (GLV+slice)", f_digits, scalar_limbs)
        P2 = timed("expand (endo)", f_expand, points_affine)
        buckets = timed("accumulate", f_acc, P2, digits)
        S = timed("reduce+horner", f_red, buckets)
        return S, log

    def msm_full(self, scalars, points: list[AffinePoint], c: int | None = None,
                 affine: bool = True, unsafe: bool = False) -> AffinePoint:
        """Host entry: everything after numpy ingestion (GLV decompose, digit
        slicing, accumulation, reduction) runs in ONE jit — the serve hot
        path (reference does decomposition inside the parallel msm,
        scripts/zprize23/submission.ts:19-35). Default is the flagship
        batched-affine engine with the SAFE complete add (correct even for
        duplicate/adversarial inputs); unsafe=True gives the reference's
        msmUnsafe contract."""
        from ..curves.projective import AffineBatch

        if isinstance(points, AffineBatch):
            A, N = points, int(points.inf.shape[-1])
        else:
            N = len(points)
            A = self.proj.affine_to_device(points)
        if c is None:
            c = window_size(self.fops.mp.length_p, max(1, N.bit_length() - 1))
        if isinstance(scalars, jax.Array):
            limbs = scalars  # prepacked (ns, N) limb planes
        else:
            limbs = jnp.asarray(self.scalars_to_limbs(scalars))
        key = ("full", N, c, affine, unsafe)
        if key not in self._jits:
            self._jits[key] = jax.jit(
                lambda pts, sl: self.msm_device_full(pts, sl, c, affine=affine,
                                                     unsafe=unsafe)
            )
        S = self._jits[key](A, limbs)
        return self.proj.to_host(S)[0]


class EdwardsMsm(_MemoizedCtx):
    """MSM context for a twisted-Edwards curve (reference createTwistedEdwards,
    parallel.ts:179-289)."""

    def __init__(self, params: EdwardsParams, w: int = 13):
        if getattr(self, "_ctx_ready", False):
            return
        self._ctx_ready = True
        self.params = params
        self.fops = create_field_ops(params.modulus, w=w)
        self.ed = EdwardsOps(self.fops, params)
        self.adapter = EdwardsAdapter(self.ed)
        self.scalar_bits = params.order.bit_length()
        self._jits = {}

    def msm_device(self, points, digits, c: int, window_chunk=None):
        return msm_digits(self.adapter, points, digits, c, window_chunk=window_chunk)

    def digits(self, scalars, c: int, scalar_bits: int | None = None) -> np.ndarray:
        b = scalar_bits or self.scalar_bits
        sc = [s % self.params.order for s in scalars]
        assert all(v.bit_length() <= b for v in sc)
        return signed_digits(sc, b, c)

    def msm(self, scalars, points: list[EdwardsPoint], c: int | None = None,
            scalar_bits: int | None = None) -> EdwardsPoint:
        N = len(points)
        assert len(scalars) == N and N > 0
        if c is None:
            c = window_size(self.fops.mp.length_p, max(1, N.bit_length() - 1))
        d = jnp.asarray(self.digits(scalars, c, scalar_bits=scalar_bits))
        P = self.ed.to_device(points)
        key = (N, d.shape[0], c)
        if key not in self._jits:
            self._jits[key] = jax.jit(
                lambda pts, dg: self.msm_device(pts, dg, c)
            )
        S = self._jits[key](P, d)
        return self.ed.to_host(S)[0]

    # --- device-side digit pipeline (no GLV: TE curve has no endomorphism
    #     here; reference uses the Simple scalar module, scalar-simple.ts) ---
    def scalars_to_limbs(self, scalars) -> np.ndarray:
        from ..scalar.device import bytes_to_limbs_np, ints_to_limbs_np

        bq = self.params.order.bit_length()
        w = self.fops.w
        ns = -(-bq // w)
        if isinstance(scalars, (bytes, bytearray)):
            nb = -(-bq // 8)
            return bytes_to_limbs_np(scalars, nb, w, ns)
        return ints_to_limbs_np(
            [s % self.params.order for s in scalars], bq, w, ns
        )

    def msm_device_full(self, points, scalar_limbs, c: int):
        from ..scalar.device import signed_digits_device

        digits = signed_digits_device(scalar_limbs, self.fops.w, self.scalar_bits, c)
        return self.msm_device(points, digits, c)

    def points_from_bytes(self, data):
        """Packed little-endian affine bytes (x || y per point) -> extended-
        coordinate device batch, no per-point Python (reference parallel.ts
        pointsFromBytes analog for the TE path)."""
        from ..ops import limbs as codec

        f = self.fops
        nb = f.mp.n_packed_bytes
        B = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, 2 * nb)
        N = B.shape[0]
        xl = codec.bytes_to_limbs(B[:, :nb].tobytes(), nb, f.w, f.n)
        yl = codec.bytes_to_limbs(B[:, nb:].tobytes(), nb, f.w, f.n)
        both = jnp.concatenate([jnp.asarray(xl), jnp.asarray(yl)], axis=-1)
        both = f.jitted("to_montgomery")(both)
        return self.ed.jitted_from_affine(both[:, :N], both[:, N:])

    def msm_full(self, scalars, points, c: int | None = None) -> EdwardsPoint:
        from ..curves.edwards import EdwardsBatch

        if isinstance(points, EdwardsBatch):
            P, N = points, int(points.X.shape[-1])
        else:
            N = len(points)
            P = self.ed.to_device(points)
        if c is None:
            c = window_size(self.fops.mp.length_p, max(1, N.bit_length() - 1))
        if isinstance(scalars, jax.Array):
            limbs = scalars
        else:
            limbs = jnp.asarray(self.scalars_to_limbs(scalars))
        key = ("full", N, c)
        if key not in self._jits:
            self._jits[key] = jax.jit(lambda pts, sl: self.msm_device_full(pts, sl, c))
        S = self._jits[key](P, limbs)
        return self.ed.to_host(S)[0]

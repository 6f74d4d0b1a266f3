"""Device scalar pipeline: limb ingestion, window slicing, GLV decompose.

Mirrors the reference's GLV numeric audit (src/glv/glv-test.ts:89-133): random
and adversarial scalars checked for s0 + s1*lambda = s (mod q) and magnitude
bounds, plus digit-recombination identities and an end-to-end MSM equality.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
from montgomery_tpu.concrete import BLS12_377
from montgomery_tpu.msm import WeierstrassMsm
from montgomery_tpu.scalar.device import (
    bytes_to_limbs_np,
    decompose_device,
    digits_glv_device,
    extract_windows,
    glv_device,
    ints_to_limbs_np,
    signed_digits_device,
)
from montgomery_tpu.scalar.glv import glv_params
from montgomery_tpu.scalar.slicing import signed_digits

Q = BLS12_377.order
LAM = BLS12_377.endomorphism.lam
W = 12


def adversarial_scalars(rng, n_random=50):
    out = [0, 1, 2, Q - 1, Q - 2, (Q - 1) // 2]
    out += [(1 << k) % Q for k in (1, 63, 127, 128, 200, 252)]
    out += [rng.randrange(Q) for _ in range(n_random)]
    return out


def test_limb_ingestion_roundtrip(rng):
    vals = adversarial_scalars(rng)
    bq = Q.bit_length()
    L = ints_to_limbs_np(vals, bq, W)
    ns = L.shape[0]
    for j, v in enumerate(vals):
        got = sum(int(L[i, j]) << (i * W) for i in range(ns))
        assert got == v
    # bytes path agrees
    nb = -(-bq // 8)
    blob = b"".join(v.to_bytes(nb, "little") for v in vals)
    L2 = bytes_to_limbs_np(blob, nb, W, ns)
    assert np.array_equal(L, L2)


def test_window_extraction_matches_host(rng):
    vals = adversarial_scalars(rng)
    bq = Q.bit_length()
    L = jnp.asarray(ints_to_limbs_np(vals, bq, W))
    for c in (4, 7, 13, 16):
        d_dev = np.asarray(signed_digits_device(L, W, bq, c))
        d_host = signed_digits(vals, bq, c)
        assert np.array_equal(d_dev, d_host), f"c={c}"


def test_glv_decompose_device(rng):
    g = glv_params(Q, LAM)
    gd = glv_device(g, w=W)
    vals = adversarial_scalars(rng, n_random=200)
    L = jnp.asarray(ints_to_limbs_np(vals, Q.bit_length(), W))
    a0, n0, a1, n1 = (np.asarray(x) for x in decompose_device(gd, L))
    for j, s in enumerate(vals):
        s0 = sum(int(a0[i, j]) << (i * W) for i in range(a0.shape[0]))
        s1 = sum(int(a1[i, j]) << (i * W) for i in range(a1.shape[0]))
        if n0[j]:
            s0 = -s0
        if n1[j]:
            s1 = -s1
        assert (s0 + s1 * LAM - s) % Q == 0, f"recombination fails at {j}"
        assert abs(s0) < (1 << gd.max_bits_eff)
        assert abs(s1) < (1 << gd.max_bits_eff)


def test_glv_digits_device_recombine(rng):
    g = glv_params(Q, LAM)
    gd = glv_device(g, w=W)
    vals = adversarial_scalars(rng)
    N = len(vals)
    L = jnp.asarray(ints_to_limbs_np(vals, Q.bit_length(), W))
    c = 8
    d = np.asarray(digits_glv_device(gd, L, c))
    K = d.shape[0]
    for j, s in enumerate(vals):
        s0 = sum(int(d[k, j]) << (k * c) for k in range(K))
        s1 = sum(int(d[k, N + j]) << (k * c) for k in range(K))
        assert (s0 + s1 * LAM - s) % Q == 0, f"digit recombination fails at {j}"


def test_msm_full_device_pipeline(rng):
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    N = 16
    pts = [C.scale(rng.randrange(1, 1 << 60), C.generator) for _ in range(N)]
    sc = [rng.randrange(Q) for _ in range(N)]
    got = ctx.msm_full(sc, pts, c=7)
    exp = oracle_msm(C, sc, pts)
    assert C.equal(got, exp)

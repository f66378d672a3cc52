"""Parity tests for the fused Pallas PBS kernel vs the portable jnp path.

The kernel's math helpers are plain jnp functions; swapping the lane-roll
primitive for jnp.roll lets the whole kernel body run as a regular jnp
program ("emulation mode"), which must be bit-identical to
``ops.server.blind_rotate`` / ``external_product_ntt``. A separate test runs
one real ``pallas_call`` in interpreter mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfhe_tpu.ops import ntt as ntt_mod
from tfhe_tpu.ops import pbs_kernel as pk
from tfhe_tpu.ops import server as so
from tfhe_tpu.ops.polynomial import monomial_mul

N, P, R, BL, L, B = 256, 4, 2, 23, 1, 8


def make_ggsw(rng, extra_shape=()):
    """Shoup-consistent random GGSW in legacy layout [2, P, *extra, l, R, R, N]."""
    plan = ntt_mod.get_plan(N, P)
    g = np.stack(
        [
            rng.integers(0, plan.primes[pi], size=extra_shape + (L, R, R, N), dtype=np.uint64)
            for pi in range(P)
        ]
    )
    gs = np.empty_like(g)
    for pi in range(P):
        gs[pi] = (g[pi] << np.uint64(32)) // np.uint64(plan.primes[pi])
    return jnp.asarray(np.stack([g, gs]).astype(np.uint32))


@pytest.fixture
def jnp_roll_mode(monkeypatch):
    monkeypatch.setattr(pk, "_roll", lambda x, s, a: jnp.roll(x, s, axis=a))


def _fake_run_kernel(acc, a, ggsw, use_mxu=False):
    """Run the kernel body as plain jnp via fake refs."""
    tabs = pk._get_tables(N, P)

    class FakeRef:
        def __init__(self, arr):
            self.arr = jnp.asarray(arr)

        def __getitem__(self, idx):
            return self.arr[idx]

    class FakeOut:
        def __init__(self):
            self.parts = {}

        def __setitem__(self, idx, v):
            self.parts[idx] = v

    kernel = pk._make_step_kernel(N, P, BL, L, R, tabs, unroll=1,
                                  use_mxu=use_mxu)
    hi, lo = pk.split_u64(jnp.moveaxis(acc, 1, 0))
    consts = [
        tabs.tw_fwd, tabs.tw_fwd_sh, tabs.tw_inv, tabs.tw_inv_sh,
        tabs.twist, tabs.twist_sh, tabs.untwist, tabs.untwist_sh, tabs.upper,
        tabs.tw_fwd_col, tabs.tw_fwd_col_sh, tabs.tw_inv_col,
        tabs.tw_inv_col_sh, tabs.fwd_w8m, tabs.inv_w8m,
        tabs.fwd_bias_row, tabs.inv_bias_row,
    ]
    out_hi, out_lo = FakeOut(), FakeOut()
    kernel(
        FakeRef(jnp.asarray(a, jnp.uint32)[None, :, None]),
        FakeRef(ggsw.reshape(1, 2, P, L * R, R, N)),
        *[FakeRef(c) for c in consts],
        FakeRef(hi), FakeRef(lo), out_hi, out_lo,
    )
    ghi = jnp.stack([out_hi.parts[c] for c in range(R)])
    glo = jnp.stack([out_lo.parts[c] for c in range(R)])
    return jnp.moveaxis(pk.merge_u64(ghi, glo), 0, 1)


@pytest.mark.parametrize("use_mxu", [False, True])
def test_step_kernel_emulation_bit_exact(jnp_roll_mode, use_mxu):
    plan = ntt_mod.get_plan(N, P)
    rng = np.random.default_rng(11)
    acc = jnp.asarray(rng.integers(0, 2**64, size=(B, R, N), dtype=np.uint64))
    a = rng.integers(0, 2 * N, size=(B,), dtype=np.uint64)
    ggsw = make_ggsw(rng)
    ct1 = monomial_mul(acc, jnp.asarray(a)[:, None]) - acc
    ref = np.asarray(acc + so.external_product_ntt(ggsw, ct1, BL, L, plan))
    got = np.asarray(_fake_run_kernel(acc, a, ggsw, use_mxu=use_mxu))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("variant", ["v1", "v2", "v4"])
def test_blind_rotate_pallas_interpret_bit_exact(variant, monkeypatch):
    """One real pallas_call (interpret mode on CPU) over a short scan."""
    monkeypatch.setenv("TFHE_NTT_VARIANT", variant)
    plan = ntt_mod.get_plan(N, P)
    rng = np.random.default_rng(7)
    n_steps = 4
    bsk = make_ggsw(rng, extra_shape=(n_steps,))  # [2, P, n, l, R, R, N]
    lut = jnp.asarray(rng.integers(0, 2**64, size=(B, R, N), dtype=np.uint64))
    mask = jnp.asarray(rng.integers(0, 2 * N, size=(B, n_steps), dtype=np.uint64))
    body = jnp.asarray(rng.integers(0, 2 * N, size=(B,), dtype=np.uint64))
    ref = so.blind_rotate(lut, mask, body, bsk, BL, L, plan)
    got = pk.blind_rotate_pallas(
        lut, mask, body, pk.bsk_to_scan_layout(bsk), BL, L, plan
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_v4_point_order_and_transform_roundtrip():
    """The v4 frequency map and fwd/inv contract, against plan order."""
    plan = ntt_mod.get_plan(N, P)
    tabs4 = pk._get_tables_v4(N, P, BL)
    G = N // 128
    rng = np.random.default_rng(5)
    # small signed digits through the v4 forward == permuted plan.fwd_digits
    d = rng.integers(-(1 << (BL - 1)), (1 << (BL - 1)) + 1,
                     size=(8, N), dtype=np.int64)
    ref_pts = np.asarray(plan.fwd_digits(jnp.asarray(d)))  # [P, 8, N]
    d3 = jnp.moveaxis(
        pk.to_transposed_layout(jnp.asarray(d).astype(jnp.int32), G), 1, 0)
    t4c = {
        "fwd_w8": jnp.asarray(tabs4.fwd_w8), "inv_w8": jnp.asarray(tabs4.inv_w8),
        "tw": jnp.asarray(tabs4.tw), "tw_inv": jnp.asarray(tabs4.tw_inv),
        "gw_fwd": jnp.asarray(tabs4.gw_fwd), "gw_inv": jnp.asarray(tabs4.gw_inv),
        "inv_bias": jnp.asarray(tabs4.inv_bias), "log_g": tabs4.log_g,
        "mxu_consts": tuple(
            (int(tabs4.c16[i]), int(tabs4.c16_sh[i]), int(tabs4.one_sh[i]))
            for i in range(P)),
    }
    Ld = pk._split_digits_i8(d3, tabs4.nl_in, tabs4.in_offset)
    for pi in range(P):
        p = np.uint32(plan.primes[pi])
        p2 = np.uint32(2 * int(plan.primes[pi]))
        got = np.asarray(pk._fwd_ntt_v4(Ld, pi, t4c, p, p2, 8, G)) % int(p)
        got_flat = np.moveaxis(got, 0, 1).reshape(8, G * 128)
        exp = ref_pts[pi][:, tabs4.perm_from_plan]
        assert np.array_equal(got_flat, exp.astype(np.uint32))
        # inverse returns the standard-domain digits (canonical residues)
        back = np.asarray(pk._inv_ntt_v4(
            jnp.asarray(got.astype(np.uint32)), pi, t4c, p, p2, 8, G))
        want = np.where(d < 0, d + int(p), d).astype(np.uint32)
        assert np.array_equal(
            np.asarray(pk.from_transposed_layout(
                jnp.moveaxis(jnp.asarray(back), 0, 1))), want)


def test_layout_roundtrip():
    rng = np.random.default_rng(3)
    bsk = make_ggsw(rng, extra_shape=(5,))
    scan = pk.bsk_to_scan_layout(bsk)
    back = pk.scan_to_legacy_layout(scan, L)
    assert np.array_equal(np.asarray(bsk), np.asarray(back))


def test_keyswitch_mxu_bit_exact():
    rng = np.random.default_rng(3)
    n_in, l, n_out, bl, bsz = 256, 5, 130, 3, 7
    ksk = rng.integers(0, 2**64, size=(n_in, l, n_out + 1), dtype=np.uint64)
    ct = rng.integers(0, 2**64, size=(bsz, n_in + 1), dtype=np.uint64)
    ref = so.keyswitch(jnp.asarray(ct), jnp.asarray(ksk), bl, l)
    ksk8 = so.ksk_to_i8_limbs(ksk, bl)
    new = so.keyswitch_mxu(jnp.asarray(ct), jnp.asarray(ksk8), bl, l)
    assert np.array_equal(np.asarray(ref), np.asarray(new))


def test_blind_rotate_pallas_acc32_bit_exact(monkeypatch):
    """acc32 mode (single-plane accumulator, increments rounded to 2^32
    multiples) vs the jnp oracle's acc_round32 twin — bit-exact."""
    monkeypatch.setenv("TFHE_NTT_VARIANT", "v4")
    monkeypatch.setenv("TFHE_V4_ACC", "32")
    plan = ntt_mod.get_plan(N, P)
    rng = np.random.default_rng(17)
    n_steps = 4
    bsk = make_ggsw(rng, extra_shape=(n_steps,))
    lut = jnp.asarray(rng.integers(0, 2**64, size=(B, R, N), dtype=np.uint64))
    mask = jnp.asarray(
        rng.integers(0, 2 * N, size=(B, n_steps), dtype=np.uint64))
    body = jnp.asarray(rng.integers(0, 2 * N, size=(B,), dtype=np.uint64))
    ref = so.blind_rotate(lut, mask, body, bsk, BL, L, plan,
                          acc_round32=True)
    got = pk.blind_rotate_pallas(
        lut, mask, body, pk.bsk_to_scan_layout(bsk), BL, L, plan
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    # the rounding contract: every output limb pair has a zero lo half
    assert bool((np.asarray(got) & np.uint64(0xFFFFFFFF) == 0).all())


def test_mul_hi_approx_and_condsub_wide_contracts():
    """The approx-Shoup primitives' documented bounds: q undershoots the
    exact high product by at most 2, and the compare-free condsub matches
    the reference select for x < c + 2^31."""
    rng = np.random.default_rng(23)
    a = jnp.asarray(rng.integers(0, 1 << 32, 4096, np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, 4096, np.int64).astype(np.uint32))
    q_exact = np.asarray(pk._mul_hi(a, b)).astype(np.int64)
    q_approx = np.asarray(pk._mul_hi_approx(a, b)).astype(np.int64)
    d = q_exact - q_approx
    assert d.min() >= 0 and d.max() <= 2, (d.min(), d.max())
    ref = ((np.asarray(a).astype(np.uint64) * np.asarray(b).astype(np.uint64))
           >> np.uint64(32)).astype(np.int64)
    assert np.array_equal(q_exact, ref)

    p = np.uint32(0x3FAC0001)
    x = jnp.asarray(rng.integers(0, 4 * int(p), 4096,
                                 np.int64).astype(np.uint32))
    got = np.asarray(pk._condsub_wide(x, np.uint32(2) * p))
    want = np.where(np.asarray(x) >= 2 * int(p),
                    np.asarray(x) - 2 * int(p), np.asarray(x))
    assert np.array_equal(got, want.astype(np.uint32))


def test_shoup_modes_agree_mod_p():
    """exact and approx _shoup agree mod p and both stay < 2p (with a TRUE
    Shoup dual — the contract both modes require)."""
    import importlib
    import os

    rng = np.random.default_rng(29)
    p = 0x3F5A0001
    a = jnp.asarray(rng.integers(0, 1 << 32, 2048, np.int64).astype(np.uint32))
    w = np.uint32(987654321 % p)
    wsh = np.uint32((int(w) << 32) // p)
    outs = {}
    old = os.environ.get("TFHE_V4_SHOUP")
    try:
        for mode in ("exact", "approx"):
            os.environ["TFHE_V4_SHOUP"] = mode
            importlib.reload(pk)
            outs[mode] = np.asarray(
                pk._shoup(a, jnp.uint32(w), jnp.uint32(wsh), jnp.uint32(p))
            ).astype(np.int64)
    finally:
        if old is None:
            os.environ.pop("TFHE_V4_SHOUP", None)
        else:
            os.environ["TFHE_V4_SHOUP"] = old
        importlib.reload(pk)
    for mode, r in outs.items():
        assert (r < 2 * p).all(), mode
    assert ((outs["exact"] - outs["approx"]) % p == 0).all()

"""Shortint server key: LUT machinery + the KS->PBS atomic pattern + leveled ops.

Reference: ``tfhe/src/shortint/server_key/mod.rs`` (generate_lookup_table:805,
apply_lookup_table:935, fill_accumulator_with_encoding in engine/mod.rs:80),
``shortint/atomic_pattern/standard.rs:155`` (KS->PBS order),
``server_key/{add,sub,neg,scalar_add,scalar_mul,bivariate_pbs}.rs``.

The server key holds device arrays (KSK + NTT-domain BSK); every op is a
batched jitted JAX function taking the key arrays as arguments (so the 100s
of MB of key material is NOT burned into executables).
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from ..core import algorithms as algo
from ..ops import ntt as ntt_mod
from ..ops import server as server_ops
from ..utils.encoding import ShortintEncoding
from ..utils.params import ClassicPBSParameters, EncryptionKeyChoice, ModulusSwitchType
from .ciphertext import NOMINAL_NOISE, LookupTable, ManyLookupTable, ShortintCiphertext
from .client_key import ClientKey

_jitted_ks_pbs_cache: dict = {}


def use_pallas_default() -> bool:
    """The fused Pallas kernels run on the TPU backend; the portable jnp
    path covers CPU (tests, fallback)."""
    import jax

    return jax.default_backend() != "cpu"


#: default transform variant for the classic-PBS hot path. "v6b" = the
#: 2-prime BNF kernel over the FAST28 sub-2^29 prime pair with lazy
#: in-kernel reduction (ops/bnf2.py Bnf2Flavor; 2,116 PBS/s, +2.4% over
#: "v6", BENCH_HISTORY 2026-08-20); "v6" = the same kernel over the
#: ~30-bit DEFAULT pair; "v5" = the single-prime Goldilocks/BNF kernel
#: (ops/pbs_kernel_g.py); "crt" = the exact 4-prime CRT path (v1-v4
#: kernels, ops/pbs_kernel.py). Override with TFHE_NTT_VARIANT;
#: ineligible shapes (multi-bit, N outside the kernel envelope, wide
#: decompositions) and noise-margin failures fall back v6b -> v6 -> crt.
_DEFAULT_VARIANT = "v6b"


def variant_noise_margin_ok(p, variant: str, margin: float = 0.05) -> bool:
    """Noise-BUDGET gate for the approximate BNF kernels (ADVICE r3 /
    VERDICT r4 Missing #6): an approximate variant is selected only when
    its extra transform variance (``core.noise_formulas.
    bnf_blind_rotate_extra_variance``, empirically validated in
    tests/test_noise.py) is <= ``margin`` x the exact path's own
    blind-rotation variance at THIS parameter set — the kernel then adds
    <2.5% to the output noise std and the set's pfail budget is
    preserved. Shape eligibility alone no longer selects an approximate
    kernel. Called with a params object; returns True for 'crt'."""
    if variant == "crt":
        return True
    from ..core import noise_formulas as nf
    from ..ops import bnf2 as b2
    from ..ops import goldilocks as gl

    q = 2.0 ** 64
    bsk_var_torus = p.glwe_noise_distribution.variance(q) / q ** 2
    exact = nf.blind_rotate_additive_variance_exact(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level, bsk_var_torus)
    mod = {"v6": float(b2.QP), "v6b": float(b2.FAST28.qp)}.get(
        variant, float(gl.P))
    extra = nf.bnf_blind_rotate_extra_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level,
        transform_modulus=mod,
        acc32=(variant in ("v6", "v6b")
               and os.environ.get("TFHE_V4_ACC", "32") == "32"))
    return extra <= margin * exact


def resolve_variant(poly_size: int, pbs_base_log: int, pbs_levels: int,
                    grouping: int = 0, params=None) -> str:
    """'v6', 'v5' or 'crt' for the given PBS shape, honoring
    TFHE_NTT_VARIANT. When a params object is given, approximate variants
    must ALSO pass the :func:`variant_noise_margin_ok` budget gate."""
    import os

    from ..ops import bnf2 as b2
    from ..ops import pbs_kernel_g as pkg

    v = os.environ.get("TFHE_NTT_VARIANT", _DEFAULT_VARIANT)
    if (v in ("v6", "v6b") and not grouping
            and b2.eligible(poly_size, pbs_base_log, pbs_levels)):
        if params is None or variant_noise_margin_ok(params, v):
            return v
        # v6b's larger (2^-57) rescale noise may fail a tight budget the
        # DEFAULT-pair v6 still passes: degrade one notch before crt
        if (v == "v6b" and params is not None
                and variant_noise_margin_ok(params, "v6")):
            return "v6"
    if (v == "v5" and not grouping
            and pkg.eligible(poly_size, pbs_base_log, pbs_levels)
            and (params is None or variant_noise_margin_ok(params, "v5"))):
        return "v5"
    return "crt"


def _get_ks_pbs_fn(key_shape_sig, ks_base_log, ks_levels, pbs_base_log, pbs_levels,
                   poly_size, num_primes, centered_ms, use_pallas, grouping=0,
                   ks32=False, order="ks_pbs", variant="crt", drift=None):
    """One compiled atomic-pattern pipeline per parameter signature.

    ``order``: 'ks_pbs' (standard KS->PBS), 'pbs_ks' (small-key ciphertexts,
    atomic_pattern/standard.rs:155-190 BootstrapKeyswitch order). ``ks32``:
    the keyswitch lands on a u32 modulus and the PBS mod-switches from 32
    bits (atomic_pattern/ks32.rs).

    The keyswitch is always the int8-MXU matmul path; the PBS dispatches to
    the fused Pallas blind-rotation kernel on TPU or the jnp path on CPU.
    """
    import jax
    import jax.numpy as jnp

    sig = (key_shape_sig, ks_base_log, ks_levels, pbs_base_log, pbs_levels,
           poly_size, num_primes, centered_ms, use_pallas, grouping, ks32,
           order, variant, drift)
    if sig in _jitted_ks_pbs_cache:
        return _jitted_ks_pbs_cache[sig]
    plan = ntt_mod.get_plan(poly_size, num_primes)
    in_bits = 32 if ks32 else 64

    if variant in ("v6", "v6b") and not grouping:
        from ..ops import bnf2 as _b2

        _fl = _b2.FAST28 if variant == "v6b" else _b2.DEFAULT

        def _pbs(ct_small, lut_acc, bsk):
            return server_ops.programmable_bootstrap_bnf2(
                ct_small, lut_acc, bsk, pbs_base_log, pbs_levels,
                centered_ms=centered_ms, input_torus_bits=in_bits,
                use_pallas=use_pallas, flavor=_fl,
            )
    elif variant == "v5" and not grouping:
        def _pbs(ct_small, lut_acc, bsk):
            return server_ops.programmable_bootstrap_goldilocks(
                ct_small, lut_acc, bsk, pbs_base_log, pbs_levels,
                centered_ms=centered_ms, input_torus_bits=in_bits,
                use_pallas=use_pallas,
            )
    elif grouping:
        def _pbs(ct_small, lut_acc, bsk):
            return server_ops.multi_bit_programmable_bootstrap(
                ct_small, lut_acc, bsk[0],
                pbs_base_log, pbs_levels, grouping, plan,
            )
    elif use_pallas:
        def _pbs(ct_small, lut_acc, bsk):
            return server_ops.programmable_bootstrap_pallas(
                ct_small, lut_acc, bsk, pbs_base_log, pbs_levels, plan,
                centered_ms=centered_ms, input_torus_bits=in_bits,
            )
    else:
        def _pbs(ct_small, lut_acc, bsk):
            from ..ops.pbs_kernel import scan_to_legacy_layout

            return server_ops.programmable_bootstrap(
                ct_small, lut_acc, scan_to_legacy_layout(bsk, pbs_levels),
                pbs_base_log, pbs_levels, plan, centered_ms=centered_ms,
                input_torus_bits=in_bits,
            )

    if drift is not None:
        # drift-technique MS noise reduction (ModulusSwitchType::
        # DriftTechniqueNoiseReduction): add the chosen encryption of zero
        # BEFORE the PBS's (standard) modulus switch. ``bsk`` arrives as a
        # (bsk, modulus_switch_zeros) tuple — the zeros are key material
        # (reference shortint/server_key/modulus_switch_noise_reduction.rs).
        r_sigma, ms_bound, ms_input_var = drift
        log_mod = poly_size.bit_length()
        _pbs_core = _pbs

        def _pbs(ct_small, lut_acc, bsk):
            bsk_arr, ms_zeros = bsk
            improved = server_ops.improve_drift_ms(
                ct_small, ms_zeros, r_sigma, ms_bound, ms_input_var,
                log_mod, torus_bits=in_bits)
            return _pbs_core(improved, lut_acc, bsk_arr)

    def _ks(ct, ksk_i8):
        if ks32:
            return server_ops.keyswitch_mxu32(ct, ksk_i8, ks_base_log, ks_levels)
        return server_ops.keyswitch_mxu(ct, ksk_i8, ks_base_log, ks_levels)

    if order == "pbs_ks":
        @jax.jit
        def ks_pbs(ct, lut_acc, ksk_i8, bsk):
            big = _pbs(ct, lut_acc, bsk)
            return _ks(big, ksk_i8)
    else:
        @jax.jit
        def ks_pbs(ct, lut_acc, ksk_i8, bsk):
            small = _ks(ct, ksk_i8)
            return _pbs(small, lut_acc, bsk)

    @jax.jit
    def pbs_only(ct_small, lut_acc, bsk):
        return _pbs(ct_small, lut_acc, bsk)

    @jax.jit
    def ks_only(ct, ksk_i8):
        return _ks(ct, ksk_i8)

    fns = (ks_pbs, pbs_only, ks_only)
    _jitted_ks_pbs_cache[sig] = fns
    return fns


@dataclass
class ServerKey:
    params: ClassicPBSParameters
    ksk: Any  # jnp u64[n_big, l_ks, n_small+1] (canonical form, serialization)
    ksk_i8: Any  # jnp int8[n_big*l_ks, (n_small+1)*8] — MXU limb form
    bsk_scan: Any  # jnp u32[n_small, 2, P, l_pbs*(k+1), k+1, N] — kernel form
    num_primes: int
    max_degree: int = 0
    #: drift-technique MS noise reduction: encryptions of zero under the
    #: small LWE key, u64[zeros_count, n+1] (None unless the parameter set
    #: selects ModulusSwitchType.DRIFT_TECHNIQUE_NOISE_REDUCTION; reference
    #: shortint/server_key/modulus_switch_noise_reduction.rs ::new)
    ms_zeros: Any = None

    @property
    def bsk_hat(self) -> Any:
        """Legacy [2, P, n, l, k+1, k+1, N] layout (jnp reference path)."""
        from ..ops.pbs_kernel import scan_to_legacy_layout

        return scan_to_legacy_layout(self.bsk_scan, self.params.pbs_level)

    # ------------------------------------------------------------------
    # transform-variant selection (classic PBS hot path)
    # ------------------------------------------------------------------
    @property
    def ntt_variant(self) -> str:
        """'v6' (2-prime BNF kernel, the shipped default for eligible
        shapes), 'v5' (Goldilocks single-prime BNF) or 'crt' (exact 4-prime
        Garner fallback) — resolved per TFHE_NTT_VARIANT + shape
        eligibility (see ``resolve_variant``)."""
        p = self.params
        return resolve_variant(
            p.polynomial_size, p.pbs_base_log, p.pbs_level,
            getattr(p, "grouping_factor", 0) or 0, params=p)

    @property
    def bsk_scan_g(self) -> Any:
        """Goldilocks NTT-domain BSK u32[n, 2, l*R, R, G, 128], derived
        lazily. generate() pre-seeds the cache from the raw standard-domain
        key; for deserialized keys it is recovered EXACTLY from the CRT
        form (the 4-prime NTT is an exact invertible map on u64 polys)."""
        cached = getattr(self, "_bsk_g_cache", None)
        if cached is None:
            from ..ops import goldilocks as gl

            p = self.params
            res = self.bsk_hat[0].astype("uint64")  # [P, n, l, R, R, N]
            std = self._plan.reconstruct_u64(self._plan.inv(res))
            object.__setattr__(self, "_bsk_g_cache",
                               gl.bootstrap_key_to_goldilocks(std))
            cached = self._bsk_g_cache
        return cached

    def _bsk_b(self, flavor=None) -> Any:
        """v6/v6b 2-prime BNF BSK u32[n, 2, 2, l*R, R, N] for the given
        ``bnf2.Bnf2Flavor`` (None = DEFAULT), derived lazily and EXACTLY
        from the stored CRT form (see ``bsk_scan_g``)."""
        from ..ops import bnf2 as b2

        fl = flavor or b2.DEFAULT
        caches = getattr(self, "_bsk_b_caches", None)
        if caches is None:
            caches = {}
            object.__setattr__(self, "_bsk_b_caches", caches)
        key = fl.primes
        if caches.get(key) is None:
            res = self.bsk_hat[0].astype("uint64")  # [P, n, l, R, R, N]
            std = self._plan.reconstruct_u64(self._plan.inv(res))
            caches[key] = b2.bootstrap_key_to_bnf2(std, flavor=fl)
        return caches[key]

    @property
    def bsk_scan_b(self) -> Any:
        """DEFAULT-flavor v6 BSK (back-compat property)."""
        return self._bsk_b()

    def _bsk_b_k(self, flavor=None) -> Any:
        """v6/v6b BSK pre-permuted to the kernel's frequency order
        u32[n, 2, 2, l*R, R, G, 128] (``pbs_kernel.bsk_scan_to_kernel_order``
        — the permutation depends only on N, so it is flavor-agnostic).
        Hoists a whole-key gather out of the jitted rotation; the
        spec-layout copy is dropped after conversion (exactly recoverable)
        to avoid holding two whole keys in HBM."""
        from ..ops import bnf2 as b2
        from ..ops.pbs_kernel import bsk_scan_to_kernel_order

        fl = flavor or b2.DEFAULT
        caches = getattr(self, "_bsk_bk_caches", None)
        if caches is None:
            caches = {}
            object.__setattr__(self, "_bsk_bk_caches", caches)
        key = fl.primes
        if caches.get(key) is None:
            caches[key] = bsk_scan_to_kernel_order(
                self._bsk_b(fl), self.params.pbs_base_log)
            self._bsk_b_caches[key] = None  # free the spec-layout copy
        return caches[key]

    @property
    def bsk_scan_b_k(self) -> Any:
        """DEFAULT-flavor kernel-order v6 BSK (back-compat property)."""
        return self._bsk_b_k()

    @property
    def _drift(self):
        """(r_sigma, bound, input_variance) when the parameter set selects
        drift-technique MS noise reduction, else None."""
        p = self.params
        d = getattr(p, "modulus_switch_noise_reduction_params", None)
        if (p.modulus_switch_type
                == ModulusSwitchType.DRIFT_TECHNIQUE_NOISE_REDUCTION
                and d is not None and self.ms_zeros is not None):
            return (d.ms_r_sigma_factor, d.ms_bound, d.ms_input_variance)
        return None

    @property
    def pbs_bsk(self) -> Any:
        """The NTT-domain BSK for the active transform variant (what the
        compiled ks_pbs/pbs_only pipelines expect as their ``bsk`` arg).
        Drift-MS parameter sets get a (bsk, modulus_switch_zeros) tuple."""
        v = self.ntt_variant
        if v in ("v6", "v6b"):
            from ..ops import bnf2 as b2

            fl = b2.FAST28 if v == "v6b" else b2.DEFAULT
            base = (self._bsk_b_k(fl) if use_pallas_default()
                    else self._bsk_b(fl))
        else:
            base = self.bsk_scan_g if v == "v5" else self.bsk_scan
        if self._drift is not None:
            return (base, self.ms_zeros)
        return base

    # ------------------------------------------------------------------
    @classmethod
    def generate(cls, client_key: ClientKey, reference_forks: bool = False) -> "ServerKey":
        """BSK (GGSW of each small-key bit under the GLWE key, glwe noise)
        then KSK (big -> small, lwe noise) — engine/server_side.rs order.

        ``reference_forks=True`` draws the BSK with the reference's
        hierarchical fork layout and sequential rejection sampling
        (utils/fork_budgets.py) instead of the batched draw — same key
        quality, reference-compatible stream consumption."""
        import jax.numpy as jnp

        p = client_key.params
        gen = client_key._keygen_gen
        grouping = getattr(p, "grouping_factor", 0) or 0
        if grouping:
            bsk = algo.gen_multi_bit_bootstrap_key(
                client_key.lwe_sk, client_key.glwe_sk, p.pbs_base_log,
                p.pbs_level, grouping, p.glwe_noise_distribution, gen,
            )
        elif reference_forks:
            from ..utils.fork_budgets import gen_bootstrap_key_reference_forks

            bsk = gen_bootstrap_key_reference_forks(
                client_key.lwe_sk,
                client_key.glwe_sk,
                p.pbs_base_log,
                p.pbs_level,
                p.glwe_noise_distribution,
                gen,
            )
        else:
            bsk = algo.gen_bootstrap_key(
                client_key.lwe_sk,
                client_key.glwe_sk,
                p.pbs_base_log,
                p.pbs_level,
                p.glwe_noise_distribution,
                gen,
            )
        if cls._is_ks32(p):
            ksk = algo.gen_keyswitch_key32(
                client_key.big_lwe_sk, client_key.lwe_sk, p.ks_base_log,
                p.ks_level, p.lwe_noise_distribution, gen,
            )
        else:
            ksk = algo.gen_keyswitch_key(
                client_key.big_lwe_sk,
                client_key.lwe_sk,
                p.ks_base_log,
                p.ks_level,
                p.lwe_noise_distribution,
                gen,
            )
        ms_zeros = None
        drift_p = getattr(p, "modulus_switch_noise_reduction_params", None)
        if (p.modulus_switch_type
                == ModulusSwitchType.DRIFT_TECHNIQUE_NOISE_REDUCTION
                and drift_p is not None):
            # encryptions of zero under the SMALL lwe key (the PBS input
            # key), lwe noise — modulus_switch_noise_reduction.rs ::new
            zero_pts = np.zeros(drift_p.modulus_switch_zeros_count,
                                dtype=np.uint64)
            enc = algo.lwe_encrypt32 if cls._is_ks32(p) else algo.lwe_encrypt
            ms_zeros = jnp.asarray(
                enc(client_key.lwe_sk, zero_pts, p.lwe_noise_distribution,
                    gen))
        num_primes = cls._num_primes_for(p)
        bsk_hat = algo.bootstrap_key_to_ntt(bsk, num_primes)
        max_degree = p.message_modulus * p.carry_modulus - 1
        from ..ops.pbs_kernel import bsk_to_scan_layout

        if grouping:
            # multi-bit: residues kept as [2, P, n/g, 2^g-1, l, R, R, N]
            bsk_stored = bsk_hat.residues
        else:
            bsk_stored = bsk_to_scan_layout(bsk_hat.residues)
        if cls._is_ks32(p):
            ksk_i8 = server_ops.ksk32_to_i8_limbs(ksk.data, p.ks_base_log)
        else:
            ksk_i8 = server_ops.ksk_to_i8_limbs(ksk.data, p.ks_base_log)
        return cls(
            params=p,
            ksk=jnp.asarray(ksk.data),
            ksk_i8=jnp.asarray(ksk_i8),
            bsk_scan=bsk_stored,
            num_primes=num_primes,
            max_degree=max_degree,
            ms_zeros=ms_zeros,
        )

    @staticmethod
    def _is_ks32(p) -> bool:
        """KS32 atomic pattern: post-keyswitch ciphertexts live on a u32
        modulus (KeySwitch32PBSParameters, atomic_pattern/ks32.rs)."""
        mod = getattr(p, "post_keyswitch_ciphertext_modulus", None)
        return mod is not None and mod.bits == 32

    @staticmethod
    def _num_primes_for(p: ClassicPBSParameters) -> int:
        bound = ntt_mod.polymul_bound_bits(
            p.pbs_base_log,
            p.polynomial_size,
            num_sums=p.pbs_level * p.glwe_size,
        )
        grouping = getattr(p, "grouping_factor", 0) or 0
        if grouping:
            # combined multi-bit GGSW coefficients grow by prod of
            # (X^a - 1) expansions: sum over subsets 2^|S| = 3^g
            bound += grouping * 1.585
        return ntt_mod.min_primes_for_bound(bound)

    # ------------------------------------------------------------------
    @property
    def _plan(self) -> ntt_mod.NegacyclicNtt:
        return ntt_mod.get_plan(self.params.polynomial_size, self.num_primes)

    @property
    def _ap_order(self) -> str:
        """'ks_pbs' for big-key ciphertexts, 'pbs_ks' for small-key
        (EncryptionKeyChoice, atomic_pattern/standard.rs:155-190)."""
        return (
            "pbs_ks"
            if self.params.encryption_key_choice == EncryptionKeyChoice.SMALL
            else "ks_pbs"
        )

    @property
    def _fns(self):
        p = self.params
        return _get_ks_pbs_fn(
            (self.ksk.shape, self.bsk_scan.shape),
            p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
            p.polynomial_size, self.num_primes,
            p.modulus_switch_type == ModulusSwitchType.CENTERED_MEAN_NOISE_REDUCTION,
            use_pallas_default(),
            grouping=getattr(p, "grouping_factor", 0) or 0,
            ks32=self._is_ks32(p),
            order=self._ap_order,
            variant=self.ntt_variant,
            drift=self._drift,
        )

    @property
    def encoding(self) -> ShortintEncoding:
        p = self.params
        return ShortintEncoding(
            ciphertext_modulus=p.ciphertext_modulus,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            padding_bit=True,
        )

    # ------------------------------------------------------------------
    # lookup tables
    # ------------------------------------------------------------------
    def generate_lookup_table(self, f: Callable[[int], int]) -> LookupTable:
        """Accumulator layout per engine/mod.rs:80-141: one box of
        N/(mm*cm) repeated slots per input value, first half-box negated and
        rotated out to center the boxes on the mod-switch grid."""
        import jax.numpy as jnp

        p = self.params
        N = p.polynomial_size
        mod_sup = p.message_modulus * p.carry_modulus
        box = N // mod_sup
        enc = self.encoding
        fe = np.array([int(f(int(x))) for x in range(mod_sup)], dtype=np.uint64)
        max_value = int(fe.max())
        encoded = np.array([enc.encode(int(v)) for v in fe], dtype=np.uint64)
        body = np.repeat(encoded, box)
        half = box // 2
        with np.errstate(over="ignore"):
            body[:half] = np.uint64(0) - body[:half]
        body = np.roll(body, -half)
        acc = np.zeros((p.glwe_size, N), dtype=np.uint64)
        acc[-1] = body
        return LookupTable(acc=jnp.asarray(acc), degree=max_value)

    def generate_many_lookup_table(self, fns) -> "ManyLookupTable":
        """Pack several functions into ONE accumulator as consecutive
        sub-LUTs: after a single blind rotation, sample-extracting at
        ``fn_idx * sub_lut_size`` yields one LWE per function
        (engine/mod.rs:168 fill_many_lut_accumulator,
        shortint/server_key/mod.rs:622-632). The input ciphertext degree must
        be <= mod_sup/len(fns) - 1 so the rotation stays inside sub-LUT 0."""
        import jax.numpy as jnp

        p = self.params
        N = p.polynomial_size
        mod_sup = p.message_modulus * p.carry_modulus
        box = N // mod_sup
        k = len(fns)
        assert k <= mod_sup // 2, f"at most {mod_sup // 2} functions"
        max_degree = mod_sup // k - 1
        sub_size = (max_degree + 1) * box
        enc = self.encoding
        body = np.zeros(N, dtype=np.uint64)
        out_degrees = []
        for i, f in enumerate(fns):
            deg = 0
            for v in range(max_degree + 1):
                val = int(f(v))
                deg = max(deg, val)
                body[i * sub_size + v * box : i * sub_size + (v + 1) * box] = (
                    enc.encode(val)
                )
            out_degrees.append(deg)
        half = box // 2
        with np.errstate(over="ignore"):
            body[:half] = np.uint64(0) - body[:half]
        body = np.roll(body, -half)
        acc = np.zeros((p.glwe_size, N), dtype=np.uint64)
        acc[-1] = body
        return ManyLookupTable(
            acc=jnp.asarray(acc),
            degrees=out_degrees,
            stride=sub_size,
            count=k,
            max_input_degree=max_degree,
        )

    def apply_many_lookup_table(
        self, ct: ShortintCiphertext, many: "ManyLookupTable"
    ) -> list:
        """ONE KS + blind rotation, k sample extractions."""
        import jax.numpy as jnp

        from ..ops import server as server_ops
        from ..ops.pbs_kernel import scan_to_legacy_layout

        assert ct.under_key == "big"
        assert ct.degree <= many.max_input_degree, (
            f"input degree {ct.degree} exceeds the many-LUT limit "
            f"{many.max_input_degree}"
        )
        p = self.params
        plan = self._plan
        _, _, ks = self._fns
        from ..utils import trace

        trace.add_pbs(int(np.prod(ct.ct.shape[:-1])) or 1)
        trace.add_ks(int(np.prod(ct.ct.shape[:-1])) or 1)
        small = ks(ct.ct, self.ksk_i8)
        N = p.polynomial_size
        log_modulus = N.bit_length()
        centered = p.modulus_switch_type == ModulusSwitchType.CENTERED_MEAN_NOISE_REDUCTION
        if centered:
            msm, msb = server_ops.lwe_centered_binary_modulus_switch(small, log_modulus)
        else:
            msm, msb = server_ops.lwe_standard_modulus_switch(small, log_modulus)
        batch = small.shape[:-1]
        lut_b = jnp.broadcast_to(many.acc, batch + many.acc.shape)
        variant = self.ntt_variant
        if variant == "v5":
            from ..ops import goldilocks as gl
            from ..ops import pbs_kernel_g as pkg

            flat_lut = lut_b.reshape((-1,) + many.acc.shape)
            Bflat = flat_lut.shape[0]
            pad = (-Bflat) % 8
            mm_ = msm.reshape(-1, msm.shape[-1])
            mb_ = msb.reshape(-1)
            if pad:
                flat_lut = jnp.concatenate([flat_lut, flat_lut[:pad]], 0)
                mm_ = jnp.concatenate([mm_, mm_[:pad]], 0)
                mb_ = jnp.concatenate([mb_, mb_[:pad]], 0)
            if use_pallas_default():
                rotated = pkg.blind_rotate_goldilocks_pallas(
                    flat_lut, mm_, mb_, self.bsk_scan_g,
                    p.pbs_base_log, p.pbs_level, batch_tile=8)
            else:
                rotated = gl.blind_rotate_goldilocks(
                    flat_lut, mm_, mb_, self.bsk_scan_g,
                    p.pbs_base_log, p.pbs_level)
            if pad:
                rotated = rotated[:Bflat]
            rotated = rotated.reshape(batch + many.acc.shape)
        elif use_pallas_default() and not getattr(p, "grouping_factor", 0):
            from ..ops import pbs_kernel as pk

            flat_lut = lut_b.reshape((-1,) + many.acc.shape)
            Bflat = flat_lut.shape[0]
            pad = (-Bflat) % 8
            mm_ = msm.reshape(-1, msm.shape[-1])
            mb_ = msb.reshape(-1)
            if pad:
                flat_lut = jnp.concatenate([flat_lut, flat_lut[:pad]], 0)
                mm_ = jnp.concatenate([mm_, mm_[:pad]], 0)
                mb_ = jnp.concatenate([mb_, mb_[:pad]], 0)
            rotated = pk.blind_rotate_pallas(
                flat_lut, mm_, mb_, self.bsk_scan, p.pbs_base_log, p.pbs_level, plan
            )
            if pad:
                rotated = rotated[:Bflat]
            rotated = rotated.reshape(batch + many.acc.shape)
        else:
            rotated = server_ops.blind_rotate(
                lut_b, msm, msb,
                scan_to_legacy_layout(self.bsk_scan, p.pbs_level),
                p.pbs_base_log, p.pbs_level, plan,
            )
        outs = []
        for i in range(many.count):
            lwe = server_ops.sample_extract(rotated, nth=i * many.stride)
            outs.append(
                ShortintCiphertext(
                    ct=lwe, degree=many.degrees[i], noise_level=NOMINAL_NOISE,
                    message_modulus=ct.message_modulus,
                    carry_modulus=ct.carry_modulus, under_key="big",
                )
            )
        return outs

    def generate_msg_lookup_table(self, f, modulus: Optional[int] = None) -> LookupTable:
        m = modulus or self.params.message_modulus
        return self.generate_lookup_table(lambda x: f(x % m) % m)

    # ------------------------------------------------------------------
    # the atomic pattern
    # ------------------------------------------------------------------
    def apply_lookup_table(self, ct: ShortintCiphertext, lut: LookupTable) -> ShortintCiphertext:
        order = self._ap_order
        expect = "big" if order == "ks_pbs" else "small"
        assert ct.under_key == expect, (
            f"{order} pattern expects {expect}-key input, got {ct.under_key}"
        )
        ks_pbs, _, _ = self._fns
        from ..utils import trace

        trace.add_pbs(int(np.prod(ct.ct.shape[:-1])) or 1)
        trace.add_ks(int(np.prod(ct.ct.shape[:-1])) or 1)
        out = ks_pbs(ct.ct, lut.acc, self.ksk_i8, self.pbs_bsk)
        return ShortintCiphertext(
            ct=out,
            degree=lut.degree,
            noise_level=NOMINAL_NOISE,
            message_modulus=ct.message_modulus,
            carry_modulus=ct.carry_modulus,
            under_key=expect,
        )

    def keyswitch(self, ct: ShortintCiphertext) -> ShortintCiphertext:
        from ..utils import trace

        _, _, ks = self._fns
        trace.add_ks(int(np.prod(ct.ct.shape[:-1])) or 1)
        out = ks(ct.ct, self.ksk_i8)
        return ct.with_ct(out)

    def message_extract(self, ct: ShortintCiphertext) -> ShortintCiphertext:
        """PBS with x -> x % message_modulus (clears carries)."""
        lut = self.generate_lookup_table(lambda x: x % self.params.message_modulus)
        return self.apply_lookup_table(ct, lut)

    def carry_extract(self, ct: ShortintCiphertext) -> ShortintCiphertext:
        lut = self.generate_lookup_table(lambda x: x // self.params.message_modulus)
        return self.apply_lookup_table(ct, lut)

    # ------------------------------------------------------------------
    # leveled (linear) operations — degree/noise bookkeeping per
    # shortint/ciphertext/common.rs
    # ------------------------------------------------------------------
    def _check_noise(self, level: int):
        assert level <= self.params.max_noise_level, (
            f"noise level {level} exceeds max {self.params.max_noise_level}"
        )

    def unchecked_add(self, a: ShortintCiphertext, b: ShortintCiphertext) -> ShortintCiphertext:
        return ShortintCiphertext(
            ct=a.ct + b.ct,
            degree=a.degree + b.degree,
            noise_level=a.noise_level + b.noise_level,
            message_modulus=a.message_modulus,
            carry_modulus=a.carry_modulus,
            under_key=a.under_key,
        )

    def unchecked_scalar_add(self, a: ShortintCiphertext, scalar: int) -> ShortintCiphertext:
        import jax.numpy as jnp

        delta = self.encoding.delta()
        shift = jnp.uint64((scalar * delta) % (1 << 64))
        ct = a.ct.at[..., -1].add(shift)
        return a.with_ct(ct, degree=a.degree + scalar)

    def unchecked_scalar_mul(self, a: ShortintCiphertext, scalar: int) -> ShortintCiphertext:
        import jax.numpy as jnp

        return a.with_ct(
            a.ct * jnp.uint64(scalar),
            degree=a.degree * scalar,
            noise_level=a.noise_level * scalar,
        )

    def unchecked_neg(self, a: ShortintCiphertext) -> ShortintCiphertext:
        """-ct plus the degree-correction z*Delta with z the smallest multiple
        of message_modulus > degree (server_key/neg.rs semantics)."""
        import jax.numpy as jnp

        mm = a.message_modulus
        z = math.ceil((a.degree + 1) / mm) * mm
        delta = self.encoding.delta()
        ct = jnp.uint64(0) - a.ct
        ct = ct.at[..., -1].add(jnp.uint64((z * delta) % (1 << 64)))
        return a.with_ct(ct, degree=z - 1)

    def unchecked_sub(self, a: ShortintCiphertext, b: ShortintCiphertext) -> ShortintCiphertext:
        return self.unchecked_add(a, self.unchecked_neg(b))

    # ------------------------------------------------------------------
    # PBS-based binary ops (the naive building blocks; integer layer uses
    # batched variants)
    # ------------------------------------------------------------------
    def unchecked_apply_lookup_table_bivariate(
        self, a: ShortintCiphertext, b: ShortintCiphertext, f: Callable[[int, int], int]
    ) -> ShortintCiphertext:
        """Pack lhs*factor + rhs then one univariate PBS
        (shortint/server_key/bivariate_pbs.rs:26-45,141)."""
        factor = b.degree + 1
        packed = self.unchecked_add(self.unchecked_scalar_mul(a, factor), b)
        self._check_noise(packed.noise_level)
        mm = self.params.message_modulus
        lut = self.generate_lookup_table(lambda x: f((x // factor) % mm, x % factor))
        return self.apply_lookup_table(packed, lut)

    def add(self, a: ShortintCiphertext, b: ShortintCiphertext) -> ShortintCiphertext:
        """Default add (shortint/server_key/add.rs:85-101 add_assign):
        message-extract dirty inputs, leveled add, then message-extract the
        result — output always has an empty carry."""
        mm = self.params.message_modulus
        if a.degree >= mm:
            a = self.message_extract(a)
        if b.degree >= mm:
            b = self.message_extract(b)
        out = self.unchecked_add(a, b)
        self._check_noise(out.noise_level)
        return self.message_extract(out)

    def smart_add(self, a: ShortintCiphertext, b: ShortintCiphertext) -> ShortintCiphertext:
        """Smart add (add.rs:303-325): clean inputs only when the leveled sum
        would overflow degree/noise budgets, then return the unchecked sum —
        carries are PRESERVED for the caller."""
        p = self.params
        budget = p.message_modulus * p.carry_modulus - 1
        if (
            a.degree + b.degree > budget
            or a.noise_level + b.noise_level > self.params.max_noise_level
        ):
            if a.degree >= b.degree:
                a = self.message_extract(a)
            if a.degree + b.degree > budget:
                b = self.message_extract(b)
        out = self.unchecked_add(a, b)
        self._check_noise(out.noise_level)
        return out

    def mul(self, a: ShortintCiphertext, b: ShortintCiphertext) -> ShortintCiphertext:
        mm = self.params.message_modulus
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, lambda x, y: (x * y) % mm
        )

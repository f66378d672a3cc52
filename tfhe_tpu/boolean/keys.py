"""Boolean client/server keys and gates.

Gate recipes (reference boolean/engine/mod.rs:558-800, all wrapping):
    AND:  l + r + FALSE
    NAND: -(l + r) + TRUE
    NOR:  -(l + r) + FALSE
    OR:   l + r + TRUE
    XOR:  2 * (l + r + TRUE)
    XNOR: 2 * (-(l + r + TRUE))
    NOT:  -ct                          (no bootstrap)
    MUX:  PBS(c + t + FALSE) + PBS(-c + e + FALSE) + TRUE, then keyswitch

followed by the sign bootstrap (constant-TRUE accumulator) and the
PBS-order-appropriate keyswitch (DEFAULT_PARAMETERS: encryption under the
small key, bootstrap-then-keyswitch... i.e. PBS: small->big, KS: big->small).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..core import algorithms as algo
from ..ops import ntt as ntt_mod
from ..ops import server as server_ops
from ..utils.csprng import AesCtrGenerator, EncryptionRandomGenerator, SecretRandomGenerator
from ..utils.params import BooleanParameters, EncryptionKeyChoice, BOOLEAN_DEFAULT_PARAMETERS

# q/8 and -q/8 on the 2^64 torus (reference uses u32; same fractions)
PLAINTEXT_TRUE = np.uint64(1) << np.uint64(61)
PLAINTEXT_FALSE = np.uint64(7) << np.uint64(61)

_jit_cache: dict = {}


@dataclass
class BooleanCiphertext:
    ct: Any  # jnp u64[..., n+1] under the small key
    # trivial constants are represented as ordinary arrays via trivial LWE


@dataclass
class ClientKey:
    params: BooleanParameters
    glwe_sk: Any
    lwe_sk: Any
    _enc_gen: EncryptionRandomGenerator = None

    @classmethod
    def generate(cls, params: BooleanParameters = BOOLEAN_DEFAULT_PARAMETERS, seed: int = 0):
        root = AesCtrGenerator(seed)
        s_seed, e_seed, n_seed = (int(x) for x in root.uniform_u64(3))
        sec = SecretRandomGenerator(s_seed)
        # reference boolean engine draws the lwe key first, then the glwe key
        lwe_sk = algo.gen_lwe_secret_key(params.lwe_dimension, sec)
        glwe_sk = algo.gen_glwe_secret_key(params.glwe_dimension, params.polynomial_size, sec)
        ck = cls(params=params, glwe_sk=glwe_sk, lwe_sk=lwe_sk)
        ck._enc_gen = EncryptionRandomGenerator(e_seed, n_seed)
        return ck

    def encrypt(self, values) -> BooleanCiphertext:
        import jax.numpy as jnp

        vals = np.atleast_1d(np.asarray(values, dtype=bool))
        pts = np.where(vals, PLAINTEXT_TRUE, PLAINTEXT_FALSE).astype(np.uint64)
        cts = algo.lwe_encrypt(
            self.lwe_sk, pts.reshape(-1), self.params.lwe_noise_distribution, self._enc_gen
        ).reshape(vals.shape + (self.params.lwe_dimension + 1,))
        return BooleanCiphertext(ct=jnp.asarray(cts))

    def decrypt(self, ct: BooleanCiphertext) -> np.ndarray:
        arr = np.asarray(ct.ct, dtype=np.uint64)
        flat = arr.reshape(-1, arr.shape[-1])
        raw = algo.lwe_decrypt(self.lwe_sk, flat)
        # sign bit of the phase: values near +q/8 -> true, near -q/8 -> false
        out = raw.astype(np.int64) > 0
        return out.reshape(arr.shape[:-1])


@dataclass
class ServerKey:
    params: BooleanParameters
    ksk: Any
    ksk_i8: Any
    bsk_scan: Any
    num_primes: int

    @property
    def bsk_hat(self):
        from ..ops.pbs_kernel import scan_to_legacy_layout

        return scan_to_legacy_layout(self.bsk_scan, self.params.pbs_level)

    @classmethod
    def generate(cls, ck: ClientKey) -> "ServerKey":
        import jax.numpy as jnp

        p = ck.params
        gen = ck._enc_gen
        bsk = algo.gen_bootstrap_key(
            ck.lwe_sk, ck.glwe_sk, p.pbs_base_log, p.pbs_level,
            p.glwe_noise_distribution, gen,
        )
        big = ck.glwe_sk.as_lwe_secret_key()
        ksk = algo.gen_keyswitch_key(
            big, ck.lwe_sk, p.ks_base_log, p.ks_level, p.lwe_noise_distribution, gen
        )
        bound = ntt_mod.polymul_bound_bits(
            p.pbs_base_log, p.polynomial_size, num_sums=p.pbs_level * p.glwe_size
        )
        num_primes = ntt_mod.min_primes_for_bound(bound)
        bsk_hat = algo.bootstrap_key_to_ntt(bsk, num_primes)
        from ..ops.pbs_kernel import bsk_to_scan_layout

        return cls(
            params=p,
            ksk=jnp.asarray(ksk.data),
            ksk_i8=jnp.asarray(server_ops.ksk_to_i8_limbs(ksk.data, p.ks_base_log)),
            bsk_scan=bsk_to_scan_layout(bsk_hat.residues),
            num_primes=num_primes,
        )

    # -- the bootstrap pipeline ------------------------------------------------
    def _fns(self):
        import jax
        import jax.numpy as jnp

        p = self.params
        from ..shortint.server_key import use_pallas_default

        use_pallas = use_pallas_default()
        sig = ("bool", p.name, self.ksk.shape, self.bsk_scan.shape, use_pallas)
        if sig in _jit_cache:
            return _jit_cache[sig]
        plan = ntt_mod.get_plan(p.polynomial_size, self.num_primes)
        N = p.polynomial_size
        R = p.glwe_size

        def bootstrap(ct, bsk):
            # constant-TRUE accumulator (bootstrapping.rs:64)
            lut = jnp.zeros(ct.shape[:-1] + (R, N), dtype=jnp.uint64)
            lut = lut.at[..., R - 1, :].set(jnp.uint64(PLAINTEXT_TRUE))
            if use_pallas:
                return server_ops.programmable_bootstrap_pallas(
                    ct, lut, bsk, p.pbs_base_log, p.pbs_level, plan,
                    centered_ms=False,
                )
            from ..ops.pbs_kernel import scan_to_legacy_layout

            return server_ops.programmable_bootstrap(
                ct, lut, scan_to_legacy_layout(bsk, p.pbs_level),
                p.pbs_base_log, p.pbs_level, plan, centered_ms=False,
            )

        @jax.jit
        def bootstrap_keyswitch(ct, ksk_i8, bsk):
            big = bootstrap(ct, bsk)
            return server_ops.keyswitch_mxu(big, ksk_i8, p.ks_base_log, p.ks_level)

        @jax.jit
        def mux_fn(c, t, e, ksk_i8, bsk):
            false = jnp.uint64(PLAINTEXT_FALSE)
            true = jnp.uint64(PLAINTEXT_TRUE)
            in1 = (c + t).at[..., -1].add(false)
            in2 = (jnp.uint64(0) - c + e).at[..., -1].add(false)
            b1 = bootstrap(in1, bsk)
            b2 = bootstrap(in2, bsk)
            s = (b1 + b2).at[..., -1].add(true)
            return server_ops.keyswitch_mxu(s, ksk_i8, p.ks_base_log, p.ks_level)

        _jit_cache[sig] = (bootstrap_keyswitch, mux_fn)
        return _jit_cache[sig]

    def _gate(self, combo) -> BooleanCiphertext:
        bks, _ = self._fns()
        return BooleanCiphertext(ct=bks(combo, self.ksk_i8, self.bsk_scan))

    # -- gates -----------------------------------------------------------------
    def and_(self, l: BooleanCiphertext, r: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        return self._gate((l.ct + r.ct).at[..., -1].add(jnp.uint64(PLAINTEXT_FALSE)))

    def or_(self, l: BooleanCiphertext, r: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        return self._gate((l.ct + r.ct).at[..., -1].add(jnp.uint64(PLAINTEXT_TRUE)))

    def nand(self, l: BooleanCiphertext, r: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        return self._gate(
            (jnp.uint64(0) - (l.ct + r.ct)).at[..., -1].add(jnp.uint64(PLAINTEXT_TRUE))
        )

    def nor(self, l: BooleanCiphertext, r: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        return self._gate(
            (jnp.uint64(0) - (l.ct + r.ct)).at[..., -1].add(jnp.uint64(PLAINTEXT_FALSE))
        )

    def xor(self, l: BooleanCiphertext, r: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        s = (l.ct + r.ct).at[..., -1].add(jnp.uint64(PLAINTEXT_TRUE))
        return self._gate(s * jnp.uint64(2))

    def xnor(self, l: BooleanCiphertext, r: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        s = (l.ct + r.ct).at[..., -1].add(jnp.uint64(PLAINTEXT_TRUE))
        return self._gate((jnp.uint64(0) - s) * jnp.uint64(2))

    def not_(self, ct: BooleanCiphertext) -> BooleanCiphertext:
        import jax.numpy as jnp

        return BooleanCiphertext(ct=jnp.uint64(0) - ct.ct)

    def mux(
        self, cond: BooleanCiphertext, then_ct: BooleanCiphertext, else_ct: BooleanCiphertext
    ) -> BooleanCiphertext:
        _, mux_fn = self._fns()
        return BooleanCiphertext(
            ct=mux_fn(cond.ct, then_ct.ct, else_ct.ct, self.ksk_i8, self.bsk_scan)
        )


def gen_keys(params: BooleanParameters = BOOLEAN_DEFAULT_PARAMETERS, seed: int = 0):
    ck = ClientKey.generate(params, seed)
    sk = ServerKey.generate(ck)
    return ck, sk

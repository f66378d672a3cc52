"""WoP-PBS (without-padding programmable bootstrapping): bit extraction +
circuit bootstrapping + vertical packing.

Reference: ``shortint/wopbs/mod.rs`` (WopbsKey, wopbs:544,
new_wopbs_key_only_for_wopbs:255), the core algorithms in
``core_crypto/fft_impl/fft64/crypto/wop_pbs/mod.rs`` (extract_bits:61,
circuit_bootstrap_boolean:238, homomorphic_shift_boolean:360,
cmux_tree_memory_optimized:459, vertical_packing:771,
blind_rotate_assign:838) and the private functional packing keyswitch
(``lwe_private_functional_packing_keyswitch*.rs``, ``lwe_wopbs.rs``).

Evaluates LUTs over the FULL message+carry space with exact (GGSW-selected)
lookups, so no padding bit or box redundancy is needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from ..core import algorithms as algo
from ..ops import ntt as ntt_mod
from ..ops import server as server_ops
from ..ops.decomp import decompose, recomposition_summand
from ..utils.params import DynamicDistribution
from .ciphertext import NOMINAL_NOISE, ShortintCiphertext
from .client_key import ClientKey
from .server_key import ServerKey

_U64 = np.uint64


# ---------------------------------------------------------------------------
# private functional packing keyswitch (CBS flavor)
# ---------------------------------------------------------------------------

def gen_cbs_pfpksk_list(
    big_lwe_sk,
    glwe_sk,
    base_log: int,
    levels: int,
    noise: DynamicDistribution,
    gen,
) -> np.ndarray:
    """[k+1, n_in+1, l, k+1, N] u64: pfpksk_r encrypts, for input position p
    (the body position acts as key bit -1) and level j, the polynomial
    poly_r * (-keybit_p) << (64 - bl*level), where poly_r = s_r for r < k
    and [-1, 0, ...] for r = k (lwe_wopbs.rs:125-154)."""
    k, N = glwe_sk.bits.shape
    n_in = big_lwe_sk.dim
    polys = [glwe_sk.bits[r].astype(np.int64) for r in range(k)]
    last = np.zeros(N, dtype=np.int64)
    last[0] = -1
    polys.append(last)
    key_bits = np.concatenate(
        [big_lwe_sk.bits.astype(np.int64), [-1]]
    )  # body position = -1
    out = np.zeros((k + 1, n_in + 1, levels, k + 1, N), dtype=_U64)
    with np.errstate(over="ignore"):
        for r in range(k + 1):
            for p in range(n_in + 1):
                msgs = np.zeros((levels, N), dtype=_U64)
                for j in range(levels):
                    level = levels - j
                    # f(1) = -1; message = poly * (-keybit) << (64-bl*level)
                    factor = _U64(((-int(key_bits[p])) % (1 << 64))) << _U64(
                        64 - base_log * level
                    )
                    msgs[j] = polys[r].astype(_U64) * factor
                out[r, p] = algo.glwe_encrypt(glwe_sk, msgs, noise, gen).reshape(
                    levels, k + 1, N
                )
    return out


def pfpks_apply(pfpksk_r: np.ndarray, lwe, base_log: int, levels: int):
    """LWE -> GLWE with the private function baked into the key:
    out = -sum_p sum_j d_j(c_p) * K[p, j] (one einsum;
    lwe_private_functional_packing_keyswitch.rs:62-88)."""
    import jax.numpy as jnp

    d = decompose(jnp.asarray(lwe), base_log, levels)  # [n+1, l] i64
    K = jnp.asarray(pfpksk_r)  # [n+1, l, R, N]
    prod = d.astype(jnp.uint64)[:, :, None, None] * K
    return jnp.uint64(0) - jnp.sum(prod, axis=(0, 1))  # [R, N]


# ---------------------------------------------------------------------------
# WopbsKey
# ---------------------------------------------------------------------------

@dataclass
class WopbsKey:
    """WoP-PBS key sharing the compute keyset (the reference's
    new_wopbs_key_only_for_wopbs:255 configuration: same BSK/KSK, plus the
    CBS pfpksk list)."""

    server_key: ServerKey
    pfpksk: np.ndarray  # [k+1, n_in+1, l_pf, k+1, N]
    wopbs_bsk_hat: Any  # dedicated high-precision BSK (legacy layout)
    wopbs_pbs_base_log: int
    wopbs_pbs_levels: int
    wopbs_num_primes: int
    cbs_base_log: int
    cbs_levels: int
    pf_base_log: int
    pf_levels: int

    @classmethod
    def generate(
        cls,
        client_key: ClientKey,
        server_key: ServerKey,
        cbs_base_log: int = 6,
        cbs_levels: int = 4,
        pf_base_log: int = 8,
        pf_levels: int = 5,
        wopbs_pbs_base_log: int = 4,
        wopbs_pbs_levels: int = 8,
    ) -> "WopbsKey":
        """The wopbs keyset carries its OWN bootstrap key with a deeper
        decomposition than the compute keyset (reference WopbsKey holds a
        wopbs_server_key generated under WopbsParameters): circuit
        bootstrapping needs the PBS output accurate to the smallest GGSW
        factor 2^(64 - cbs_base_log*cbs_levels), far below what the compute
        BSK's shallow decomposition can deliver."""
        p = client_key.params
        pfpksk = gen_cbs_pfpksk_list(
            client_key.big_lwe_sk,
            client_key.glwe_sk,
            pf_base_log,
            pf_levels,
            p.glwe_noise_distribution,
            client_key._keygen_gen,
        )
        bsk = algo.gen_bootstrap_key(
            client_key.lwe_sk,
            client_key.glwe_sk,
            wopbs_pbs_base_log,
            wopbs_pbs_levels,
            p.glwe_noise_distribution,
            client_key._keygen_gen,
        )
        bound = ntt_mod.polymul_bound_bits(
            wopbs_pbs_base_log, p.polynomial_size,
            num_sums=wopbs_pbs_levels * p.glwe_size,
        )
        num_primes = ntt_mod.min_primes_for_bound(bound)
        bsk_hat = algo.bootstrap_key_to_ntt(bsk, num_primes)
        return cls(
            server_key=server_key,
            pfpksk=pfpksk,
            wopbs_bsk_hat=bsk_hat.residues,
            wopbs_pbs_base_log=wopbs_pbs_base_log,
            wopbs_pbs_levels=wopbs_pbs_levels,
            wopbs_num_primes=num_primes,
            cbs_base_log=cbs_base_log,
            cbs_levels=cbs_levels,
            pf_base_log=pf_base_log,
            pf_levels=pf_levels,
        )

    # ------------------------------------------------------------------
    def _pbs_with_acc(self, lwe_small, acc_body_const: int):
        """Classic PBS of one LWE against a constant-body trivial
        accumulator (standard modulus switch, no padding assumptions)."""
        import jax.numpy as jnp

        sk = self.server_key
        p = sk.params
        N = p.polynomial_size
        R = p.glwe_size
        acc = np.zeros((R, N), dtype=_U64)
        acc[-1, :] = _U64(acc_body_const % (1 << 64))
        plan = ntt_mod.get_plan(N, self.wopbs_num_primes)
        return server_ops.programmable_bootstrap(
            jnp.asarray(lwe_small)[None],
            jnp.asarray(acc),
            self.wopbs_bsk_hat,
            self.wopbs_pbs_base_log,
            self.wopbs_pbs_levels,
            plan,
            centered_ms=False,
        )[0]

    def extract_bits(self, ct: ShortintCiphertext, delta_log: int, nbits: int):
        """MSB-first list of LWE(bit << delta_log... bit at 2^{delta_log})
        under the small key (wop_pbs/mod.rs:61-220)."""
        import jax.numpy as jnp

        sk = self.server_key
        p = sk.params
        ks = sk._fns[2]
        buf = np.asarray(ct.ct, dtype=_U64).reshape(-1).copy()
        outs = [None] * nbits
        with np.errstate(over="ignore"):
            for bit_idx in range(nbits):
                shifted = buf << _U64(64 - delta_log - bit_idx - 1)
                ksed = np.array(
                    ks(jnp.asarray(shifted)[None], sk.ksk_i8), dtype=_U64
                )[0]
                outs[nbits - 1 - bit_idx] = ksed.copy()
                if bit_idx == nbits - 1:
                    break
                ksed[-1] += _U64(1 << 62)
                pbs_out = np.array(
                    self._pbs_with_acc(
                        ksed, -(1 << (delta_log - 1 + bit_idx)) % (1 << 64)
                    ),
                    dtype=_U64,
                )
                pbs_out[-1] += _U64(1 << (delta_log - 1 + bit_idx))
                buf -= pbs_out
        return outs

    def circuit_bootstrap(self, lwe_bit_small: np.ndarray) -> np.ndarray:
        """LWE(bit << 62... bit at the extraction position) -> GGSW(bit)
        under the GLWE key (wop_pbs/mod.rs:238-340): one PBS per CBS level,
        then one private functional packing keyswitch per GLWE row."""
        sk = self.server_key
        p = sk.params
        k = p.glwe_dimension
        N = p.polynomial_size
        R = k + 1
        ggsw = np.zeros((self.cbs_levels, R, R, N), dtype=_U64)
        # extract_bits outputs carry the bit at 2^63 (delta_log 63), so the
        # homomorphic shift factor 2^{64-delta_log-1} is 1
        with np.errstate(over="ignore"):
            for lvl in range(1, self.cbs_levels + 1):
                shifted = np.array(lwe_bit_small, dtype=_U64)
                shifted[-1] += _U64(1 << 62)  # center the negacyclic error
                alpha = 1 << (64 - 1 - self.cbs_base_log * lvl)
                out = np.array(
                    self._pbs_with_acc(shifted, (-alpha) % (1 << 64)),
                    dtype=_U64,
                )
                out[-1] += _U64(alpha)  # -> LWE(bit << (64 - bl*lvl))
                # GGSW slot j holds level = levels - j (decompose order:
                # level `levels`, the smallest summand, first)
                for r in range(R):
                    row = np.asarray(
                        pfpks_apply(
                            self.pfpksk[r], out, self.pf_base_log,
                            self.pf_levels,
                        ),
                        dtype=_U64,
                    )
                    ggsw[self.cbs_levels - lvl, r] = row
        return ggsw

    # ------------------------------------------------------------------
    def generate_lut(self, ct: ShortintCiphertext, f: Callable[[int], int]):
        """LUT over the full message+carry space at the standard Delta
        (wopbs/mod.rs:373 generate_lut)."""
        p = self.server_key.params
        mod_sup = p.message_modulus * p.carry_modulus
        delta = (1 << 63) // mod_sup  # output at the padded encoding
        N = p.polynomial_size
        nbits = mod_sup.bit_length() - 1
        n_polys = max(1, (1 << nbits) // N)
        lut = np.zeros((n_polys, N), dtype=_U64)
        for v in range(1 << nbits):
            lut[v // N, v % N] = _U64((f(v % mod_sup) % mod_sup) * delta)
        return lut

    def vertical_packing(self, lut: np.ndarray, ggsw_list) -> np.ndarray:
        """CMUX tree over the MSB GGSWs + blind rotation over the LSB GGSWs
        + sample extract (wop_pbs/mod.rs:771-825)."""
        import jax.numpy as jnp

        sk = self.server_key
        p = sk.params
        N = p.polynomial_size
        R = p.glwe_size
        nbits = len(ggsw_list)
        n_polys = lut.shape[0]
        log_polys = max(0, n_polys.bit_length() - 1)
        n_tree = log_polys if log_polys <= nbits else 0
        cmux_ggsw = ggsw_list[:n_tree]
        br_ggsw = ggsw_list[n_tree:]

        # prime budget for external products against CBS GGSWs
        bound = ntt_mod.polymul_bound_bits(
            self.cbs_base_log, N, num_sums=self.cbs_levels * R
        )
        plan = ntt_mod.get_plan(N, ntt_mod.min_primes_for_bound(bound))

        def to_hat(ggsw):
            res = plan.fwd(jnp.asarray(ggsw))
            shoup = (res << jnp.uint64(32)) // plan.p_like(res.ndim - 1)
            return jnp.stack([res, shoup]).astype(jnp.uint32)

        # CMUX tree: layer t consumes the least-significant tree bit first
        layers = [
            jnp.concatenate(
                [jnp.zeros((p.glwe_dimension, N), _U64), lut[i][None]], 0
            )[None].astype(jnp.uint64).reshape(1, R, N)
            for i in range(n_polys)
        ]
        layers = [x[0] for x in layers]  # list of [R, N] trivial GLWEs
        for t in range(n_tree):
            g = to_hat(cmux_ggsw[n_tree - 1 - t])
            nxt = []
            for i in range(0, len(layers), 2):
                nxt.append(
                    server_ops.cmux_ntt(
                        g, layers[i], layers[i + 1], self.cbs_base_log,
                        self.cbs_levels, plan,
                    )
                )
            layers = nxt
        acc = layers[0]

        # blind rotation over the remaining (LSB) bits
        from ..ops.polynomial import monomial_div

        degree = 1
        for ggsw in reversed(br_ggsw):
            g = to_hat(ggsw)
            rot = monomial_div(acc, jnp.uint64(degree))
            acc = server_ops.cmux_ntt(
                g, acc, rot, self.cbs_base_log, self.cbs_levels, plan
            )
            degree <<= 1
        return np.asarray(server_ops.sample_extract(acc, 0), dtype=_U64)

    # ------------------------------------------------------------------
    def wopbs(self, ct: ShortintCiphertext, f: Callable[[int], int]) -> ShortintCiphertext:
        """Full WoP-PBS over message+carry (wopbs/mod.rs:544): extract the
        message bits, circuit-bootstrap each into a GGSW, evaluate the LUT
        by vertical packing."""
        import jax.numpy as jnp

        sk = self.server_key
        p = sk.params
        mod_sup = p.message_modulus * p.carry_modulus
        nbits = mod_sup.bit_length() - 1
        delta_log = 64 - 1 - nbits  # padded encoding: value bits below pad
        bits = self.extract_bits(ct, delta_log, nbits)
        ggsws = [self.circuit_bootstrap(b) for b in bits]
        lut = self.generate_lut(ct, f)
        out = self.vertical_packing(lut, ggsws)
        max_out = max(f(v) % mod_sup for v in range(mod_sup))
        return ShortintCiphertext(
            ct=jnp.asarray(out),
            degree=max_out,
            noise_level=NOMINAL_NOISE,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            under_key="big",
        )

"""List compression: pack many LWEs into GLWEs + modulus-switched storage.

Reference: ``tfhe/src/shortint/list_compression/`` (compression.rs:17-164,
server_keys.rs:27-100) and ``core_crypto/algorithms/lwe_packing_keyswitch.rs``.

- compress: packing-keyswitch up to ``lwe_per_glwe`` big-key LWEs into one
  GLWE under a dedicated compression key, then store only the top
  ``storage_log_modulus`` bits of every coefficient.
- decompress: re-expand, sample-extract coefficient i, then one blind
  rotation with an identity (rescaling) LUT under the decompression BSK to
  return a fresh ciphertext under the big key
  (``decompress_and_apply_lookup_table``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, List

import numpy as np

from ..core import algorithms as algo
from ..core.entities import GlweSecretKey
from ..ops import ntt as ntt_mod
from ..ops import server as server_ops
from ..ops.decomp import decompose
from ..utils.params import DynamicDistribution
from .ciphertext import NOMINAL_NOISE, LookupTable, ShortintCiphertext
from .client_key import ClientKey
from .server_key import ServerKey

_G = DynamicDistribution.gaussian_from_std_dev


@dataclass(frozen=True)
class CompressionParameters:
    """Reference ``ClassicCompressionParameters``
    (shortint/parameters/list_compression.rs)."""

    br_level: int
    br_base_log: int
    packing_ks_level: int
    packing_ks_base_log: int
    packing_ks_polynomial_size: int
    packing_ks_glwe_dimension: int
    lwe_per_glwe: int
    storage_log_modulus: int
    packing_ks_key_noise_distribution: DynamicDistribution
    # 0 = classic decompression; >0 = multi-bit decompression BSK grouping
    # (reference MultiBitCompressionParameters, list_compression.rs:129)
    decompression_grouping_factor: int = 0
    name: str = ""


# v1_4/list_compression/p_fail_2_minus_128/mod.rs (gaussian)
COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS = CompressionParameters(
    br_level=1,
    br_base_log=23,
    packing_ks_level=2,
    packing_ks_base_log=6,
    packing_ks_polynomial_size=256,
    packing_ks_glwe_dimension=4,
    lwe_per_glwe=256,
    storage_log_modulus=12,
    packing_ks_key_noise_distribution=_G(1.339775301998614e-07),
    name="COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS",
)

COMP_PARAM_TEST_TOY = CompressionParameters(
    br_level=1,
    br_base_log=23,
    packing_ks_level=2,
    packing_ks_base_log=6,
    packing_ks_polynomial_size=128,
    packing_ks_glwe_dimension=2,
    lwe_per_glwe=128,
    storage_log_modulus=16,
    packing_ks_key_noise_distribution=_G(2.0 ** -40),
    name="COMP_PARAM_TEST_TOY",
)


@dataclass
class CompressionPrivateKeys:
    """The client-side compression GLWE secret key
    (list_compression/private_key.rs)."""

    comp_glwe_sk: GlweSecretKey
    params: CompressionParameters


@dataclass
class CompressionKey:
    """Packing keyswitch key, NTT domain: [P, n_big, l, R_c, N_c] residues."""

    pksk_hat: Any
    params: CompressionParameters
    num_primes: int


@dataclass
class DecompressionKey:
    """Blind-rotation key from the compression key back to the main GLWE."""

    bsk_scan: Any  # pallas layout, classic shape
    br_base_log: int
    br_level: int
    num_primes: int


def new_compression_private_key(
    client_key: ClientKey, params: CompressionParameters
) -> CompressionPrivateKeys:
    from ..utils.csprng import SecretRandomGenerator

    sec = SecretRandomGenerator((client_key.seed << 8) ^ 0xC0)
    sk = algo.gen_glwe_secret_key(
        params.packing_ks_glwe_dimension, params.packing_ks_polynomial_size, sec
    )
    return CompressionPrivateKeys(comp_glwe_sk=sk, params=params)


def new_compression_decompression_keys(
    client_key: ClientKey, private: CompressionPrivateKeys
):
    """(CompressionKey, DecompressionKey) — server_keys.rs:27-100."""
    import jax.numpy as jnp

    cp = private.params
    N_c = cp.packing_ks_polynomial_size
    R_c = cp.packing_ks_glwe_dimension + 1
    gen = client_key._keygen_gen

    # --- packing KSK: for each big-key bit j, levels of GLWE_enc(s_j * q/B^lev)
    big = client_key.big_lwe_sk
    n_big = big.dim
    l = cp.packing_ks_level
    b = cp.packing_ks_base_log
    msgs = np.zeros((n_big, l, N_c), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for lev_idx in range(l):
            level = l - lev_idx
            factor = np.uint64(1) << np.uint64(64 - b * level)
            msgs[:, lev_idx, 0] = big.bits * factor
    rows = algo.glwe_encrypt(
        private.comp_glwe_sk, msgs.reshape(-1, N_c),
        cp.packing_ks_key_noise_distribution, gen,
    )
    pksk = rows.reshape(n_big, l, R_c, N_c)
    # NTT: bound = digit(b-1) + 64 + log2(N_c) + log2(n_big*l)
    bound = (b - 1) + 64 + np.log2(N_c) + np.log2(n_big * l)
    npr = ntt_mod.min_primes_for_bound(float(bound))
    plan_c = ntt_mod.get_plan(N_c, npr)
    pksk_hat = np.asarray(plan_c.fwd(jnp.asarray(pksk)))  # [P, n_big, l, R_c, N_c]
    comp_key = CompressionKey(
        pksk_hat=jnp.asarray(pksk_hat), params=cp, num_primes=npr
    )

    # --- decompression BSK: GGSW of each compression-key bit under the MAIN
    # GLWE key (classic bootstrap key with br_* decomposition)
    from ..core.entities import LweSecretKey

    comp_lwe = private.comp_glwe_sk.as_lwe_secret_key()
    p = client_key.params
    bsk = algo.gen_bootstrap_key(
        comp_lwe, client_key.glwe_sk, cp.br_base_log, cp.br_level,
        p.glwe_noise_distribution, gen,
    )
    npr_m = ServerKey._num_primes_for(p)
    bsk_hat = algo.bootstrap_key_to_ntt(bsk, npr_m)
    from ..ops.pbs_kernel import bsk_to_scan_layout

    dec_key = DecompressionKey(
        bsk_scan=bsk_to_scan_layout(bsk_hat.residues),
        br_base_log=cp.br_base_log, br_level=cp.br_level, num_primes=npr_m,
    )
    return comp_key, dec_key


@dataclass
class CompressedCiphertextList:
    """Storage: packed GLWEs with only the top ``storage_log_modulus`` bits
    kept (CompressedModulusSwitchedGlweCiphertext)."""

    storage: Any  # u16/u32 np [n_glwe, R_c, N_c] holding top bits
    count: int
    message_modulus: int
    carry_modulus: int
    params: CompressionParameters


@functools.lru_cache(maxsize=None)
def _get_pack_fn(base_log: int, levels: int, N_c: int, n_big: int, R_c: int,
                 num_primes: int):
    """Module-level jitted packing keyswitch (one compile per geometry;
    avoids the per-call retrace of a closure-local jit)."""
    import jax
    import jax.numpy as jnp

    plan_c = ntt_mod.get_plan(N_c, num_primes)

    @jax.jit
    def pack(a, bvals, pksk_hat):
        digits = decompose(a, base_log, levels)
        # digit polynomials P_{g,j,lev}(X) = sum_i digit_{g,i,j,lev} X^i
        polys = jnp.zeros(
            (a.shape[0], n_big, levels, N_c), dtype=jnp.int64)
        polys = polys.at[..., : a.shape[1]].set(jnp.moveaxis(digits, 1, -1))
        dhat = plan_c.fwd(polys)  # [P, g, n_big, l, N_c]
        prod = (
            dhat[..., None, :].astype(jnp.uint64)
            * pksk_hat[:, None].astype(jnp.uint64)
        ) % plan_c.p_like(5)
        acc_hat = jnp.sum(prod, axis=(2, 3)) % plan_c.p_like(3)  # [P,g,R,N]
        mac = plan_c.reconstruct_u64(plan_c.inv(acc_hat))  # [g, R_c, N_c]
        body = jnp.zeros((a.shape[0], R_c, N_c), dtype=jnp.uint64)
        body = body.at[:, R_c - 1, : a.shape[1]].set(bvals)
        return body - mac

    return pack


def compress(
    comp_key: CompressionKey, cts: ShortintCiphertext
) -> CompressedCiphertextList:
    """Pack a batched shortint ciphertext (leading batch dim = list index)."""
    import jax
    import jax.numpy as jnp

    cp = comp_key.params
    N_c = cp.packing_ks_polynomial_size
    arr = np.asarray(cts.ct, dtype=np.uint64).reshape(-1, cts.ct.shape[-1])
    count = arr.shape[0]
    assert count <= cp.lwe_per_glwe * N_c
    n_big = arr.shape[1] - 1
    per = min(cp.lwe_per_glwe, N_c)
    n_glwe = -(-count // per)
    plan_c = ntt_mod.get_plan(N_c, comp_key.num_primes)
    R_c = cp.packing_ks_glwe_dimension + 1

    # one batched packing-keyswitch program over all GLWEs of the list
    # (leading glwe axis = batch axis; per-GLWE host loops only cap device
    # memory at `tile` GLWEs per dispatch)
    padded = np.zeros((n_glwe * per, n_big + 1), dtype=np.uint64)
    padded[:count] = arr
    a_all = padded[:, :n_big].reshape(n_glwe, per, n_big)
    b_all = padded[:, n_big].reshape(n_glwe, per)

    # compiled once per (params, geometry) signature — the key rides as a
    # traced argument, so repeated compress() calls hit the jit cache
    pack = _get_pack_fn(cp.packing_ks_base_log, cp.packing_ks_level,
                        N_c, n_big, R_c, comp_key.num_primes)

    tile = 8  # GLWEs per dispatch (bounds dhat device memory)
    glwes = [
        np.asarray(pack(jnp.asarray(a_all[i : i + tile]),
                        jnp.asarray(b_all[i : i + tile]),
                        comp_key.pksk_hat))
        for i in range(0, n_glwe, tile)
    ]
    stored = np.concatenate(glwes)  # [n_glwe, R_c, N_c] u64
    slm = cp.storage_log_modulus
    half = np.uint64(1) << np.uint64(64 - slm - 1)
    with np.errstate(over="ignore"):
        top = ((stored + half) >> np.uint64(64 - slm)).astype(np.uint32)
    return CompressedCiphertextList(
        storage=top, count=count,
        message_modulus=cts.message_modulus, carry_modulus=cts.carry_modulus,
        params=cp,
    )


def decompress(
    lst: CompressedCiphertextList,
    dec_key: DecompressionKey,
    server_key: ServerKey,
    indices=None,
) -> ShortintCiphertext:
    """Expand + sample-extract + identity-LUT blind rotation
    (decompress_and_apply_lookup_table)."""
    import jax.numpy as jnp

    cp = lst.params
    N_c = cp.packing_ks_polynomial_size
    per = min(cp.lwe_per_glwe, N_c)
    slm = cp.storage_log_modulus
    if indices is None:
        indices = list(range(lst.count))
    glwes = jnp.asarray(
        lst.storage.astype(np.uint64) << np.uint64(64 - slm)
    )  # [n_glwe, R_c, N_c]
    lwes = []
    for i in indices:
        gidx, pos = divmod(i, per)
        lwes.append(server_ops.sample_extract(glwes[gidx], nth=pos))
    small = jnp.stack(lwes)  # [len, k_c*N_c + 1]

    p = server_key.params
    mm, cm = lst.message_modulus, lst.carry_modulus
    sk = server_key
    lut = sk.generate_lookup_table(lambda x: x % (mm * cm))
    plan = ntt_mod.get_plan(p.polynomial_size, sk.num_primes)
    from ..ops.pbs_kernel import scan_to_legacy_layout
    from .server_key import use_pallas_default

    if use_pallas_default():
        out = server_ops.programmable_bootstrap_pallas(
            small, lut.acc, dec_key.bsk_scan, dec_key.br_base_log,
            dec_key.br_level, plan, centered_ms=False,
        )
    else:
        out = server_ops.programmable_bootstrap(
            small, lut.acc, scan_to_legacy_layout(dec_key.bsk_scan, dec_key.br_level),
            dec_key.br_base_log, dec_key.br_level, plan, centered_ms=False,
        )
    return ShortintCiphertext(
        ct=out, degree=mm * cm - 1, noise_level=NOMINAL_NOISE,
        message_modulus=mm, carry_modulus=cm, under_key="big",
    )

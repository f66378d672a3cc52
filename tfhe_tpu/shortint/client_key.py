"""Shortint client key: secret keys + encrypt/decrypt.

Reference: ``tfhe/src/shortint/client_key/mod.rs`` (ClientKey::new, encrypt
at :178, decrypt at :395) and engine client_side.rs — the GLWE key and the
small LWE key are drawn from the secret CSPRNG stream in that order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import algorithms as algo
from ..core.entities import GlweSecretKey, LweSecretKey
from ..utils.csprng import EncryptionRandomGenerator, SecretRandomGenerator
from ..utils.encoding import ShortintEncoding
from ..utils.params import ClassicPBSParameters, EncryptionKeyChoice
from .ciphertext import NOMINAL_NOISE, ShortintCiphertext


@dataclass
class ClientKey:
    params: ClassicPBSParameters
    glwe_sk: GlweSecretKey
    lwe_sk: LweSecretKey  # the small key
    # Two live generators with independent derived seed pairs: one consumed
    # by server-key generation (BSK/KSK), one by fresh encryptions. Keeping
    # them separate means keys restored from the keycache encrypt with the
    # exact same stream as freshly generated ones.
    _enc_gen: EncryptionRandomGenerator = None
    _keygen_gen: EncryptionRandomGenerator = None
    seed: int = 0

    @classmethod
    def generate(cls, params: ClassicPBSParameters, seed: int = 0) -> "ClientKey":
        """Deterministic keygen from a root seed. Sub-seeds are derived from
        the root AES stream (the reference uses a seeder for each generator;
        we derive: secret seed, keygen mask/noise seeds, encrypt mask/noise
        seeds)."""
        from ..utils.csprng import AesCtrGenerator

        root = AesCtrGenerator(seed)
        s_seed, ekg_seed, nkg_seed, e_seed, n_seed = (
            int(x) for x in root.uniform_u64(5)
        )
        sec = SecretRandomGenerator(s_seed)
        glwe_sk = algo.gen_glwe_secret_key(
            params.glwe_dimension, params.polynomial_size, sec
        )
        lwe_sk = algo.gen_lwe_secret_key(params.lwe_dimension, sec)
        ck = cls(params=params, glwe_sk=glwe_sk, lwe_sk=lwe_sk, seed=seed)
        ck._keygen_gen = EncryptionRandomGenerator(ekg_seed, nkg_seed)
        ck._enc_gen = EncryptionRandomGenerator(e_seed, n_seed)
        return ck

    # -- key views ----------------------------------------------------------
    @property
    def big_lwe_sk(self) -> LweSecretKey:
        return self.glwe_sk.as_lwe_secret_key()

    @property
    def encryption_key_and_noise(self):
        """(secret key, noise distribution) used for fresh encryptions
        (reference: EncryptionKeyChoice => big key uses glwe noise)."""
        if self.params.encryption_key_choice == EncryptionKeyChoice.BIG:
            return self.big_lwe_sk, self.params.glwe_noise_distribution, "big"
        return self.lwe_sk, self.params.lwe_noise_distribution, "small"

    @property
    def encoding(self) -> ShortintEncoding:
        return ShortintEncoding(
            ciphertext_modulus=self.params.ciphertext_modulus,
            message_modulus=self.params.message_modulus,
            carry_modulus=self.params.carry_modulus,
            padding_bit=True,
        )

    # -- encrypt / decrypt ----------------------------------------------------
    def encrypt(self, values) -> ShortintCiphertext:
        """Encrypt message(s) (scalar or array-like -> batched ciphertext)."""
        from ..utils.hostarray import asarray as _wrap

        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        enc = self.encoding
        pts = np.array([enc.encode(int(v)) for v in vals.reshape(-1)], dtype=np.uint64)
        sk, noise, under = self.encryption_key_and_noise
        cts = algo.lwe_encrypt(sk, pts, noise, self._enc_gen)
        cts = cts.reshape(vals.shape + (sk.dim + 1,))
        if np.isscalar(values) or np.asarray(values).ndim == 0:
            cts = cts[0]
        return ShortintCiphertext(
            ct=_wrap(cts),
            degree=self.params.message_modulus - 1,
            noise_level=NOMINAL_NOISE,
            message_modulus=self.params.message_modulus,
            carry_modulus=self.params.carry_modulus,
            under_key=under,
        )

    def decrypt_raw(self, ct: ShortintCiphertext) -> np.ndarray:
        sk = self.big_lwe_sk if ct.under_key == "big" else self.lwe_sk
        arr = np.asarray(ct.ct, dtype=np.uint64).reshape(-1, sk.dim + 1)
        return algo.lwe_decrypt(sk, arr).reshape(ct.batch_shape or ())

    def decrypt_message_and_carry(self, ct: ShortintCiphertext) -> np.ndarray:
        raw = np.atleast_1d(self.decrypt_raw(ct))
        enc = self.encoding
        out = np.array([enc.decode(int(p)) for p in raw.reshape(-1)], dtype=np.uint64)
        return out.reshape(raw.shape)

    def decrypt(self, ct: ShortintCiphertext) -> np.ndarray:
        """Message only (mod message_modulus), like reference decrypt."""
        return self.decrypt_message_and_carry(ct) % np.uint64(ct.message_modulus)

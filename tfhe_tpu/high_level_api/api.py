"""Typed FHE API: config, key generation, FheUintN / FheBool with operator
overloading dispatched through a module-global server key (the functional
analog of the reference's thread-local ``InternalServerKey``,
``high_level_api/global_state.rs:66-120``)."""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from .. import integer
from ..integer.radix import BooleanBlock, RadixCiphertext
from ..utils.params import (
    ClassicPBSParameters,
    PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    PARAM_TEST_TOY,
)

# ---------------------------------------------------------------------------
# config + keys
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    parameters: ClassicPBSParameters = PARAM_MESSAGE_2_CARRY_2_KS_PBS
    seed: Optional[int] = None


class ConfigBuilder:
    """Reference ``high_level_api/config.rs:41``."""

    def __init__(self):
        self._params = PARAM_MESSAGE_2_CARRY_2_KS_PBS
        self._seed = None

    def use_custom_parameters(self, params: ClassicPBSParameters) -> "ConfigBuilder":
        self._params = params
        return self

    def with_seed(self, seed: int) -> "ConfigBuilder":
        self._seed = seed
        return self

    def build(self) -> Config:
        return Config(parameters=self._params, seed=self._seed)


class ClientKey:
    def __init__(self, inner: integer.ClientKey):
        self.inner = inner

    @classmethod
    def generate(cls, config: Config) -> "ClientKey":
        seed = config.seed if config.seed is not None else 0
        return cls(integer.ClientKey.generate(config.parameters, seed))


class ServerKey:
    def __init__(self, inner: integer.ServerKey):
        self.inner = inner


def generate_keys(config: Config):
    """Reference ``high_level_api/keys/mod.rs:40``."""
    ck = ClientKey.generate(config)
    sk = ServerKey(integer.ServerKey.generate(ck.inner))
    return ck, sk


_SERVER_KEY: Optional[ServerKey] = None


def set_server_key(key: ServerKey) -> None:
    global _SERVER_KEY
    _SERVER_KEY = key


def unset_server_key() -> None:
    global _SERVER_KEY
    _SERVER_KEY = None


def _sk() -> integer.ServerKey:
    if _SERVER_KEY is None:
        raise RuntimeError("no server key set; call set_server_key(server_key)")
    return _SERVER_KEY.inner


# ---------------------------------------------------------------------------
# typed ciphertexts
# ---------------------------------------------------------------------------


class FheBool:
    def __init__(self, block: BooleanBlock):
        self.block = block

    def decrypt(self, client_key: ClientKey) -> np.ndarray | bool:
        out = _sk().decrypt_bool(client_key.inner, self.block)
        return bool(out) if out.shape == () else out

    def __and__(self, other: "FheBool") -> "FheBool":
        raise NotImplementedError("FheBool gate ops arrive with the boolean bridge")


class _FheUintBase:
    """Shared implementation of the FheUintN zoo (reference
    high_level_api/integers/unsigned/). N bits = 2 bits per block with the
    default 2_2 parameters."""

    NUM_BITS: int = 0

    def __init__(self, ct: RadixCiphertext):
        self.ct = ct

    # -- encryption -----------------------------------------------------------
    @classmethod
    def num_blocks(cls, params: ClassicPBSParameters) -> int:
        bits_per_block = int(math.log2(params.message_modulus))
        return cls.NUM_BITS // bits_per_block

    @classmethod
    def encrypt(cls, value, client_key: ClientKey):
        nb = cls.num_blocks(client_key.inner.params)
        return cls(client_key.inner.encrypt_radix(value, nb))

    @classmethod
    def encrypt_trivial(cls, value):
        raise NotImplementedError("trivial encryption lands with conformance")

    def decrypt(self, client_key: ClientKey):
        out = client_key.inner.decrypt_radix(self.ct)
        return int(out) if np.asarray(out).shape == () else out

    # -- ops --------------------------------------------------------------------
    def _wrap(self, ct: RadixCiphertext):
        return type(self)(ct)

    def __add__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().add(self.ct, other.ct))
        return self._wrap(_sk().scalar_add(self.ct, int(other)))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().sub(self.ct, other.ct))
        return self._wrap(_sk().scalar_add(self.ct, -int(other)))

    def __mul__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().mul(self.ct, other.ct))
        raise NotImplementedError("scalar_mul lands with the scalar-op suite")

    def __neg__(self):
        return self._wrap(_sk().neg(self.ct))

    def __and__(self, other):
        return self._wrap(_sk().bitand(self.ct, other.ct))

    def __or__(self, other):
        return self._wrap(_sk().bitor(self.ct, other.ct))

    def __xor__(self, other):
        return self._wrap(_sk().bitxor(self.ct, other.ct))

    def eq(self, other) -> FheBool:
        return FheBool(_sk().eq(self.ct, other.ct))

    def ne(self, other) -> FheBool:
        return FheBool(_sk().ne(self.ct, other.ct))


def _make_fheuint(bits: int):
    cls = type(f"FheUint{bits}", (_FheUintBase,), {"NUM_BITS": bits})
    return cls


FheUint2 = _make_fheuint(2)
FheUint4 = _make_fheuint(4)
FheUint8 = _make_fheuint(8)
FheUint16 = _make_fheuint(16)
FheUint32 = _make_fheuint(32)
FheUint64 = _make_fheuint(64)
FheUint128 = _make_fheuint(128)
FheUint256 = _make_fheuint(256)

"""Safe serialization: versioned envelope + size limits + conformance.

Reference: ``tfhe/src/safe_serialization.rs:151-300`` (SerializationConfig /
DeserializationConfig with a versioned header, size limit and parameter
conformance check) and the ``tfhe-versionable`` derive (every stored type
carries a version and an upgrade chain).

Format: a msgpack-free, dependency-free container:

    magic(8) | header_len(u32 LE) | header JSON | raw array payloads

The header records the type name, type version, framework version,
metadata (ints/strings), and for each array its dtype/shape/byte offset.
Upgrades: when a stored type version is older than the current one, the
registered upgrade hooks are applied in sequence (the Versionize chain).
"""

from __future__ import annotations

import io
import json
from dataclasses import dataclass
from typing import Any, Callable, Optional

import numpy as np

MAGIC = b"TFHETPU1"
FRAMEWORK_VERSION = "0.1.0"

# type registry: name -> (version, from_payload, upgrade hooks {old_ver: fn})
_REGISTRY: dict = {}


def register_type(name: str, version: int, from_payload: Callable,
                  upgrades: Optional[dict] = None):
    _REGISTRY[name] = (version, from_payload, upgrades or {})


class SerializationError(Exception):
    pass


def serialize(type_name: str, meta: dict, arrays: dict, version: Optional[int] = None) -> bytes:
    """Serialize ``meta`` (JSON-able) + named numpy arrays under the
    registered ``type_name`` envelope."""
    if type_name not in _REGISTRY:
        raise SerializationError(f"type {type_name!r} is not registered")
    ver = version if version is not None else _REGISTRY[type_name][0]
    blobs = []
    arr_index = {}
    offset = 0
    for k, a in arrays.items():
        a = np.ascontiguousarray(a)
        raw = a.tobytes()
        arr_index[k] = {"dtype": str(a.dtype), "shape": list(a.shape), "offset": offset,
                        "nbytes": len(raw)}
        blobs.append(raw)
        offset += len(raw)
    header = {
        "type": type_name,
        "type_version": ver,
        "framework_version": FRAMEWORK_VERSION,
        "meta": meta,
        "arrays": arr_index,
    }
    hj = json.dumps(header).encode()
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(len(hj).to_bytes(4, "little"))
    out.write(hj)
    for b in blobs:
        out.write(b)
    return out.getvalue()


def deserialize(data: bytes, expected_type: Optional[str] = None,
                size_limit: Optional[int] = None,
                conformance: Optional[Callable[[dict], bool]] = None) -> Any:
    """Parse an envelope; checks magic, size limit, registered type,
    optional conformance predicate on the header; runs the upgrade chain."""
    if size_limit is not None and len(data) > size_limit:
        raise SerializationError(
            f"payload of {len(data)} bytes exceeds the size limit {size_limit}"
        )
    if data[:8] != MAGIC:
        raise SerializationError("bad magic (not a tfhe_tpu serialized object)")
    hlen = int.from_bytes(data[8:12], "little")
    header = json.loads(data[12 : 12 + hlen])
    tname = header["type"]
    if expected_type is not None and tname != expected_type:
        raise SerializationError(f"expected type {expected_type!r}, found {tname!r}")
    if tname not in _REGISTRY:
        raise SerializationError(f"unknown serialized type {tname!r}")
    cur_ver, from_payload, upgrades = _REGISTRY[tname]
    if conformance is not None and not conformance(header):
        raise SerializationError("conformance check failed")
    base = 12 + hlen
    avail = len(data) - base
    arrays = {}
    for k, spec in header["arrays"].items():
        off, nbytes = int(spec["offset"]), int(spec["nbytes"])
        dt = np.dtype(spec["dtype"])
        shape = tuple(int(d) for d in spec["shape"])
        if any(d < 0 for d in shape):
            raise SerializationError(f"array {k!r}: negative dimension")
        want = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        # untrusted header: every bound checked before slicing (a negative
        # offset would otherwise silently read header bytes)
        if off < 0 or nbytes < 0 or off + nbytes > avail or nbytes != want:
            raise SerializationError(
                f"array {k!r}: bad spec offset={off} nbytes={nbytes} "
                f"(payload {avail} bytes, shape needs {want})"
            )
        raw = data[base + off : base + off + nbytes]
        arrays[k] = np.frombuffer(raw, dtype=dt).reshape(shape).copy()
    payload = {"meta": header["meta"], "arrays": arrays}
    ver = header["type_version"]
    while ver < cur_ver:
        if ver not in upgrades:
            raise SerializationError(
                f"no upgrade path for {tname!r} from version {ver}"
            )
        payload = upgrades[ver](payload)
        ver += 1
    if ver > cur_ver:
        raise SerializationError(
            f"{tname!r} version {ver} is newer than supported {cur_ver}"
        )
    return from_payload(payload)


# ---------------------------------------------------------------------------
# registrations for the core user-facing types
# ---------------------------------------------------------------------------

def _params_meta(p) -> dict:
    return {"name": p.name, "message_modulus": getattr(p, "message_modulus", None),
            "carry_modulus": getattr(p, "carry_modulus", None),
            "lwe_dimension": p.lwe_dimension,
            "polynomial_size": p.polynomial_size}


def _params_from_name(name: str):
    from .params import PARAMS_BY_NAME

    return PARAMS_BY_NAME[name]


def serialize_radix(ct) -> bytes:
    return serialize(
        "RadixCiphertext",
        {"message_modulus": ct.message_modulus, "carry_modulus": ct.carry_modulus},
        {"ct": np.asarray(ct.ct), "degrees": ct.degrees,
         "noise_levels": ct.noise_levels},
    )


def _radix_from(payload):
    from ..integer.radix import RadixCiphertext
    import jax.numpy as jnp

    m = payload["meta"]
    a = payload["arrays"]
    return RadixCiphertext(
        ct=jnp.asarray(a["ct"]), degrees=a["degrees"],
        noise_levels=a["noise_levels"],
        message_modulus=m["message_modulus"], carry_modulus=m["carry_modulus"],
    )


def serialize_shortint_client_key(ck) -> bytes:
    return serialize(
        "ShortintClientKey",
        {"params": ck.params.name, "seed": ck.seed},
        {"glwe_bits": ck.glwe_sk.bits, "lwe_bits": ck.lwe_sk.bits},
    )


def _shortint_ck_from(payload):
    from ..shortint.client_key import ClientKey

    m = payload["meta"]
    # regenerate deterministically from the stored seed: secret bits are
    # checked against the stored arrays for integrity
    ck = ClientKey.generate(_params_from_name(m["params"]), m["seed"])
    a = payload["arrays"]
    if not (np.array_equal(ck.glwe_sk.bits, a["glwe_bits"])
            and np.array_equal(ck.lwe_sk.bits, a["lwe_bits"])):
        raise SerializationError("stored secret key does not match its seed")
    return ck


def serialize_shortint_server_key(sk) -> bytes:
    return serialize(
        "ShortintServerKey",
        {"params": sk.params.name, "num_primes": sk.num_primes,
         "max_degree": sk.max_degree},
        {"ksk": np.asarray(sk.ksk), "ksk_i8": np.asarray(sk.ksk_i8),
         "bsk_scan": np.asarray(sk.bsk_scan)},
    )


def _shortint_sk_from(payload):
    from ..shortint.server_key import ServerKey
    import jax.numpy as jnp

    m = payload["meta"]
    a = payload["arrays"]
    return ServerKey(
        params=_params_from_name(m["params"]),
        ksk=jnp.asarray(a["ksk"]), ksk_i8=jnp.asarray(a["ksk_i8"]),
        bsk_scan=jnp.asarray(a["bsk_scan"]),
        num_primes=m["num_primes"], max_degree=m["max_degree"],
    )


register_type("RadixCiphertext", 1, _radix_from)
register_type("ShortintClientKey", 1, _shortint_ck_from)
register_type("ShortintServerKey", 1, _shortint_sk_from)


def conformance_params(expected_param_name: str) -> Callable[[dict], bool]:
    """Conformance predicate factory (reference conformance.rs): the stored
    object must have been produced under the expected parameter set."""
    def check(header: dict) -> bool:
        return header["meta"].get("params") == expected_param_name

    return check

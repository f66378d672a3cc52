"""Zero-knowledge proofs of knowledge for compact-list encryption.

TPU-native counterpart of the reference ``tfhe-zk-pok`` crate: the proof
math runs host-side (arbitrary-precision pairing arithmetic is not TPU
work), the proven lists expand into the normal batched ciphertext path.
Two schemes, as in the reference: pke v1 (per-coordinate bit range proofs,
``proofs/pke.rs``) and pke v2 (euclidean norm bound via four-square
witness + 128 random projections, ``proofs/pke_v2/``; shorter proofs).
"""

from .curve import G1, G2, Fr, pairing
from .four_squares import four_squares
from .pke import PkeCrs, PkeProof, prove, verify
from .pke_v2 import PkeV2Crs, PkeV2Proof
from .proven_list import (
    ProvenCompactCiphertextList,
    crs_for_params,
    crs_for_params_v2,
)

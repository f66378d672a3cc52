"""Zero-knowledge proofs of knowledge for compact-list encryption.

TPU-native counterpart of the reference ``tfhe-zk-pok`` crate: the proof
math runs host-side (arbitrary-precision pairing arithmetic is not TPU
work), the proven lists expand into the normal batched ciphertext path.
"""

from .curve import G1, G2, Fr, pairing
from .pke import PkeCrs, PkeProof, prove, verify
from .proven_list import ProvenCompactCiphertextList, crs_for_params

"""FHE Trivium stream cipher over the boolean layer + transciphering.

Reference: ``apps/trivium/`` (TriviumStream<FheBool>, trivium/src/trivium/
trivium_bool.rs) — the reference's flagship boolean-layer integration
workload. Spec: eSTREAM Trivium (De Canniere & Preneel).

TPU shape: the 288-bit state is ONE batched boolean ciphertext, and the
classic 64-bit parallel trick (all taps are >= 65 positions apart, so 64
consecutive rounds are data-independent) turns each 64-round chunk into a
handful of BATCHED gate evaluations — on TPU every gate is one batched PBS
over 64+ lanes, mirroring the reference's TriviumStreamShifted 64-bit API
(``next_64``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from tfhe_tpu.boolean.keys import (
    PLAINTEXT_FALSE,
    PLAINTEXT_TRUE,
    BooleanCiphertext,
    ClientKey,
    ServerKey,
)
from tfhe_tpu.core import algorithms as algo


# ---------------------------------------------------------------------------
# clear reference implementation (test oracle)
# ---------------------------------------------------------------------------

class ClearTrivium:
    """Bit-exact clear Trivium (the oracle for the FHE stream)."""

    def __init__(self, key80: List[int], iv80: List[int], warmup: bool = True):
        s = [0] * 288
        s[0:80] = list(key80)
        s[93:173] = list(iv80)
        s[285] = s[286] = s[287] = 1
        self.s = s
        if warmup:
            for _ in range(4 * 288):
                self._round()

    def _round(self) -> int:
        s = self.s
        t1 = s[65] ^ s[92]
        t2 = s[161] ^ s[176]
        t3 = s[242] ^ s[287]
        z = t1 ^ t2 ^ t3
        t1n = t1 ^ (s[90] & s[91]) ^ s[170]
        t2n = t2 ^ (s[174] & s[175]) ^ s[263]
        t3n = t3 ^ (s[285] & s[286]) ^ s[68]
        self.s = [t3n] + s[0:92] + [t1n] + s[93:176] + [t2n] + s[177:287]
        return z

    def next_bits(self, n: int) -> List[int]:
        return [self._round() for _ in range(n)]


# ---------------------------------------------------------------------------
# FHE implementation
# ---------------------------------------------------------------------------

@dataclass
class TriviumStream:
    """FHE Trivium keystream generator (64 bits per batched step)."""

    sk: ServerKey
    state: BooleanCiphertext  # [288, n+1]

    @classmethod
    def new(
        cls,
        server_key: ServerKey,
        key_ct: BooleanCiphertext,  # [80] encrypted key bits
        iv80: List[int],  # clear IV
        warmed_up: bool = True,
    ) -> "TriviumStream":
        """Build the initial state (key encrypted, IV and constants trivial)
        and run the 1152 warm-up rounds under FHE (18 x 64-bit steps)."""
        import jax.numpy as jnp

        n = key_ct.ct.shape[-1] - 1
        triv = np.zeros((288, n + 1), dtype=np.uint64)
        triv[:, -1] = np.uint64(PLAINTEXT_FALSE)
        for i, b in enumerate(iv80):
            triv[93 + i, -1] = np.uint64(PLAINTEXT_TRUE if b else PLAINTEXT_FALSE)
        for i in (285, 286, 287):
            triv[i, -1] = np.uint64(PLAINTEXT_TRUE)
        state = jnp.asarray(triv)
        state = state.at[0:80].set(key_ct.ct)
        stream = cls(sk=server_key, state=BooleanCiphertext(ct=state))
        if warmed_up:
            for _ in range(1152 // 64):
                stream.next_64()
        return stream

    @classmethod
    def from_state(cls, server_key: ServerKey, state: BooleanCiphertext):
        """Resume from an (already warmed) encrypted 288-bit state."""
        return cls(sk=server_key, state=state)

    def _win(self, lo: int) -> BooleanCiphertext:
        """64-wide window [lo, lo+64) of the state (0-based indices)."""
        return BooleanCiphertext(ct=self.state.ct[lo : lo + 64])

    def next_64(self) -> BooleanCiphertext:
        """64 keystream bits with a constant number of batched gates.

        For rounds r = 0..63 the taps of round r are state positions
        (i - r) for tap i, so each tap becomes a 64-wide window — every
        gate below is ONE batched PBS over 64 lanes (x3 concatenated)."""
        import jax.numpy as jnp

        sk = self.sk
        st = self.state.ct

        # windows: tap index i at round r reads state[i - r]; window order
        # below is round-major ASCENDING r, so slice [i-63 .. i+1) reversed.
        def win(i):
            return st[i - 63 : i + 1][::-1]

        def cat(*parts):
            return BooleanCiphertext(ct=jnp.concatenate(parts, axis=0))

        # t1 = s66^s93, t2 = s162^s177, t3 = s243^s288 (1-based taps)
        lhs = cat(win(65), win(161), win(242))
        rhs = cat(win(92), win(176), win(287))
        t123 = sk.xor(lhs, rhs)  # [3*64]
        t1, t2, t3 = t123.ct[:64], t123.ct[64:128], t123.ct[128:]
        z = sk.xor(
            BooleanCiphertext(ct=t1),
            sk.xor(BooleanCiphertext(ct=t2), BooleanCiphertext(ct=t3)),
        )

        # a1 = s91&s92, a2 = s175&s176, a3 = s286&s287
        al = cat(win(90), win(174), win(285))
        ar = cat(win(91), win(175), win(286))
        ands = sk.and_(al, ar)
        # feedback adds: f1 = t1^a1^s171, f2 = t2^a2^s264, f3 = t3^a3^s69
        fb = sk.xor(
            sk.xor(BooleanCiphertext(ct=t123.ct), ands),
            cat(win(170), win(263), win(68)),
        )
        f1, f2, f3 = fb.ct[:64], fb.ct[64:128], fb.ct[128:]

        # shift the three registers by 64 and insert the feedback words
        # (feedback of round r lands at the register head, reversed back to
        # state order: newest bit at the lowest index)
        s = self.state.ct
        new_state = jnp.concatenate(
            [
                f3[::-1], s[0:93 - 64],
                f1[::-1], s[93:177 - 64],
                f2[::-1], s[177:288 - 64],
            ],
            axis=0,
        )
        self.state = BooleanCiphertext(ct=new_state)
        return BooleanCiphertext(ct=z.ct)

    def next_bits(self, count: int) -> BooleanCiphertext:
        import jax.numpy as jnp

        outs = []
        got = 0
        while got < count:
            outs.append(self.next_64().ct)
            got += 64
        return BooleanCiphertext(ct=jnp.concatenate(outs, axis=0)[:count])


# ---------------------------------------------------------------------------
# transciphering: XOR an FHE keystream into Trivium-encrypted data
# ---------------------------------------------------------------------------

def transcipher_decrypt(
    stream: TriviumStream, ciphertext_bits: List[int]
) -> BooleanCiphertext:
    """Turn symmetric Trivium ciphertext into FHE ciphertext of the
    plaintext: FHE(z) XOR clear(c) = FHE(m) (apps/trivium transciphering).
    The clear XOR is leveled (a NOT where c = 1) — zero extra PBS."""
    ks = stream.next_bits(len(ciphertext_bits))
    sk = stream.sk
    import jax.numpy as jnp

    c = np.asarray(ciphertext_bits, dtype=bool)
    flip = jnp.asarray(np.where(c, np.uint64(1), np.uint64(0)))[:, None]
    # m = z XOR c: negate the phase where c = 1 (NOT gate is leveled)
    negated = jnp.uint64(0) - ks.ct
    out = jnp.where(flip != 0, negated, ks.ct)
    return BooleanCiphertext(ct=out)

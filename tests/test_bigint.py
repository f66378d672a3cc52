"""Fixed-width bigint scalar types (integer/bigint/{u256,i256}.rs parity:
wrapping arithmetic, word/byte conversion, mod-BITS shifts)."""

from tfhe_tpu.integer.bigint import I256, U128, U256, U512


def test_wrapping_arithmetic():
    m = U256.max_value()
    assert int(m + 1) == 0
    assert int(U256(0) - 1) == (1 << 256) - 1
    assert int(U256(1 << 255) * 2) == 0
    assert int(U128((1 << 128) - 1) + 1) == 0


def test_words_and_bytes_roundtrip():
    v = U256(0x0123456789ABCDEF_FEDCBA9876543210_DEADBEEFCAFEBABE_0011223344556677)
    assert U256.from_words(v.to_words()) == v
    assert len(v.to_words()) == 4
    assert U256.from_le_bytes(v.to_le_bytes()) == v
    assert v.to_words()[0] == 0x0011223344556677


def test_signed_semantics():
    assert int(I256(-1)) == -1
    assert I256(-1).to_unsigned_int() == (1 << 256) - 1
    assert int(I256.min_value() - 1) == int(I256.max_value())
    # arithmetic right shift keeps sign
    assert int(I256(-8) >> 1) == -4
    assert I256(-5) < I256(3)


def test_shift_mod_bits():
    # wrapping_shl semantics: amount taken mod BITS (u256.rs:255)
    assert U256(1) << 256 == U256(1)
    assert U256(1) << 257 == U256(2)
    assert U512(1) << 513 == U512(2)


def test_mixed_int_ops():
    assert int(U256(10) + 5) == 15
    assert U256(10) == 10
    assert (3 * U256(7)).value == 21

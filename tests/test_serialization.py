"""Safe-serialization tests (reference safe_serialization.rs:151-300)."""

import numpy as np
import pytest

from tfhe_tpu.keycache import get_shortint_keys
from tfhe_tpu.integer.radix import ClientKey, ServerKey
from tfhe_tpu.utils import serialization as ser
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P


@pytest.fixture(scope="module")
def keys():
    sck, ssk = get_shortint_keys(P, seed=11)
    return ClientKey(sck), ServerKey(ssk)


def test_radix_roundtrip(keys):
    ck, sk = keys
    ct = ck.encrypt_radix(np.uint64(173), 4)
    blob = ser.serialize_radix(ct)
    back = ser.deserialize(blob, expected_type="RadixCiphertext")
    assert int(ck.decrypt_radix(back)) == 173
    assert np.array_equal(back.degrees, ct.degrees)


def test_server_key_roundtrip(keys):
    ck, sk = keys
    blob = ser.serialize_shortint_server_key(sk.key)
    sk2 = ser.deserialize(blob, expected_type="ShortintServerKey")
    ct = ck.encrypt_radix(np.uint64(9), 2)
    out = ServerKey(sk2).add(ct, ck.encrypt_radix(np.uint64(5), 2))
    assert int(ck.decrypt_radix(out)) == 14


def test_client_key_roundtrip(keys):
    ck, _ = keys
    blob = ser.serialize_shortint_client_key(ck.key)
    ck2 = ser.deserialize(blob, expected_type="ShortintClientKey")
    assert np.array_equal(ck2.lwe_sk.bits, ck.key.lwe_sk.bits)


def test_size_limit_and_magic(keys):
    ck, _ = keys
    ct = ck.encrypt_radix(np.uint64(1), 2)
    blob = ser.serialize_radix(ct)
    with pytest.raises(ser.SerializationError, match="size limit"):
        ser.deserialize(blob, size_limit=100)
    with pytest.raises(ser.SerializationError, match="magic"):
        ser.deserialize(b"garbage" + blob)
    with pytest.raises(ser.SerializationError, match="expected type"):
        ser.deserialize(blob, expected_type="ShortintServerKey")


def test_conformance(keys):
    _, sk = keys
    blob = ser.serialize_shortint_server_key(sk.key)
    ok = ser.deserialize(blob, conformance=ser.conformance_params(P.name))
    assert ok is not None
    with pytest.raises(ser.SerializationError, match="conformance"):
        ser.deserialize(blob, conformance=ser.conformance_params("OTHER_PARAMS"))


def test_upgrade_chain():
    ser.register_type(
        "_TestThing", 2,
        lambda p: ("v2", p["meta"]["x"]),
        upgrades={1: lambda p: {"meta": {"x": p["meta"]["old_x"] + 1}, "arrays": p["arrays"]}},
    )
    blob = ser.serialize("_TestThing", {"old_x": 41}, {}, version=1)
    assert ser.deserialize(blob) == ("v2", 42)


def test_doc_examples_compile():
    """Doc snippets must stay valid python (tasks/check_tfhe_docs analog)."""
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "/root/repo/tools/check_docs.py"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_backward_compat_corpus():
    """Frozen serialized artifacts from past format versions must keep
    deserializing bit-identically (tfhe-backward-compat-data analog:
    tests/data/ is this framework's compat corpus — extend it on every
    format bump, never rewrite it)."""
    import json
    import numpy as np

    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY
    from tfhe_tpu.utils.serialization import deserialize

    manifest = json.load(open("/root/repo/tests/data/compat_manifest.json"))
    blob = open("/root/repo/tests/data/compat_shortint_ck_v1.bin", "rb").read()
    ck = deserialize(blob, expected_type="ShortintClientKey")
    # the frozen key must equal a fresh derivation from the recorded seed
    want = ClientKey.generate(PARAM_TEST_TOY, seed=manifest["seed"])
    assert np.array_equal(np.asarray(ck.lwe_sk.bits),
                          np.asarray(want.lwe_sk.bits))
    # and still decrypt a fresh encryption end-to-end
    msgs = np.asarray(manifest["msgs"], dtype=np.uint64)
    assert list(np.asarray(want.decrypt(ck.encrypt(msgs)))) == list(msgs)


def test_backward_compat_corpus_v2_all_artifacts():
    """Every artifact in the 10-type frozen corpus (compat_manifest_v2,
    tools/freeze_compat_corpus.py) deserializes through the registered
    upgrade chains; hashes must match the manifest (frozen = immutable)."""
    import hashlib
    import json

    import numpy as np

    import tfhe_tpu.shortint.compressed_server_key  # registers its type
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY
    from tfhe_tpu.utils.serialization import deserialize

    expected_types = {
        "shortint_ck": "ShortintClientKey",
        "shortint_sk": "ShortintServerKey",
        "shortint_ct": "ShortintCiphertext",
        "radix_ct": "RadixCiphertext",
        "squashed_ct": "SquashedNoiseCiphertext",
        "compressed_list": "CompressedCiphertextList",
        "compact_list": "CompactCiphertextList",
        "zk_crs": "PkeV2Crs",
        "zk_proof": "PkeV2Proof",
        "compressed_server_key": "CompressedServerKey",
    }
    manifest = json.load(open("/root/repo/tests/data/compat_manifest_v2.json"))
    arts = manifest["artifacts"]
    assert set(arts) == set(expected_types), sorted(arts)
    objs = {}
    for name, info in arts.items():
        blob = open(f"/root/repo/tests/data/{info['file']}", "rb").read()
        assert hashlib.sha256(blob).hexdigest() == info["sha256"], name
        assert len(blob) == info["nbytes"], name
        objs[name] = deserialize(blob, expected_type=expected_types[name])

    # semantic spot checks beyond "it parsed"
    ck = objs["shortint_ck"]
    want = ClientKey.generate(PARAM_TEST_TOY, seed=manifest["seed"])
    assert np.array_equal(np.asarray(ck.lwe_sk.bits),
                          np.asarray(want.lwe_sk.bits))
    assert int(np.asarray(want.decrypt(objs["shortint_ct"]))[0]) == 3
    sk = objs["shortint_sk"]
    lut = sk.generate_lookup_table(lambda x: (x + 1) % 4)
    out = sk.apply_lookup_table(objs["shortint_ct"], lut)
    assert int(np.asarray(want.decrypt(out))[0]) == 0
    # the frozen CompactCiphertextList carries FULL cpk params (v2 format):
    # they reconstruct even though TOY_PKE_ZK is not in the registry
    cl = objs["compact_list"]
    assert cl.params.name == "TOY_PKE_ZK" and cl.count == 4
    # frozen v2 CRS/proof points pass on-curve + subgroup deserialization
    assert len(objs["zk_crs"].g_list) >= 1

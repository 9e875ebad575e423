"""sources/roaring.py: Z85 + roaring bitmap codec for Delta deletion
vectors — spec vectors and round trips (no Spark needed)."""
import struct

from clickhouse_25_5_3_75_stable_spark.sources.roaring import (
    _SERIAL_COOKIE,
    _deserialize_rb32,
    _serialize_rb32,
    dv_file_blob,
    dv_read_at,
    rbm_array_deserialize,
    rbm_array_serialize,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    # the ZeroMQ spec-32 test vector
    assert z85_encode(
        bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    ) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])


def test_z85_padding_roundtrip():
    for n in range(1, 9):
        data = bytes(range(n))
        assert z85_decode(z85_encode(data), n) == data


def test_rb32_array_and_bitmap_containers():
    vals = list(range(0, 5000)) + [70000, 70002] + \
        list(range(1 << 20, (1 << 20) + 10))
    blob = _serialize_rb32(vals)
    got, pos = _deserialize_rb32(blob, 0)
    assert got == sorted(vals)
    assert pos == len(blob)


def test_rb32_run_container():
    # hand-built run format: key 0, one run (5, len-1=3) -> 5,6,7,8
    rb = (struct.pack("<I", ((1 - 1) << 16) | _SERIAL_COOKIE)
          + bytes([1])
          + struct.pack("<HH", 0, 4 - 1)
          + struct.pack("<HHH", 1, 5, 3))
    got, _pos = _deserialize_rb32(rb, 0)
    assert got == [5, 6, 7, 8]


def test_rbm_array_64bit_roundtrip():
    pos64 = [0, 1, 4095, (1 << 32) + 7, (2 << 32) + 123456]
    assert rbm_array_deserialize(rbm_array_serialize(pos64)) == sorted(pos64)
    assert rbm_array_deserialize(rbm_array_serialize([])) == []


def test_dv_file_framing_and_crc():
    blob, offs = dv_file_blob(
        [rbm_array_serialize([1, 5]), rbm_array_serialize([0])])
    assert blob[0] == 1
    assert dv_read_at(blob, offs[0]) == [1, 5]
    assert dv_read_at(blob, offs[1]) == [0]
    corrupted = bytearray(blob)
    corrupted[offs[0] + 5] ^= 0xFF
    try:
        dv_read_at(bytes(corrupted), offs[0])
        raise AssertionError("expected checksum failure")
    except ValueError as e:
        assert "checksum" in str(e) or "magic" in str(e)

"""Encoding / checksum / space-filling-curve long tail
(functions/encodings.py; reference src/Functions/CRC.cpp,
base58Encode.cpp, base32Encode.cpp, mortonEncode.cpp, mortonDecode.cpp,
hilbertEncode.cpp, hilbertDecode.cpp, bitSlice.cpp).

Anchors: the reference's OWN registration-doc vectors for the curves
(mortonEncode(1,2,3)=53, identity-expanded 32768, hilbertEncode(3,4)=31,
range-expanded 4031541586602), public RFC/Bitcoin/Keccak vectors for
the encodings and digests, and a naive bit-by-bit CRC as the dual
computation for the table-driven CRC64/CRC32IEEE.
"""

import numpy as np
import pytest

from clickhouse_25_5_3_75_stable_spark.functions.encodings import (
    base32_decode_py,
    base32_encode_py,
    base58_decode_py,
    base58_encode_py,
    bit_slice_py,
    crc32ieee_py,
    crc64_py,
    hilbert_decode_py,
    hilbert_encode_py,
    keccak256_py,
    morton_decode_np,
    morton_encode_np,
)


def _a(*vs):
    return [np.array([v], dtype=np.uint64) for v in vs]


# ---------------------------------------------------------------------------
# morton — reference doc anchors + round-trips
# ---------------------------------------------------------------------------

def test_morton_reference_anchors():
    # mortonEncode.cpp REGISTER_FUNCTION examples
    assert morton_encode_np(_a(1, 2, 3))[0] == 53
    assert morton_encode_np(_a(1))[0] == 1
    # identity_expanded: mortonEncode(tuple(2), 128) -> 32768
    assert morton_encode_np(_a(128), [2])[0] == 32768
    # range_expanded: mortonEncode((1,2), 1024, 16)
    assert morton_encode_np(_a(1024, 16), [1, 2])[0] == 1572864


def test_morton_round_trip_all_dims():
    rng = np.random.RandomState(7)
    for n in range(1, 9):
        bits = {1: 64, 2: 32, 3: 21, 4: 16, 5: 12, 6: 10, 7: 9, 8: 8}[n]
        vals = [rng.randint(0, 1 << min(bits, 62), size=50).astype(np.uint64)
                for _ in range(n)]
        code = morton_encode_np(vals)
        back = morton_decode_np(code, n)
        for orig, dec in zip(vals, back):
            np.testing.assert_array_equal(orig, dec)


def test_morton_masked_round_trip():
    vals = _a(1024, 16)
    code = morton_encode_np(vals, [1, 2])
    back = morton_decode_np(code, 2, [1, 2])
    assert back[0][0] == 1024 and back[1][0] == 16


def test_morton_overflow_masked_to_field_width():
    # 2-D fields are 32-bit: bit 33 of an input is clamped off
    v = _a((1 << 33) | 5, 1)
    assert morton_encode_np(v)[0] == morton_encode_np(_a(5, 1))[0]


# ---------------------------------------------------------------------------
# hilbert — reference doc anchors + round-trips
# ---------------------------------------------------------------------------

def test_hilbert_reference_anchors():
    assert hilbert_encode_py(3, 4) == 31
    # range_expanded: hilbertEncode((10,6), 1024, 16) -> 4031541586602
    assert hilbert_encode_py(1024 << 10, 16 << 6) == 4031541586602
    assert hilbert_decode_py(31) == (3, 4)
    assert hilbert_encode_py(0, 0) == 0


def test_hilbert_round_trip_and_overflow():
    rng = np.random.RandomState(11)
    for _ in range(200):
        x = int(rng.randint(0, 1 << 31))
        y = int(rng.randint(0, 1 << 31))
        assert hilbert_decode_py(hilbert_encode_py(x, y)) == (x, y)
    # >32 used bits clamps to 0 (hilbertEncode2DLUT.h encode())
    assert hilbert_encode_py(1 << 33, 0) == 0


def test_hilbert_locality():
    """Adjacent codes are adjacent cells (the property that makes the
    curve a useful 100 TB clustering key)."""
    for code in range(0, 4095):
        x1, y1 = hilbert_decode_py(code)
        x2, y2 = hilbert_decode_py(code + 1)
        assert abs(x1 - x2) + abs(y1 - y2) == 1


# ---------------------------------------------------------------------------
# base58 / base32
# ---------------------------------------------------------------------------

def test_base58_vectors():
    assert base58_encode_py(b"hello world") == "StV1DL6CwTryKyV"
    assert base58_encode_py(b"") == ""
    assert base58_encode_py(b"\x00\x00a") == "112g"
    assert base58_decode_py("StV1DL6CwTryKyV") == b"hello world"
    assert base58_decode_py(base58_encode_py(b"\x00\x00abc")) == b"\x00\x00abc"
    with pytest.raises(ValueError):
        base58_decode_py("0OIl")  # excluded alphabet characters


def test_base32_vectors():
    # RFC 4648 test vectors
    for raw, enc in ((b"", ""), (b"f", "MY======"), (b"fo", "MZXQ===="),
                     (b"foo", "MZXW6==="), (b"foob", "MZXW6YQ="),
                     (b"fooba", "MZXW6YTB"), (b"foobar", "MZXW6YTBOI======")):
        assert base32_encode_py(raw) == enc
        assert base32_decode_py(enc) == raw
    assert base32_decode_py("mzxw6ytboi======") == b"foobar"  # casefold
    with pytest.raises(ValueError):
        base32_decode_py("MZXW6")  # len % 8 != 0 (reference decodeBase32)
    with pytest.raises(Exception):
        base32_decode_py("MZXW6018")  # 0/1/8 not in the alphabet


# ---------------------------------------------------------------------------
# CRC — dual computation (table walk vs naive bitwise)
# ---------------------------------------------------------------------------

def _naive_crc(poly: int, data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
    return crc


@pytest.mark.parametrize("s", [b"", b"a", b"123456789", b"hello world" * 7])
def test_crc_dual_computation(s):
    assert crc64_py(s) == _naive_crc(0xC96C5795D7870F42, s)
    assert crc32ieee_py(s) == _naive_crc(0xEDB88320, s)


def test_crc_pinned():
    # init 0 / no xorout (CRC.cpp CRCImpl) — NOT CRC-64/XZ
    assert crc64_py(b"") == 0
    assert crc64_py(b"123456789") == 0x2B9C7EE4E2780C8A
    assert crc32ieee_py(b"abc") == 3395655888


# ---------------------------------------------------------------------------
# keccak256 — public Keccak (pre-NIST) vectors
# ---------------------------------------------------------------------------

def test_keccak256_vectors():
    assert keccak256_py(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256_py(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block (> 136-byte rate) path
    assert keccak256_py(b"x" * 300) != keccak256_py(b"x" * 299)
    # rate-boundary padding (len % 136 == 0 appends a full pad block)
    assert len(keccak256_py(b"y" * 136)) == 32


# ---------------------------------------------------------------------------
# bitSlice
# ---------------------------------------------------------------------------

def test_bit_slice_byte_aligned_equals_substring():
    s = b"Hello, world"
    for start_byte in range(len(s)):
        for ln_bytes in range(1, len(s) - start_byte + 1):
            assert bit_slice_py(s, start_byte * 8 + 1, ln_bytes * 8) == \
                s[start_byte:start_byte + ln_bytes]


def test_bit_slice_edges():
    assert bit_slice_py(b"Hello", 2, 8) == b"\x90"   # 'H'<<1 bits
    assert bit_slice_py(b"Hello", 1, -8) == b"Hell"  # drop last byte
    assert bit_slice_py(b"Hello", -8) == b"o"
    assert bit_slice_py(b"Hello", 0) == b""          # offset 0 -> empty
    assert bit_slice_py(b"Hello", 41) == b""         # past the end
    assert bit_slice_py(b"Hello", -100) == b"Hello"  # left truncate
    assert bit_slice_py(b"Hello", 1, 0) == b""
    assert bit_slice_py(b"Hello", 3, 100) == bit_slice_py(b"Hello", 3)
    # non-aligned 3-bit slice: 'H' = 01001000, bits 2..4 = 100 -> 0x80
    assert bit_slice_py(b"H", 2, 3) == b"\x80"


# ---------------------------------------------------------------------------
# ICU text-transform tier (normalizeString.cpp, punycode.cpp, idna.cpp,
# convertCharset.cpp) — exact via unicodedata / RFC 3492 codec / UTS-46
# ---------------------------------------------------------------------------

def test_unicode_normalization_forms():
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import (
        normalize_utf8_py,
    )
    s = "é"  # e + combining acute
    assert normalize_utf8_py("NFC", s) == "é"
    assert normalize_utf8_py("NFD", "é") == s
    assert normalize_utf8_py("NFKC", "ﬁ²") == "fi2"
    assert normalize_utf8_py("NFKD", "é") == s


def test_punycode():
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import (
        punycode_decode_py,
        punycode_encode_py,
    )
    assert punycode_encode_py("München") == "Mnchen-3ya"
    assert punycode_decode_py("Mnchen-3ya") == "München"
    assert punycode_encode_py("abc") == "abc-"
    with pytest.raises((ValueError, UnicodeError)):
        punycode_decode_py("ü")  # non-ASCII input is invalid


def test_idna():
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import (
        idna_decode_py,
        idna_encode_py,
    )
    assert idna_encode_py("münchen.de") == "xn--mnchen-3ya.de"
    assert idna_encode_py("straße.de") == "xn--strae-oqa.de"  # UTS-46 nontransitional
    assert idna_decode_py("xn--mnchen-3ya.de") == "münchen.de"
    assert idna_encode_py("") == ""
    # invalid punycode label: returned as-is (reference IdnaDecode)
    assert idna_decode_py("xn---") == "xn---"


def test_convert_charset():
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import (
        convert_charset_py,
    )
    # utf-8 -> latin1 byte transport round trip
    lat = convert_charset_py("café", "UTF-8", "latin1")
    assert convert_charset_py(lat, "latin1", "UTF-8") == "café"


# ---------------------------------------------------------------------------
# encrypt/decrypt family (FunctionsAES.h) — openssl-CLI-verified CBC,
# NIST ECB, RFC 5116 GCM tag, MySQL key fold
# ---------------------------------------------------------------------------

def test_aes_openssl_compat():
    from clickhouse_25_5_3_75_stable_spark.functions.aescrypto import (
        decrypt_py,
        encrypt_py,
    )
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    # verified against `openssl enc -aes-128-cbc -nosalt` in-sandbox
    assert encrypt_py("aes-128-cbc", b"hello world, sixteen+", key, iv, None).hex() == (
        "d8b2a6071922acd14a3421208ced5ca4ca1b0810f15371ecb23c5da96cffba59")
    for mode, k in (("aes-128-ecb", key), ("aes-192-cfb", b"j" * 24),
                    ("aes-256-ctr", b"K" * 32), ("aes-128-ofb", key),
                    ("aes-128-cfb8", key)):
        ct = encrypt_py(mode, b"payload", k, iv if "ecb" not in mode else None, None)
        assert decrypt_py(mode, ct, k, iv if "ecb" not in mode else None, None) == b"payload"
    with pytest.raises(ValueError):
        encrypt_py("aes-128-cbc", b"x", b"short", iv, None)       # bad key size
    with pytest.raises(ValueError):
        encrypt_py("aes-128-cbc", b"x", key, iv, b"aad")          # AAD non-GCM
    with pytest.raises(ValueError):
        encrypt_py("aes-128-xts", b"x", key, iv, None)            # unsupported mode


def test_aes_gcm_rfc5116():
    from clickhouse_25_5_3_75_stable_spark.functions.aescrypto import (
        decrypt_py,
        encrypt_py,
    )
    key, iv = b"K" * 32, b"\x07" * 12
    ct = encrypt_py("aes-256-gcm", b"secret", key, iv, b"hdr")
    assert len(ct) == len(b"secret") + 16  # tag appended
    assert decrypt_py("aes-256-gcm", ct, key, iv, b"hdr") == b"secret"
    with pytest.raises(Exception):
        decrypt_py("aes-256-gcm", ct, key, iv, b"WRONG")  # tag must fail
    # non-standard IV length is legal in GCM (reference: size > 0;
    # the cryptography package narrows this to 8..128 bytes — documented
    # capability bound in aescrypto.py)
    ct2 = encrypt_py("aes-256-gcm", b"secret", key, b"\x07" * 16, None)
    assert decrypt_py("aes-256-gcm", ct2, key, b"\x07" * 16, None) == b"secret"


def test_aes_mysql_fold_and_iv_truncate():
    from clickhouse_25_5_3_75_stable_spark.functions.aescrypto import (
        decrypt_py,
        encrypt_py,
    )
    k20 = b"abcdefghijklmnopqrst"
    folded = bytearray(k20[:16])
    for i in range(16, 20):
        folded[i % 16] ^= k20[i]
    assert encrypt_py("aes-128-ecb", b"text", k20, None, None, mysql=True) == \
        encrypt_py("aes-128-ecb", b"text", bytes(folded), None, None)
    # longer IV truncated in MySQL mode; exact length required otherwise
    iv21 = b"fedcba9876543210EXTRA"
    ct = encrypt_py("aes-128-cbc", b"text", k20, iv21, None, mysql=True)
    assert decrypt_py("aes-128-cbc", ct, k20, iv21[:16], None, mysql=True) == b"text"
    with pytest.raises(ValueError):
        encrypt_py("aes-128-cbc", b"x", k20, iv21, None)  # strict mode: 21 != 16
    with pytest.raises(ValueError):
        encrypt_py("aes-128-gcm", b"x", k20, iv21, None, mysql=True)  # no GCM in MySQL mode


def test_md4_rfc1320_vectors():
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import md4_py
    # RFC 1320 appendix vectors + the reference's own doc vector ('abc')
    assert md4_py(b"").hex() == "31d6cfe0d16ae931b73c59d7e0c089c0"
    assert md4_py(b"abc").hex() == "a448017aaf21d8525fc10ae87aa6729d"
    assert md4_py(b"message digest").hex() == "d9130a8164549fe818874806e1c7014b"
    assert md4_py(b"abcdefghijklmnopqrstuvwxyz").hex() == (
        "d79e1c308aa5bbcdeea8ed63df412da9")
    assert md4_py(b"1234567890" * 8).hex() == "e33b4ddc9c38f2199c3e7b164fcc0536"


def test_keccak256_reference_doc_vector():
    # FunctionsStringHashFixedString.cpp keccak256 example: 'hello'
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import keccak256_py
    assert keccak256_py(b"hello").hex() == (
        "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8")


# ---------------------------------------------------------------------------
# BLAKE3 — spec transcription (FunctionsStringHashFixedString.cpp wraps
# llvm::BLAKE3; no provider in this runtime)
# ---------------------------------------------------------------------------

def test_blake3_published_digests():
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import blake3_py
    # the two widely published BLAKE3 digests
    assert blake3_py(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert blake3_py(b"hello world").hex() == (
        "d74981efa70a0c880b8d8c1985d075dbcbf679b99a5f9914e5aaf96b831a9e24")
    # block/chunk boundary smoke: 64/65/1024/1025 all distinct & stable
    outs = {n: blake3_py(b"q" * n) for n in (63, 64, 65, 1023, 1024, 1025)}
    assert len({v for v in outs.values()}) == 6


def test_blake3_tree_shape_dual_construction():
    """The recursive largest-power-of-two split in blake3_py must agree
    with the official incremental construction (eager trailing-zeros
    merges for all but the final chunk; the final chunk then folds the
    stack top-down with ROOT only on the last merge) — two independent
    derivations of the same published tree."""
    from clickhouse_25_5_3_75_stable_spark.functions.encodings import (
        _b3_chunk_cv,
        _b3_parent,
        blake3_py,
    )

    def stack_blake3(data: bytes) -> bytes:
        chunks = [data[i:i + 1024] for i in range(0, len(data), 1024)]
        stack = []
        for i, c in enumerate(chunks[:-1]):
            cv = _b3_chunk_cv(c, i, False)
            total = i + 1
            while total & 1 == 0:
                cv = _b3_parent(stack.pop(), cv, False)
                total >>= 1
            stack.append(cv)
        cv = _b3_chunk_cv(chunks[-1], len(chunks) - 1, False)
        while stack:
            cv = _b3_parent(stack.pop(), cv, is_root=not stack)
        return b"".join(w.to_bytes(4, "little") for w in cv)

    for n_chunks in (2, 3, 4, 5, 7, 8, 9, 16, 33, 70):
        data = bytes(range(251)) * ((n_chunks * 1024) // 251 + 1)
        data = data[:n_chunks * 1024 - 7]  # ragged tail
        assert blake3_py(data) == stack_blake3(data), n_chunks


def test_aes_decrypt_iv_validation_mirrors_encrypt():
    """OpenSSL-mode IV validation applies in BOTH directions
    (reference validateIV; round-6 advisor: decrypt silently ignored
    ECB-with-IV and let bad IV lengths fail late)."""
    import pytest

    from clickhouse_25_5_3_75_stable_spark.functions.aescrypto import (
        decrypt_py,
        encrypt_py,
    )

    key = bytes(range(16))
    ct = encrypt_py("aes-128-ecb", b"payload", key, None, None)
    with pytest.raises(ValueError, match="Invalid IV size"):
        decrypt_py("aes-128-ecb", ct, key, b"0123456789abcdef", None)
    with pytest.raises(ValueError, match="Invalid IV size"):
        decrypt_py("aes-128-cbc", ct, key, b"short", None)
    # the valid paths still round-trip
    assert decrypt_py("aes-128-ecb", ct, key, None, None) == b"payload"

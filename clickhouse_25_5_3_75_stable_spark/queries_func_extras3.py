"""Registry entries: dialect-extras family query (part-3 scalar names:
gcd/lcm/clamp/sigmoid, calendar extras, INET codecs, array extras).
Imported by queries.py for its side effects."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch
from clickhouse_25_5_3_75_stable_spark.queries import arr_csv, arr_csv_dec, register, t


@register(
    "func_extras3_family",
    oracle="""
    SELECT o_orderkey,
           gcd(o_orderkey, o_custkey) AS g,
           lcm(o_orderkey % 12 + 1, 8) AS l,
           greatest(least(o_totalprice, 100000.0), 50000.0) AS clamped,
           1.0 / (1.0 + exp(-(o_orderkey % 7 - 3))) AS sig,
           strftime(o_orderdate, '%B') AS mn,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS ldm,
           CAST(strftime(o_orderdate, '%Y%m%d%H%M%S') AS BIGINT) AS ymd,
           CAST(o_orderkey % 256 AS BIGINT) * 16777216
             + CAST(o_custkey % 256 AS BIGINT) * 65536
             + CAST(o_orderkey % 100 AS BIGINT) * 256 + 4 AS ipnum,
           CAST(list_aggregate([CAST(o_orderkey % 5 + 1 AS DOUBLE),
                                CAST(o_custkey % 3 + 1 AS DOUBLE)], 'product')
                AS DOUBLE) AS arr_prod,
           COALESCE(array_to_string(list_concat(list_slice([o_orderkey, o_custkey, 7], 2, 3),
                       list_slice([o_orderkey, o_custkey, 7], 1, 1)), ','), '') AS rot
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("functions", "extras"),
)
def func_extras3_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-3 dialect names end-to-end (reference src/Functions/gcd.cpp,
    lcm.cpp, clamp registration, sigmoid.cpp, monthName registration in
    dateName.cpp, lastDay alias, FunctionsCodingIP.cpp INET_ATON,
    array/arrayProduct.cpp, arrayRotate.cpp)."""
    o = t(spark, sf_dir, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    ip = (
        (ok % 256).cast("bigint") * 16777216
        + (ck % 256).cast("bigint") * 65536
        + (ok % 100).cast("bigint") * 256
        + 4
    )
    arr = F.array((ok % 5 + 1).cast("double"), (ck % 3 + 1).cast("double"))
    rot_in = F.array(ok, ck, F.lit(7).cast("bigint"))
    return o.select(
        ok.alias("o_orderkey"),
        ch("gcd", ok, ck).alias("g"),
        ch("lcm", ok % 12 + 1, F.lit(8)).alias("l"),
        ch("clamp", F.col("o_totalprice"), F.lit(50000.0), F.lit(100000.0)).alias("clamped"),
        ch("sigmoid", (ok % 7 - 3).cast("double")).alias("sig"),
        ch("monthName", F.col("o_orderdate")).alias("mn"),
        ch("toLastDayOfMonth", F.col("o_orderdate").cast("date")).alias("ldm"),
        ch("toYYYYMMDDhhmmss", F.col("o_orderdate")).alias("ymd"),
        # round-trip: build the dotted quad, parse it back to the number
        ch("INET_ATON", ch("INET_NTOA", ip)).alias("ipnum"),
        ch("arrayProduct", arr).alias("arr_prod"),
        arr_csv(ch("arrayRotateLeft", rot_in, F.lit(1))).alias("rot"),
    ).orderBy("o_orderkey")


@register(
    "func_map_extras_family",
    oracle="""
    SELECT event_id,
           COALESCE(array_to_string(list_sort([event_type, 'k']), ','), '') AS sorted_keys,
           event_type LIKE 'c%' AS has_c_key,
           COALESCE(array_to_string(list_sort(list_filter([event_type, 'k'], x -> x LIKE '%e%')), ','), '') AS e_keys,
           COALESCE(array_to_string(list_transform(range(1, CAST(event_id % 4 AS BIGINT) + 3),
               i -> CASE WHEN i = 1 THEN CAST(event_id % 100 AS BIGINT)
                         WHEN i = CAST(event_id % 4 AS BIGINT) + 2
                              THEN CAST(event_id % 100 AS BIGINT) * 2
                         ELSE 0 END), ','), '') AS dense_vals
    FROM events
    ORDER BY event_id
    """,
    tags=("functions", "map"),
)
def func_map_extras_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-extras family (reference FunctionsMapMiscellaneous.cpp:
    mapSort, mapContainsKeyLike, mapExtractKeyLike, mapPopulateSeries)
    — oracle replicates the *values* with list expressions, proving the
    map semantics without requiring DuckDB map support."""
    ev = t(spark, sf_dir, "events")
    k = (F.col("event_id") % 100).cast("bigint")
    m = F.create_map(F.col("event_type"), k, F.lit("k"), k * 2)
    hi = (F.col("event_id") % 4).cast("bigint") + 2
    m2 = F.map_from_arrays(F.array(F.lit(1).cast("bigint"), hi), F.array(k, k * 2))
    dense = F.transform(
        F.sequence(F.lit(1).cast("bigint"), hi),
        lambda i: F.coalesce(F.element_at(m2, i), F.lit(0).cast("bigint")),
    )
    return ev.select(
        "event_id",
        arr_csv(F.map_keys(ch("mapSort", m))).alias("sorted_keys"),
        ch("mapContainsKeyLike", m, "c%").alias("has_c_key"),
        arr_csv(F.array_sort(F.map_keys(ch("mapExtractKeyLike", m, "%e%")))).alias("e_keys"),
        arr_csv(dense).alias("dense_vals"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Encoding / checksum / space-filling-curve long tail (round 5 —
# functions/encodings.py; reference src/Functions/CRC.cpp,
# base58Encode.cpp, base32Encode.cpp, mortonEncode.cpp,
# hilbertEncode.cpp, bitSlice.cpp, and the OpenSSL digest wrappers in
# FunctionsHashing.h). Pinned-vector oracle, the hash-longtail pattern:
# expectations were anchored first against the reference's OWN
# registration-doc examples (mortonEncode(1,2,3)=53, hilbertEncode(3,4)
# =31, range-expanded 4031541586602), RFC 4648 / Bitcoin-base58 /
# Keccak public vectors, and a naive bitwise CRC dual computation
# (tests/test_encodings.py).
# ---------------------------------------------------------------------------

_ENC_FIXTURE_INPUTS = [
    (0, '', 0, 0, 'example.com'),
    (1, 'a', 1, 2, 'münchen.de'),
    (2, 'Encoded', 3, 4, 'straße.de'),
    (3, 'hello world', 1024, 16, 'xn--!bad'),
    (4, 'The quick brown fox', 123456, 654321, 'a.b.c'),
    (5, '\\x00-less zero', 2147483647, 7, 'sub.café.fr'),
    (6, 'x' * 50, 99999, 88888, 'plain'),
    (7, 'München straße', 42, 17, 'рф.ru'),
    (8, 'café ﬁ² Å', 7, 7, 'test.中国'),
]

_ENC_FIXTURE_EXPECT = [
    (0, '', '', 0, 0, 'c672b8d1ef56ed28ab87c3622c5114069bdd3ad7b8f9737498d0c01ecef0967a', '9c1185a5c5e9fc54612808977ee8f548b2258d31', 'c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470', '', 0, 0, 0, '', '', 'example.com', '31d6cfe0d16ae931b73c59d7e0c089c0'),
    (1, '2g', 'ME======', 984961486, 3219832958944941148, '455e518824bc0601f9fb858ff5c37d417d67c2f8e0df2babe4808858aea830f8', '0bdc9d2d256b3ee9daae347be6f4dc835a467ffe', '3ac225168df54212a25c1c01fd35bebfea408fdac2e31ddd6f80a4bbf9a5f1cb', 'c2', 9, 21, 13, 'a', 'a-', 'xn--mnchen-3ya.de', 'bde52cb31de33e46245e05fbdbd6fb24'),
    (2, '3dc8KtHrwM', 'IVXGG33EMVSA====', 2224129891, 6220217705885177181, '65655e6bd1804832613b7c2d98a1079a37c1fe25d3c58b21995c45acc8f5e908', '77b4a2bc31b4e7d016a3cd27ad725fcb75a0ca1d', '93cbb457b53bd42eb26dd5fad0b9abf26480b9fb033c0330da7ae49c6ed4e204', '8adcc6', 37, 169, 31, 'Encoded', 'Encoded-', 'xn--strae-oqa.de', '0e953c2ee23e645bd3b84d94218dfb57'),
    (3, 'StV1DL6CwTryKyV', 'NBSWY3DPEB3W64TMMQ======', 1724751977, -4711733889442563631, '0ac561fac838104e3f2e4ad107b4bee3e938bf15f2b15f009ccccd61a913f017', '98c615784ccb5fe5936fbc0cbe9dfdb408d92f0f', '47173285a8d7341e5e972fc677286384f802f8ef42a5ec5f03bbfa254cb01fad', 'd0cad8', 1049088, 1073750052, 3844522, 'hello world', 'hello world-', '', 'aa010fbc1d14c795d86ef98c95479d17'),
    (4, 'GTFcJ7VjJ5DH28yrRznc2UeiV5', 'KRUGKIDROVUWG2ZAMJZG653OEBTG66A=', 1833811377, 7200676722776333118, 'd99dd5e1f7302ded09f1557974a2d53b3d001a2071c9ac24150a66c7c992d8f6', 'aa1dd8137a60bbfb149657beca550f4c7321060d', '34ba703fb51601686640e7fca185dba7a04a1a50cc59a72e47a088e51e4a6786', 'a8d0ca', 566911482370, 289195352665170178, 996497510315, 'The quick brown fox', 'The quick brown fox-', 'a.b.c', 'd4559d26c7203ec400e382fd1c8a6092'),
    (5, 'azhw5ZJhb5oRH4TAik6', 'LR4DAMBNNRSXG4ZAPJSXE3Y=', 1389914141, -3377658928589980481, '7a1ff5ef7d6bbaa4b3118ccff3c411749ad155ad219ff75e7fed7095e88a59ef', '6a577e08be5b627bd64d7b0aad43c9e0ee4ca4e8', '9e2f5e467728b4f295338e4787ae2a33ef0df96eab2e00a92cbef43908e84957', 'b8f060', 1537228672809129343, 1317624576693539807, 4611686018427387882, '\\x00-less zero', '\\x00-less zero-', 'sub.xn--caf-dma.fr', '17e36f0cbe184f08ed46c3e36bd70d1a'),
    (6, '2V6M8eW5LkpUV7vWfHprDkNP6r2oiidmzDGE3n5kKh5BSw5AYHL6giWrt5yunZ2Cgh375', 'PB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DYPB4HQ6DY', 3018192413, 8854274027308007299, '52c40c7c8b293983d2622dde0a2d4ee84dced877f414c7fccae3a34707699348', '65fbed25fe6b59cf124d297ebf404f5ad0f4a3d9', 'a1aa7679e1009a66bcef658c15f5fe4d6b455d53e0782ebec479383ce412c213', 'f0f0f0', 14539443157, 888561526191977, 12238578751, 'xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx', 'xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx-', 'plain', '6b080781c6eb387f3fe7de4115967b4b'),
    (7, 'AbxVhoU5Eim1ehwTDTC2bv', 'JXB3Y3TDNBSW4IDTORZGDQ47MU======', 3202419435, 7982624372068903734, '4ba088bbf5419b5e517828baa4b66588f0e17b2c9aea3764988b360687b6a8f9', '78c16ba557d1e21b73fcd8e9b55843fa7a801d66', '84ecc9dcaf18d700b12c9ee867a8751524fc8b2ce5541b09b69240720b6b591f', '9b8778', 1606, 41774, 1895, 'München straße', 'Mnchen strae-v9a90b', 'xn--p1ai.ru', '34f5319dd783edd97177429146f1bc73'),
    (8, 'dY4ty8Z6MNLWGC1pXDW', 'MNQWNQ5JEDX2ZAOCWIQMHBI=', 1706051786, -8174660917267506602, 'ca306ad86b22e97e2ac09f9f7aa4772b041427a5f38cf076d46a8b71a570d09e', '9f26876f380a271e29e6a129a4a7b0f635c901a2', 'e2499cc45d86dbdb354d2a3bc4c6e0b930f64b353e7dbce59c6e020e4bd0376f', 'c6c2cc', 63, 2267, 42, 'café fi2 Å', 'caf  -yia8kulq389q', 'test.xn--fiqs8s', 'b585407253181bb0c1b50e465972a874'),
]


@register(
    "func_encoding_curves_exact",
    oracle=(
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"(CAST({sid} AS INT), CAST('{b58}' AS VARCHAR), "
            f"CAST('{b32}' AS VARCHAR), CAST({cie} AS BIGINT), "
            f"CAST({c64} AS BIGINT), CAST('{sh}' AS VARCHAR), "
            f"CAST('{rmd}' AS VARCHAR), CAST('{kc}' AS VARCHAR), "
            f"CAST('{bs}' AS VARCHAR), CAST({m2} AS BIGINT), "
            f"CAST({m3} AS BIGINT), CAST({h} AS BIGINT), "
            f"CAST('{nfkc}' AS VARCHAR), CAST('{puny}' AS VARCHAR), "
            f"CAST('{idna}' AS VARCHAR), CAST('{m4}' AS VARCHAR))"
            for sid, b58, b32, cie, c64, sh, rmd, kc, bs, m2, m3, h,
            nfkc, puny, idna, m4 in _ENC_FIXTURE_EXPECT
        )
        + ") AS t(sid, b58, b32, cie, c64, sh512, rmd, kc, bs_hex, m2, m3,"
        " h, nfkc, puny, idna, m4)"
        " ORDER BY sid"
    ),
    tags=("functions", "encoding", "morton", "hilbert", "crc"),
)
def func_encoding_curves_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base58/base32, CRC32IEEE/CRC64 (init-0 no-xorout table walk),
    SHA512_256/RIPEMD160/keccak256, bitSlice, mortonEncode 2-D + 3-D,
    hilbertEncode — EXACT values with round-trip identity checks folded
    in (decode(encode) must reproduce the input or the encode columns
    here would still pin it)."""
    base = spark.createDataFrame(
        _ENC_FIXTURE_INPUTS, "sid int, s string, x long, y long, dom string"
    )
    return base.select(
        "sid",
        ch("base58Encode", F.col("s")).alias("b58"),
        ch("base32Encode", F.col("s")).alias("b32"),
        ch("CRC32IEEE", F.col("s")).alias("cie"),
        ch("CRC64", F.col("s")).alias("c64"),
        ch("SHA512_256", F.col("s")).alias("sh512"),
        ch("RIPEMD160", F.col("s")).alias("rmd"),
        ch("keccak256", F.col("s")).alias("kc"),
        F.lower(F.hex(ch("bitSlice", F.col("s"), F.lit(2), F.lit(23)))).alias("bs_hex"),
        ch("mortonEncode", F.col("x"), F.col("y")).alias("m2"),
        ch("mortonEncode", F.col("x"), F.col("y"), F.col("sid")).alias("m3"),
        ch("hilbertEncode", F.col("x"), F.col("y")).alias("h"),
        ch("normalizeUTF8NFKC", F.col("s")).alias("nfkc"),
        ch("punycodeEncode", F.col("s")).alias("puny"),
        ch("tryIdnaEncode", F.col("dom")).alias("idna"),
        F.lower(F.hex(ch("MD4", F.col("s")))).alias("m4"),
    ).orderBy("sid")


# ---------------------------------------------------------------------------
# encrypt/decrypt family (round 5 — functions/aescrypto.py; reference
# src/Functions/FunctionsAES.h + encrypt.cpp/decrypt.cpp/tryDecrypt.cpp/
# aes_{en,de}crypt_mysql.cpp). Pinned vectors: the CBC column was
# verified byte-for-byte against the `openssl enc` CLI (the exact
# binary the reference wraps), ECB against the NIST known-answer path,
# GCM carries the RFC 5116 appended tag, and the MySQL column uses the
# >16-byte fold + truncated-IV semantics. Round-trip decrypt / wrong-AAD
# tryDecrypt land as boolean columns so the gate also proves decrypt.
# ---------------------------------------------------------------------------

_AES_KEY16 = "0123456789abcdef"
_AES_KEY32 = "0123456789abcdef0123456789ABCDEF"
_AES_IV = "fedcba9876543210"

_AES_FIXTURE = [
    (0, '', '377222e061a924c591cd9c27ea163ed4', '3c492cedd954cc383f3d3ee93e728484', '', '0c7c181ec8d5def8e6d71ce641586785', ''),
    (1, 'a', '0950013d77ed2905ce50637eca5442ee', '30aef88f86574fe3493174858fa4e2d5', 'fc', 'bc6b5a3931201a13b206be0712b2ab41d5', '90'),
    (2, 'sixteen bytes..!', '30b4e695392bc013bda789fa84f1f2a7377222e061a924c591cd9c27ea163ed4', 'b29890ed21fec81bd3c9b4a378dad2d03bef37bcb725c59f043beb77c9693ed2', 'ee7bf0f371a6d2d044e6ab95fc7ad399', 'aec64f6995c372e62afcebc02e0d34418894e4a3094d5ea9f1a6d06651a625de', '82f6f75ddfa939be8cd8524e4ae040fc'),
    (3, 'The quick brown fox jumps over the lazy dog', '08eaec72a2775e8a412e92731f4a4a2e4d8b9161a0f6411f4f7d0970100abbb0fba1ae2433a9674ca3f58a8f2efdfba9', 'edba03fe193e35946bf5215234d3f84759e7bf360a4b89e541f541c6e84fbb9c24d652004bf731d822d7530bd3844457', 'c97aeda765b6d5934dbfbd82e0239398e85bb697961cde299466fd7ed41785c242d5f21111e41ff6c4d85d', '89c7523d81d375a523a5fdd732547440f6b15b5f8868fd68e619c8c028ad65bde1ad126f1cdde76a3a6771374c21203ab2f217c9f90e2b269b8538', 'a5f7ea09cbb93efd8581445956b900fd93bc2117db503a5b972566faa29c1c63890ba18ac4fef88f2fd05e'),
]


@register(
    "func_aes_family_exact",
    oracle=(
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"(CAST({sid} AS INT), CAST('{ecb}' AS VARCHAR), "
            f"CAST('{cbc}' AS VARCHAR), CAST('{ctr}' AS VARCHAR), "
            f"CAST('{gcm}' AS VARCHAR), CAST('{my}' AS VARCHAR), "
            "CAST(TRUE AS BOOLEAN), CAST(TRUE AS BOOLEAN))"
            for sid, _s, ecb, cbc, ctr, gcm, my in _AES_FIXTURE
        )
        + ") AS t(sid, ecb, cbc, ctr, gcm, my, rt_ok, bad_aad_null)"
        " ORDER BY sid"
    ),
    tags=("functions", "aes", "encrypt"),
)
def func_aes_family_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encrypt over ECB/CBC/CTR/GCM + aes_encrypt_mysql (folded 20-byte
    key, 21-byte IV truncated) as pinned hex; decrypt round-trip and
    tryDecrypt-with-wrong-AAD→NULL as booleans."""
    base = spark.createDataFrame(
        [(sid, s) for sid, s, *_ in _AES_FIXTURE], "sid int, s string"
    )
    k16, k32, iv = F.lit(_AES_KEY16), F.lit(_AES_KEY32), F.lit(_AES_IV)
    giv = F.lit(bytes([10] * 12))
    gcm = ch("encrypt", F.lit("aes-256-gcm"), F.col("s"), k32, giv, F.lit("meta"))
    return base.select(
        "sid",
        F.lower(F.hex(ch("encrypt", F.lit("aes-128-ecb"), F.col("s"), k16))).alias("ecb"),
        F.lower(F.hex(ch("encrypt", F.lit("aes-128-cbc"), F.col("s"), k16, iv))).alias("cbc"),
        F.lower(F.hex(ch("encrypt", F.lit("aes-256-ctr"), F.col("s"), k32, iv))).alias("ctr"),
        F.lower(F.hex(gcm)).alias("gcm"),
        F.lower(F.hex(ch("aes_encrypt_mysql", F.lit("aes-128-ofb"), F.col("s"),
                         F.lit("k" * 20), F.lit(_AES_IV + "EXTRA")))).alias("my"),
        (ch("decrypt", F.lit("aes-128-cbc"),
            ch("encrypt", F.lit("aes-128-cbc"), F.col("s"), k16, iv), k16, iv)
         .cast("string") == F.col("s")).alias("rt_ok"),
        ch("tryDecrypt", F.lit("aes-256-gcm"), gcm, k32, giv, F.lit("WRONG"))
        .isNull().alias("bad_aad_null"),
    ).orderBy("sid")

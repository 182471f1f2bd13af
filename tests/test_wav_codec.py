"""RIFF/WAVE PCM codec (EXT-04 audio): pure-Python parses of hand-built
WAV byte strings — variable samples, negative amplitudes, 8-bit PCM,
stereo interleave, chunk padding, extra chunks, truncation — plus the
Spark round-trip of the closed-form fixture against its oracle algebra.
The fixture generator only emits constant-sample mono files, so these
hand builds are what proves the decoder reads arbitrary PCM."""

import struct

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.multimodal import (
    attach_wav_payload,
    decode_wav,
    parse_wav,
    pcm_stats,
)


def build_wav(samples, rate=8000, bits=16, channels=1, extra_chunks=(),
              trailing_chunks=()):
    """Hand-assemble a spec WAV: fmt chunk, optional extra chunks (id,
    body) before data, then the data chunk (padded to even length per
    RIFF), then optional trailing chunks after data."""
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    data_chunk = b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        data_chunk += b"\x00"
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for cid, cbody in extra_chunks:
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) % 2:
            body += b"\x00"
    body += data_chunk
    for cid, cbody in trailing_chunks:
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_varied_negative_samples():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    rate, arr = decode_wav(build_wav(samples, rate=44100))
    assert rate == 44100
    assert list(arr) == samples


def test_decode_8bit_recentres_to_signed():
    rate, arr = decode_wav(build_wav([0, 127, -128, 5], bits=8))
    assert list(arr) == [0, 127, -128, 5]


def test_decode_stereo_takes_first_channel():
    # interleaved L R L R ... -> first channel only
    inter = [10, -99, 20, -98, 30, -97]
    rate, arr = decode_wav(build_wav(inter, channels=2))
    assert list(arr) == [10, 20, 30]


def test_chunk_walker_skips_extra_chunks_and_pads():
    # odd-length LIST body forces a pad byte between chunks; a fixed-offset
    # parser would read garbage as the data header
    b = build_wav([7, -7], extra_chunks=[(b"LIST", b"INFOx"), (b"fact", b"\x02\x00\x00\x00")])
    rate, arr = decode_wav(b)
    assert list(arr) == [7, -7]


def test_odd_data_chunk_pad_before_trailing_chunk():
    # three 8-bit samples make an odd data body: the walker must skip the
    # pad byte to land on the trailing fact chunk (a mis-step would read
    # a garbage header and reject the file), and the pad byte must not
    # leak into the decoded samples
    b = build_wav(
        [1, 2, 3], bits=8, trailing_chunks=[(b"fact", b"\x03\x00\x00\x00")]
    )
    rate, arr = decode_wav(b)
    assert list(arr) == [1, 2, 3]


def test_truncated_and_foreign_payloads_rejected():
    good = build_wav([1, 2, 3])
    assert parse_wav(good[:-2]) is None          # truncated data body
    assert parse_wav(b"RIFFxxxxWAVE") is None    # no chunks at all
    assert parse_wav(b"\x89PNG\r\n\x1a\n") is None
    assert parse_wav(b"") is None
    assert decode_wav(build_wav([1], bits=8)[:20]) is None


def test_non_pcm_format_rejected():
    b = bytearray(build_wav([1, 2]))
    # audio format field lives right after 'fmt '+size (offset 20): set to
    # 3 = IEEE float, which the PCM decoder must refuse
    b[20:22] = struct.pack("<H", 3)
    assert parse_wav(bytes(b)) is None


def test_fixture_round_trip_matches_closed_form(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    got = pcm_stats(attach_wav_payload(docs)).collect()
    exp = docs.select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
    ).select(
        "doc_id",
        F.when(F.length("t") == 0, 0)
        .otherwise(F.ascii(F.substring("t", 1, 1)))
        .alias("first"),
        F.length(F.encode(F.col("t"), "UTF-8")).alias("nb"),
    ).collect()
    exp_by_id = {
        r["doc_id"]: (
            8000 + (r["first"] % 8) * 1000,
            40 + r["nb"] % 216,
            1 + r["first"] % 127,
        )
        for r in exp
    }
    assert len(got) == len(exp_by_id)
    for row in got:
        rate, n, v = exp_by_id[row["doc_id"]]
        assert row["sample_rate"] == rate
        assert row["n_samples"] == n
        assert row["duration_us"] == n * 1_000_000 // rate
        assert (row["amp_min"], row["amp_max"], row["amp_sum"]) == (v, v, v * n)


def test_pcm_stats_drops_undecodable_rows(spark):
    rows = [(1, build_wav([5, 5])), (2, b"not a wav"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = pcm_stats(df).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["amp_sum"] == 10


def test_wav_fuzz_roundtrip_and_garbage():
    """Property: any spec-assembled PCM WAV (random samples, rate, bit
    depth, channel count, extra/trailing chunks with odd bodies) decodes
    back to its first-channel samples; arbitrary byte garbage never
    crashes the parser (returns None or a valid parse)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(data=st.data())
    def run(data):
        bits = data.draw(st.sampled_from([8, 16]))
        channels = data.draw(st.integers(min_value=1, max_value=3))
        rate = data.draw(st.integers(min_value=1, max_value=192000))
        lo, hi = (-128, 127) if bits == 8 else (-32768, 32767)
        frames = data.draw(
            st.lists(st.integers(min_value=lo, max_value=hi),
                     min_size=0, max_size=40)
        )
        # interleave: every channel repeats the frame value except ch0
        inter = [v for v in frames for _ in range(channels)][: len(frames) * channels]
        extra = data.draw(
            st.lists(
                st.tuples(
                    st.sampled_from([b"LIST", b"fact", b"cue ", b"junk"]),
                    st.binary(min_size=0, max_size=9),
                ),
                max_size=3,
            )
        )
        trailing = data.draw(
            st.lists(
                st.tuples(st.sampled_from([b"fact", b"info"]),
                          st.binary(min_size=0, max_size=9)),
                max_size=2,
            )
        )
        b = build_wav(inter, rate=rate, bits=bits, channels=channels,
                      extra_chunks=extra, trailing_chunks=trailing)
        decoded = decode_wav(b)
        assert decoded is not None
        got_rate, arr = decoded
        assert got_rate == rate
        assert list(arr) == frames

    run()


def test_wav_parser_never_crashes_on_garbage():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=200))
    def run(junk):
        parse_wav(junk)                      # must not raise
        parse_wav(b"RIFF" + junk)
        parse_wav(b"RIFF\x10\x00\x00\x00WAVE" + junk)

    run()

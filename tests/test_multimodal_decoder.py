"""Unit pins for the real byte-level container decoder (VERDICT r10 #4;
audio upgraded to real RIFF/WAVE PCM per VERDICT r11 #4).

The oracle gate proves the decoded features match the header-declared
values end-to-end; these tests pin the parser's behavior on inputs the
synthetic corpus never produces — malformed headers, unknown magic,
truncated/inflated bodies, corrupt RIFF chunk tables — where
decode_ok=False is the contract (a parser that crashed or guessed
would poison a 100 TB ingest)."""

from __future__ import annotations

import hashlib
import struct

from gresearch_parquet_benchmarking_spark.operators.multimodal import (
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    WAV_HEADER_BYTES,
    parse_container,
)


def _img(body: bytes, w: int = 3, h: int = 2, maxval: int = 255) -> bytes:
    return f"P6\n{w} {h}\n{maxval}\n".encode() + body


def _wav(
    body: bytes,
    rate: int = 8000,
    *,
    audio_fmt: int = 1,
    channels: int = 1,
    bits: int = 8,
    declared: int | None = None,
    riff_size: int | None = None,
) -> bytes:
    """Reference PCM WAV writer, independent of the Spark builder —
    canonical 44-byte header, mono 8-bit unless overridden."""
    n = len(body) if declared is None else declared
    hdr = (
        b"RIFF"
        + struct.pack("<I", (36 + len(body)) if riff_size is None else riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16,
            audio_fmt,
            channels,
            rate,
            rate * channels * (bits // 8),
            channels * (bits // 8),
            bits,
        )
        + b"data"
        + struct.pack("<I", n)
    )
    assert declared is not None or riff_size is not None or len(hdr) == WAV_HEADER_BYTES
    return hdr + body


def test_image_roundtrip():
    out = parse_container(_img(b"hello world", w=7, h=4))
    assert out["kind"] == KIND_IMAGE
    assert (out["width"], out["height"], out["n_frames"]) == (7, 4, 1)
    assert out["body"] == b"hello world" and out["ok"]


def test_audio_riff_roundtrip_duration():
    body = b"x" * 16000
    out = parse_container(_wav(body, rate=8000))
    assert out["kind"] == KIND_AUDIO
    assert out["sample_rate"] == 8000
    assert out["duration_ms"] == 2000  # 16000 8-bit mono samples @ 8 kHz
    assert out["body"] == body and out["ok"]


def test_audio_riff_extra_chunk_is_walked():
    # a LIST chunk between fmt and data — real WAV files carry these;
    # the chunk walker must skip it (word-aligned) and still find data
    body = b"pcm-bytes!"
    base = _wav(body)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd size
    payload = (
        base[:36]  # through end of fmt chunk
        + extra
        + base[36:]  # data chunk + body
    )
    # fix the RIFF size for the inserted chunk
    payload = (
        payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    )
    out = parse_container(payload)
    assert out["kind"] == KIND_AUDIO and out["ok"]
    assert out["body"] == body


def test_video_roundtrip():
    body = b"framesbytes"
    out = parse_container(b"MVID\nframes 5\nlen 11\nsize 20 30\n" + body)
    assert out["kind"] == KIND_VIDEO
    assert (out["width"], out["height"], out["n_frames"]) == (20, 30, 5)
    assert out["body"] == body and out["ok"]


def test_declared_length_mismatch_fails_closed():
    assert not parse_container(_wav(b"short", declared=99))["ok"]
    assert not parse_container(b"MVID\nframes 2\nlen 1\nsize 4 4\nlong")["ok"]


def test_unknown_magic_and_garbage():
    for payload in (b"", b"\n", b"JPEG\njunk", b"\x00\x01\x02", b"P6"):
        out = parse_container(payload)
        assert out["kind"] == "unknown" and not out["ok"]
        assert out["body"] == b""


def test_malformed_riff_fails_closed():
    good = _wav(b"hello")
    # truncated: RIFF magic only / header cut mid-fmt
    assert not parse_container(b"RIFF")["ok"]
    assert not parse_container(good[:20])["ok"]
    # wrong form type (RIFF but not WAVE)
    assert not parse_container(good[:8] + b"AVI " + good[12:])["ok"]
    # missing data chunk
    assert not parse_container(good[:36])["ok"]
    # wrong riff size
    assert not parse_container(_wav(b"hello", riff_size=7))["ok"]
    # unsupported profile: stereo, 16-bit, non-PCM format tag
    assert not parse_container(_wav(b"hello", channels=2))["ok"]
    assert not parse_container(_wav(b"hellohello", bits=16))["ok"]
    assert not parse_container(_wav(b"hello", audio_fmt=3))["ok"]
    # all still identify the container as audio (magic matched)
    assert parse_container(good[:20])["kind"] == KIND_AUDIO


def test_malformed_headers_fail_closed():
    # non-numeric dims, missing maxval line, wrong maxval
    assert not parse_container(b"P6\nx y\n255\nbody")["ok"]
    assert not parse_container(b"P6\n3 2")["ok"]
    assert not parse_container(_img(b"body", maxval=15))["ok"]


def test_empty_body_not_ok():
    assert not parse_container(_img(b""))["ok"]
    assert not parse_container(_wav(b""))["ok"]


def test_parse_container_total_on_arbitrary_bytes():
    """The 100 TB ingest contract: the decoder NEVER raises — any byte
    string yields a typed feature dict with ok=False at worst.
    Property-based over arbitrary bytes plus adversarial mutations of
    valid containers (truncations, bit flips in the header region)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def check(payload: bytes) -> None:
        out = parse_container(payload)
        assert isinstance(out["ok"], bool)
        assert out["kind"] in ("unknown", KIND_IMAGE, KIND_AUDIO, KIND_VIDEO)
        assert isinstance(out["body"], bytes)
        for f in ("width", "height", "n_frames", "sample_rate", "duration_ms"):
            assert isinstance(out[f], int)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=256))
    def fuzz_raw(payload):
        check(payload)

    seeds = [
        _img(b"pixels", w=9, h=9),
        _wav(b"x" * 100, rate=11000),
        b"MVID\nframes 3\nlen 5\nsize 8 6\nhello",
    ]

    @settings(max_examples=300, deadline=None)
    @given(
        st.sampled_from(seeds),
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=64),
    )
    def fuzz_mutated(seed, pos, byte, trunc):
        mutated = seed[:pos] + bytes([byte]) + seed[pos + 1 :]
        check(mutated)
        check(mutated[: len(mutated) - trunc])

    fuzz_raw()
    fuzz_mutated()


def test_body_md5_matches_oracle_convention():
    # engine emits int(md5(body)[:8], 16); DuckDB twin is
    # ('0x' || substr(md5(text), 1, 8))::BIGINT over the source text
    body = "café bytes".encode()
    out = parse_container(_img(body))
    assert out["body"] == body
    assert int(hashlib.md5(body).hexdigest()[:8], 16) < 2**32

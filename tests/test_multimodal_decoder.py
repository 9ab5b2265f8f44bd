"""Unit pins for the real byte-level container decoder (VERDICT r10 #4).

The oracle gate proves the decoded features match the header-declared
values end-to-end; these tests pin the parser's behavior on inputs the
synthetic corpus never produces — malformed headers, unknown magic,
truncated/inflated bodies — where decode_ok=False is the contract (a
parser that crashed or guessed would poison a 100 TB ingest)."""

from __future__ import annotations

import hashlib

from gresearch_parquet_benchmarking_spark.operators.multimodal import (
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    parse_container,
)


def _img(body: bytes, w: int = 3, h: int = 2, maxval: int = 255) -> bytes:
    return f"P6\n{w} {h}\n{maxval}\n".encode() + body


def test_image_roundtrip():
    out = parse_container(_img(b"hello world", w=7, h=4))
    assert out["kind"] == KIND_IMAGE
    assert (out["width"], out["height"], out["n_frames"]) == (7, 4, 1)
    assert out["body"] == b"hello world" and out["ok"]


def test_audio_roundtrip_duration():
    body = b"x" * 16000
    out = parse_container(b"WAVT\nrate 8000\nlen 16000\n" + body)
    assert out["kind"] == KIND_AUDIO
    assert out["sample_rate"] == 8000
    assert out["duration_ms"] == 2000  # 16000 8-bit mono samples @ 8 kHz
    assert out["body"] == body and out["ok"]


def test_video_roundtrip():
    body = b"framesbytes"
    out = parse_container(b"MVID\nframes 5\nlen 11\nsize 20 30\n" + body)
    assert out["kind"] == KIND_VIDEO
    assert (out["width"], out["height"], out["n_frames"]) == (20, 30, 5)
    assert out["body"] == body and out["ok"]


def test_declared_length_mismatch_fails_closed():
    assert not parse_container(b"WAVT\nrate 8000\nlen 99\nshort")["ok"]
    assert not parse_container(b"MVID\nframes 2\nlen 1\nsize 4 4\nlong")["ok"]


def test_unknown_magic_and_garbage():
    for payload in (b"", b"\n", b"JPEG\njunk", b"\x00\x01\x02", b"P6"):
        out = parse_container(payload)
        assert out["kind"] == "unknown" and not out["ok"]
        assert out["body"] == b""


def test_malformed_headers_fail_closed():
    # non-numeric dims, missing maxval line, wrong field name
    assert not parse_container(b"P6\nx y\n255\nbody")["ok"]
    assert not parse_container(b"P6\n3 2")["ok"]
    assert not parse_container(b"WAVT\nrate 8000\nsize 5\nhello")["ok"]
    # wrong maxval is parsed but rejected
    assert not parse_container(_img(b"body", maxval=15))["ok"]


def test_empty_body_not_ok():
    assert not parse_container(_img(b""))["ok"]
    assert not parse_container(b"WAVT\nrate 8000\nlen 0\n")["ok"]


def test_body_md5_matches_oracle_convention():
    # engine emits int(md5(body)[:8], 16); DuckDB twin is
    # ('0x' || substr(md5(text), 1, 8))::BIGINT over the source text
    body = "café bytes".encode()
    out = parse_container(_img(body))
    assert out["body"] == body
    assert int(hashlib.md5(body).hexdigest()[:8], 16) < 2**32

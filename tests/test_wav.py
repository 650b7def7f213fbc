"""RIFF/PCM16 codec differential parity with the stdlib wave module, both
directions, plus chunk-walking and feature-exactness edge cases."""

import io
import struct
import wave

import numpy as np
import pyarrow as pa

from goose_parser_ray.functions.wav import decode_wav_pcm16, encode_wav_pcm16


def test_roundtrip_and_stdlib_reads_our_bytes():
    rng = np.random.RandomState(7)
    x = rng.randint(-32768, 32768, size=1234, dtype=np.int16)
    payload = encode_wav_pcm16(x, sample_rate=22_050)

    # our decoder round-trips exactly
    y, rate, ch = decode_wav_pcm16(payload)
    assert rate == 22_050 and ch == 1
    assert np.array_equal(x, y)

    # stdlib wave agrees on every header field and every sample
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 22_050
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(x, frames)


def test_we_read_stdlib_bytes():
    rng = np.random.RandomState(11)
    x = rng.randint(-32768, 32768, size=999, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.tobytes())
    y, rate, ch = decode_wav_pcm16(buf.getvalue())
    assert rate == 8000 and ch == 1
    assert np.array_equal(x, y)


def test_decoder_walks_extra_chunks():
    x = np.array([5, -5, 5, -5, 0], dtype=np.int16)
    payload = encode_wav_pcm16(x, sample_rate=16_000)
    # splice a LIST chunk (odd size → word-aligned padding) between fmt and
    # data, the layout real encoders produce
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    y, rate, _ = decode_wav_pcm16(spliced)
    assert rate == 16_000
    assert np.array_equal(x, y)


def test_rejects_non_pcm():
    x = np.zeros(4, dtype=np.int16)
    payload = bytearray(encode_wav_pcm16(x))
    payload[20] = 3  # IEEE float tag
    try:
        decode_wav_pcm16(bytes(payload))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_feature_actor_exact_integers(ray_session):
    from goose_parser_ray.functions.multimodal import WavFeatureActor

    # square wave: +A for 3 samples, -A for 3, ... over 10 samples
    amp, half, n = 100, 3, 10
    idx = np.arange(n)
    x = np.where((idx // half) % 2 == 0, amp, -amp).astype(np.int16)
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_wav_pcm16(x)], pa.binary()),
        }
    )
    out = WavFeatureActor()(t)
    assert out["n_samples"][0].as_py() == n
    assert out["energy"][0].as_py() == n * amp * amp
    assert out["peak"][0].as_py() == amp
    assert out["zero_crossings"][0].as_py() == (n - 1) // half


def test_codec_fuzz_roundtrip_vs_stdlib():
    """Seeded fuzz: random lengths (incl. 0), rates, and channel counts
    round-trip exactly and agree with the stdlib wave reader."""
    rng = np.random.RandomState(42)
    for _ in range(25):
        n = int(rng.randint(0, 5000))
        rate = int(rng.choice([8000, 16000, 22050, 44100]))
        ch = int(rng.choice([1, 2]))
        x = rng.randint(-32768, 32768, size=n * ch).astype(np.int16)
        payload = encode_wav_pcm16(x, sample_rate=rate, channels=ch)
        y, r, c = decode_wav_pcm16(payload)
        assert (r, c) == (rate, ch)
        assert np.array_equal(x, y)
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getframerate() == rate
            assert w.getnchannels() == ch
            frames = np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2"
            )
        assert np.array_equal(x, frames)


def test_mutation_fuzz_never_crashes_uncontrolled():
    """Single-byte mutations and truncations of a valid RIFF/PCM payload
    either decode to SOME well-formed (samples, rate, channels) triple
    (RIFF has no checksum, so silent value changes are allowed) or raise
    ValueError — never another exception type, never a hang. The same
    contract every other in-repo codec fuzz locks in."""
    import numpy as np

    from goose_parser_ray.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(21)
    x = (rng.integers(-3000, 3000, 400)).astype(np.int16)
    good = bytearray(encode_wav_pcm16(x, sample_rate=8000, channels=2))
    for trial in range(400):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            s, rate, ch = decode_wav_pcm16(bytes(b))
            assert s.dtype == np.int16
            assert rate >= 0 and ch >= 0
        except ValueError:
            pass
    for cut in range(0, len(good), 9):
        try:
            decode_wav_pcm16(bytes(good[:cut]))
        except ValueError:
            pass

"""Bit-exactness pins for the r14 audio-chain vectorization.

The per-consumer monitor breakdown (MONITORS.md, r13 VERDICT ask #1)
named audio_dup the longest chain at every saturated trigger size, so
r14 vectorized the two Python hot spots: ``audio_fp_frames`` (batched
rfft + per-band column sums instead of a per-frame loop) and
``synth_wav_from_text`` (memoized tile-word tones). BOTH must be
BIT-IDENTICAL to the original formulas — the fingerprints feed exact
xxhash64 digests (audio_fpk) and the k106/k107/k108 oracles — so this
module keeps the ORIGINAL loop implementations as spec twins and
asserts equality over varied clips.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from cdc_publisher_spark.operators.multimodal import (
    AUDIO_FP_BANDS,
    AUDIO_FP_FRAMES,
    audio_fp_frames,
    synth_wav_from_text,
    wav_samples,
)


def _fp_frames_loop_twin(
    payload: bytes,
    n_frames: int = AUDIO_FP_FRAMES,
    n_bands: int = AUDIO_FP_BANDS,
) -> list[int]:
    """VERBATIM pre-r14 audio_fp_frames — the per-frame loop."""
    samples, rate, channels = wav_samples(payload)
    mono = (
        samples.reshape(-1, channels).mean(axis=1) if channels > 1 else samples
    )
    if len(mono) < n_frames:
        mono = np.pad(mono, (0, n_frames - len(mono)))
    L = len(mono) // n_frames
    prev = np.zeros(n_bands - 1)
    out: list[int] = []
    for i in range(n_frames):
        spec = np.abs(np.fft.rfft(mono[i * L : (i + 1) * L])) ** 2
        edges = np.geomspace(1, max(len(spec), 2), n_bands + 1).astype(int)
        e = np.array(
            [spec[a:b].sum() for a, b in zip(edges[:-1], edges[1:])]
        )
        d = e[:-1] - e[1:]
        bits = (d - prev) > 0
        prev = d
        word = 0
        for j, b in enumerate(bits[:32]):
            if b:
                word |= 1 << j
        out.append(word)
    return out


def _synth_loop_twin(
    text: str,
    rate: int = 4000,
    samples_per_word: int = 64,
    min_samples: int = 2048,
    max_words: int = 256,
) -> bytes:
    """VERBATIM pre-r14 synth_wav_from_text — no tone memo."""
    toks = (text.split(" ") or [""])[:max_words]
    n_tones = max(len(toks), -(-min_samples // samples_per_word))
    tones = []
    t = np.arange(samples_per_word, dtype=np.float64)
    for j in range(n_tones):
        w, tile = toks[j % len(toks)], j // len(toks)
        d = hashlib.md5(f"{tile}#{w}".encode("utf-8")).digest()
        freq = 200.0 + (int.from_bytes(d[:4], "big") % 1600)
        amp = 0.3 + 0.7 * (d[4] / 255.0)
        tones.append(amp * np.sin(2.0 * np.pi * freq * t / rate))
    sig = np.concatenate(tones)[: max(min_samples, len(toks) * samples_per_word)]
    pcm = (np.clip(sig, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


TEXTS = [
    "x",                                       # one word, tiles cycle
    "alpha beta gamma",                        # short, cycles
    "the quick brown fox jumps over the lazy dog " * 3,
    " ".join(f"w{i % 97}" for i in range(40)),  # zipf-ish repeats
    " ".join(f"tok{i}" for i in range(256)),    # max_words exactly
    " ".join(f"tok{i}" for i in range(400)),    # past the cap
    "",                                         # empty text
    "double  space",                            # empty token kept
]


@pytest.mark.parametrize("idx", range(len(TEXTS)))
def test_synth_matches_uncached_twin(idx):
    text = TEXTS[idx]
    assert synth_wav_from_text(text) == _synth_loop_twin(text)
    # memo warm on the second call — still identical
    assert synth_wav_from_text(text) == _synth_loop_twin(text)


@pytest.mark.parametrize("idx", range(len(TEXTS)))
def test_fp_frames_match_loop_twin(idx):
    payload = synth_wav_from_text(TEXTS[idx])
    got = audio_fp_frames(payload)
    want = _fp_frames_loop_twin(payload)
    assert got == want
    assert len(got) == AUDIO_FP_FRAMES
    assert all(0 <= w < 2**32 for w in got)


def test_fp_frames_match_on_stereo_and_tiny_clips():
    """Exercise the channels>1 mean and the pad path the synth never
    produces: hand-built 2-channel and 4-sample PCM payloads."""
    def wav(pcm_i16: np.ndarray, channels: int, rate: int = 4000) -> bytes:
        pcm = pcm_i16.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng = np.random.default_rng(14)
    stereo = wav((rng.standard_normal(2048 * 2) * 8000).astype(np.int16), 2)
    tiny = wav((rng.standard_normal(4) * 8000).astype(np.int16), 1)
    for payload in (stereo, tiny):
        assert audio_fp_frames(payload) == _fp_frames_loop_twin(payload)

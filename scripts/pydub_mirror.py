#!/usr/bin/env python3
"""Pydub-parity golden generator (round-5 verdict item 4).

pydub is not installable in this offline container, so this script is an
INDEPENDENT re-implementation of the two pydub algorithms the reference
pipeline leans on (pa.py:87, 104-106), written from pydub's published
silence.py / effects.py semantics — integer audioop arithmetic and all:

  - detect_nonsilent(seg, min_silence_len=300, silence_thresh=-35,
    seek_step=1): slide a 300 ms window 1 ms at a time; window silent iff
    audioop.rms(slice) <= db_to_float(-35) * max_possible_amplitude, where
    audioop.rms truncates sqrt(sum(s^2)/n) to int and
    max_possible_amplitude = 32768 for 16-bit; consecutive silent starts
    merge to [start, last_start + window]; non-silent = complement.
  - effects.normalize(seg, headroom=0.1): linear gain =
    max_possible_amplitude * db_to_float(-headroom) / max(|sample|).

It runs them over the deterministic AudioSynth fixture corpus and emits
src/test/resources/pydub_golden.json; DspSpec/SegmentationSpec assert the
Scala kernels (float-PCM formulations) reproduce these goldens exactly.

Usage: pydub_mirror.py <wavDir> <outJson>
"""
import json
import math
import struct
import sys
import wave


def read_wav(path):
    w = wave.open(path, "rb")
    assert w.getsampwidth() == 2, path
    n = w.getnframes()
    raw = w.readframes(n)
    samples = struct.unpack(f"<{n * w.getnchannels()}h", raw)
    return w.getframerate(), w.getnchannels(), list(samples)


def audioop_rms(samples):
    if not samples:
        return 0
    return int(math.sqrt(sum(s * s for s in samples) / len(samples)))


def db_to_float(db):
    return 10.0 ** (db / 20.0)


def detect_nonsilent(samples, rate, min_silence_len=300, silence_thresh=-35.0):
    """pydub.silence.detect_nonsilent for 16-bit mono, seek_step=1."""
    spms = rate // 1000
    seg_len = len(samples) // spms  # pydub len() = ms
    if seg_len < min_silence_len:
        return [[0, seg_len]] if seg_len > 0 else []
    thresh = db_to_float(silence_thresh) * 32768.0
    silence_starts = []
    for i in range(0, seg_len - min_silence_len + 1):
        a = i * spms
        b = min((i + min_silence_len) * spms, len(samples))
        if audioop_rms(samples[a:b]) <= thresh:
            silence_starts.append(i)
    # merge consecutive starts into silent ranges
    silent = []
    for s in silence_starts:
        if silent and s == silent[-1][1] + 1:
            silent[-1][1] = s
        else:
            silent.append([s, s])
    silent = [[f, l + min_silence_len] for f, l in silent]
    # complement
    out = []
    cursor = 0
    for f, l in silent:
        if f > cursor:
            out.append([cursor, f])
        cursor = l
    if cursor < seg_len:
        out.append([cursor, seg_len])
    return out


def normalize_gain(samples, headroom=0.1):
    """pydub.effects.normalize linear gain factor (0.0 for silent input)."""
    peak = max(abs(s) for s in samples) if samples else 0
    if peak == 0:
        return 0.0
    return 32768.0 * db_to_float(-headroom) / peak


def main(wav_dir, out_json):
    import os
    golden = {}
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav") or name == "not_a_wav.wav":
            continue
        try:
            rate, channels, samples = read_wav(os.path.join(wav_dir, name))
        except Exception:
            continue
        entry = {"rate": rate, "channels": channels,
                 "peak": max(abs(s) for s in samples) if samples else 0,
                 "gain": normalize_gain(samples)}
        if channels == 1 and rate % 1000 == 0:
            entry["nonsilent"] = detect_nonsilent(samples, rate)
        golden[name] = entry
    with open(out_json, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}: {list(golden)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

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
import hashlib
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


def ratecv(samples, in_rate, out_rate):
    """CPython audioop.ratecv mirror (Modules/audioop.c): 16-bit mono,
    weightA=1 weightB=0 (identity filter), state=None — exactly what
    pydub.AudioSegment.set_frame_rate runs. Samples are int16-scale ints;
    GETSAMPLE32 scales <<16, the interpolation
    (prev*d + cur*(outrate-d))/outrate runs in C doubles (exact here:
    products < 2^53) and truncates toward zero, SETSAMPLE32 emits >>16."""
    g = math.gcd(in_rate, out_rate)
    inrate, outrate = in_rate // g, out_rate // g
    d = -outrate
    prev_i = cur_i = 0
    out = []
    for s in samples:
        prev_i, cur_i = cur_i, s << 16
        d += outrate
        while d >= 0:
            cur_o = int((prev_i * d + cur_i * (outrate - d)) / outrate)
            out.append(cur_o >> 16)
            d -= inrate
    return out


def tomono(interleaved):
    """CPython audioop.tomono mirror with fac1=fac2=0.5 (pydub
    set_channels(1)): per frame floor-bound(l*0.5 + r*0.5) — note fbound
    rounds toward -inf, clips at [minval+1 -> minval, maxval]."""
    out = []
    for i in range(0, len(interleaved) - 1, 2):
        f = interleaved[i] * 0.5 + interleaved[i + 1] * 0.5
        if f > 32767.0:
            f = 32767.0
        elif f < -32767.0:  # minval + 1.0
            f = -32768.0
        out.append(int(math.floor(f)))
    return out


def int16_md5(vals):
    return hashlib.md5(struct.pack(f"<{len(vals)}h", *vals)).hexdigest()


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
        # set_frame_rate goldens (pa.py:89; round-6 verdict item 4): ratecv
        # each fixture to a down- and an up-rate; the stereo fixture first
        # rides tomono (pydub's set_channels(1) precedes set_frame_rate in
        # pa.py:88-89), covering the int downmix semantics too
        mono = samples
        if channels == 2:
            mono = tomono(samples)
            entry["tomono_md5"] = int16_md5(mono)
            entry["tomono_n"] = len(mono)
        targets = [8000, 22050] if rate == 16000 else [16000]
        entry["resample"] = [
            {"to": t, "n": len(rs), "md5": int16_md5(rs), "head": rs[:12]}
            for t in targets
            for rs in [ratecv(mono, rate, t)]]
        golden[name] = entry
    with open(out_json, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}: {list(golden)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Trivial ASR worker for ProcessTranscriberSpec (stdlib only).

Speaks graft.ops.ProcessTranscriber's wire protocol: reads int32-BE
length-prefixed WAV frames on stdin, replies with int32-BE length-prefixed
UTF-8 "transcripts" on stdout. The transcript is deterministic per frame —
"<index>:<md5-prefix>:<byte-length>" — so the spec can verify both ORDER
(index) and PAYLOAD INTEGRITY (md5 of exactly the bytes the driver sent).

Modes (argv[1]):
  echo         (default) reply to every frame until EOF
  fat          like echo but the reply is padded to the INPUT frame's byte
               length — accumulated replies far exceed the OS pipe buffer,
               so a write-all-then-read-all driver deadlocks here while the
               concurrent-drain driver completes (the round-6 advice path)
  die-after-1  reply to the first frame, then exit(3) — worker-death path
  absurd       reply with a 512 MiB length prefix and no payload — the
               driver's absurd-frame guard must trip
  slow         like echo but sleeps 1 s before each reply — lets the pool
               spec prove >1 batch genuinely in flight (4 one-frame batches
               on a 4-worker pool must finish far under the 4 s serial time)
  dsp          decode the frame as a WAV with the STANDARD-LIBRARY `wave`
               decoder and reply content-derived integer features —
               "sr=<rate> n=<frames> rms=<r> zc=<z> peak=<p>" — proving the
               driver's framing carries a WAV any third-party decoder
               accepts (what a real HF/whisper wrapper does first), not
               just opaque bytes
"""
import hashlib
import io
import math
import struct
import sys
import time
import wave

mode = sys.argv[1] if len(sys.argv) > 1 else "echo"
inp = sys.stdin.buffer
out = sys.stdout.buffer

i = 0
while True:
    hdr = inp.read(4)
    if len(hdr) < 4:
        break  # EOF: driver closed stdin
    (n,) = struct.unpack(">i", hdr)
    payload = inp.read(n)
    if len(payload) < n:
        sys.exit(2)  # truncated frame from the driver
    if mode == "absurd":
        out.write(struct.pack(">i", 512 << 20))
        out.flush()
        sys.exit(0)
    if mode == "slow":
        time.sleep(1.0)
    if mode == "dsp":
        w = wave.open(io.BytesIO(payload))
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            sys.exit(4)  # driver contract: mono 16-bit PCM
        sr = w.getframerate()
        nf = w.getnframes()
        xs = struct.unpack("<%dh" % nf, w.readframes(nf))
        sq = sum(x * x for x in xs)
        rms = math.isqrt(sq // nf) if nf else 0
        zc = sum(1 for a, b in zip(xs, xs[1:]) if (a < 0) != (b < 0))
        peak = max((abs(x) for x in xs), default=0)
        reply = f"sr={sr} n={nf} rms={rms} zc={zc} peak={peak}".encode()
        out.write(struct.pack(">i", len(reply)))
        out.write(reply)
        out.flush()
        i += 1
        continue
    reply = f"{i}:{hashlib.md5(payload).hexdigest()[:8]}:{n}".encode()
    if mode == "fat":
        reply = reply + b"x" * max(0, n - len(reply))
    out.write(struct.pack(">i", len(reply)))
    out.write(reply)
    out.flush()
    if mode == "die-after-1":
        sys.exit(3)
    i += 1

#!/usr/bin/env python3
"""Bit-compare PowCR (stdin triples of IEEE-754 bits: x y pow) against the
platform's correctly-rounded glibc pow — the same libm node/V8 delegates
to, i.e. the byte-parity target for the conic .prj path.

Usage: sbt -batch "runMain graft.tools.PowCheck 200000" | grep -E '^-?[0-9]+ ' \
         | python3 scripts/powcr_check.py
"""
import sys, struct, ctypes

libm = ctypes.CDLL("libm.so.6")
libm.pow.restype = ctypes.c_double
libm.pow.argtypes = [ctypes.c_double, ctypes.c_double]

def bits_to_double(b):
    return struct.unpack("<d", struct.pack("<q", int(b)))[0]

n = bad = 0
for line in sys.stdin:
    parts = line.split()
    if len(parts) != 3:
        continue
    try:
        xb, yb, rb = (int(p) for p in parts)
    except ValueError:
        continue
    x, y = bits_to_double(xb), bits_to_double(yb)
    want = libm.pow(x, y)
    wantb = struct.unpack("<q", struct.pack("<d", want))[0]
    n += 1
    if wantb != rb:
        bad += 1
        if bad <= 5:
            print(f"MISMATCH x={x!r} y={y!r} ours={bits_to_double(rb)!r} glibc={want!r}")
print(f"{'PASS' if bad == 0 else 'FAIL'}: {n - bad}/{n} bit-identical to glibc pow")
sys.exit(1 if bad else 0)

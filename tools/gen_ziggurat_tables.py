"""Regenerate sisr_tpu/data/_native/zig_tables.h from the installed numpy.

The native loader (sisr_tpu/data/_native/loader.cpp) needs numpy's exact
ziggurat_nor tables to reproduce Generator.standard_normal bit-for-bit.
numpy does not expose them, so this script *measures* them through the
public API with PCG64 state injection:

  * wi[idx]: craft the next raw uint64 so standard_normal() takes the
    accept path with rabs = 2^12 (a power of two, so x = rabs * wi is an
    exact float op) -> wi = x / 2^12 recovers the stored double exactly.
  * ki[idx]: the accept/reject boundary (rabs < ki) is a pure integer
    compare; binary-search rabs, detecting rejection by how many uint64s
    the bit-generator state advanced (accept consumes exactly one).
  * fi[idx]: not extracted -- it equals exp(-x_i^2/2) with x_i = wi*2^52
    (an exact reconstruction), except fi[0] = 1.0. Verified by the bulk
    bitwise test at the end (millions of draws, zero stream desyncs).

Crafting a raw output: PCG64 XSL-RR steps state S -> N = S*M + inc and
emits rotr64(hi(N)^lo(N), N>>122). Pick N with rot bits zero and
lo = hi ^ r_target, then S = (N - inc) * M^-1 mod 2^128 -- M is odd so
invertible. numpy lets us set {state, inc, has_uint32} directly.

Usage: python tools/gen_ziggurat_tables.py [--check-only]
"""
import argparse
import math
import os
import sys

import numpy as np

M64 = (1 << 64) - 1
M128 = (1 << 128) - 1
PCG_MULT = (2549297995355413924 << 64) | 4865540595714422341
MINV = pow(PCG_MULT, -1, 1 << 128)
HEADER = os.path.join(os.path.dirname(__file__), "..", "sisr_tpu", "data",
                      "_native", "zig_tables.h")


class Crafter:
    def __init__(self):
        self.g = np.random.default_rng(0)
        self.bg = self.g.bit_generator
        self.inc = self.bg.state["state"]["inc"]

    def set_first_output(self, r1):
        hi = 0  # rot bits zero
        N = (hi << 64) | (hi ^ (r1 & M64))
        st = self.bg.state
        st["state"]["state"] = ((N - self.inc) * MINV) & M128
        st["has_uint32"] = 0
        st["uinteger"] = 0
        self.bg.state = st
        self.N = N

    def draws_consumed_past_first(self):
        st = self.bg.state["state"]["state"]
        s = self.N
        for k in range(50):
            if s == st:
                return k
            s = (s * PCG_MULT + self.inc) & M128
        raise RuntimeError("state not reached")


def make_r(idx, sign, rabs):
    return idx | (sign << 8) | (rabs << 9)


def extract():
    cr = Crafter()
    wi = [0.0] * 256
    for idx in range(256):
        cr.set_first_output(make_r(idx, 0, 1 << 12))
        # accept OR wedge-accept both return rabs*wi[idx]
        wi[idx] = float(cr.g.standard_normal()) / (1 << 12)

    def consumed(idx, rabs):
        cr.set_first_output(make_r(idx, 0, rabs))
        float(cr.g.standard_normal())
        return cr.draws_consumed_past_first()

    ki = [0] * 256
    for idx in range(256):
        if consumed(idx, 0) != 0:
            ki[idx] = 0
            continue
        if consumed(idx, (1 << 52) - 1) == 0:
            ki[idx] = 1 << 52
            continue
        lo, hi = 0, (1 << 52) - 1
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if consumed(idx, mid) == 0:
                lo = mid
            else:
                hi = mid
        ki[idx] = hi
    return wi, ki


NOR_R = 3.6541528853610088
NOR_INV_R = 0.27366123732975828


def bulk_verify(wi, ki, n_seeds=20, n=20000):
    fi = [math.exp(-0.5 * (w * float(1 << 52)) ** 2) for w in wi]
    fi[0] = 1.0

    class P:  # minimal exact PCG64 mirror (validated in tests vs random_raw)
        def __init__(self, seed):
            ss = np.random.SeedSequence(seed).generate_state(4, np.uint64)
            initstate = (int(ss[0]) << 64) | int(ss[1])
            initseq = (int(ss[2]) << 64) | int(ss[3])
            self.inc = ((initseq << 1) | 1) & M128
            self.state = 0
            self.step()
            self.state = (self.state + initstate) & M128
            self.step()

        def step(self):
            self.state = (self.state * PCG_MULT + self.inc) & M128

        def next64(self):
            self.step()
            hi, lo, rot = self.state >> 64, self.state & M64, self.state >> 122
            x = (hi ^ lo) & M64
            return ((x >> rot) | (x << (64 - rot))) & M64 if rot else x

        def next_double(self):
            return (self.next64() >> 11) * (1.0 / 9007199254740992.0)

    def std_normal(g):
        while True:
            r = g.next64()
            idx = r & 0xff
            r >>= 8
            sign = r & 1
            rabs = (r >> 1) & 0x000fffffffffffff
            x = rabs * wi[idx]
            if sign:
                x = -x
            if rabs < ki[idx]:
                return x
            if idx == 0:
                while True:
                    xx = -NOR_INV_R * math.log1p(-g.next_double())
                    yy = -math.log1p(-g.next_double())
                    if yy + yy > xx * xx:
                        return -(NOR_R + xx) if ((rabs >> 8) & 1) else NOR_R + xx
            elif (fi[idx - 1] - fi[idx]) * g.next_double() + fi[idx] < \
                    math.exp(-0.5 * x * x):
                return x

    total = exact = desync = 0
    for seed in range(n_seeds):
        gref = np.random.default_rng(seed)
        ref = gref.standard_normal(n)
        g = P(seed)
        mine = np.array([std_normal(g) for _ in range(n)])
        total += n
        exact += int((ref == mine).sum())
        desync += int(gref.bit_generator.state["state"]["state"] != g.state)
    return total, exact, desync


def write_header(wi, ki):
    lines = [
        "// ziggurat_nor tables, extracted bit-for-bit from the installed",
        "// numpy (%s) by tools/gen_ziggurat_tables.py (state-injection"
        % np.__version__,
        "// probing of Generator.standard_normal; regenerate + verify with",
        "// that script). wi multiplies the 52-bit rabs; ki is the accept",
        "// threshold. fi is recomputed at init (exp of the exact x_i).",
        "static const double ZIG_WI[256] = {",
    ]
    row = []
    for v in wi:
        row.append(float(v).hex())
        if len(row) == 3:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
        row = []
    lines.append("};")
    lines.append("static const uint64_t ZIG_KI[256] = {")
    for v in ki:
        row.append(f"0x{int(v):013x}ull")
        if len(row) == 3:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
    lines.append("};")
    with open(HEADER, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true",
                    help="verify tables reproduce numpy; don't write")
    args = ap.parse_args()
    print("extracting wi/ki via state injection ...")
    wi, ki = extract()
    print("bulk bitwise verification ...")
    total, exact, desync = bulk_verify(wi, ki)
    print(f"standard_normal: {exact}/{total} bitwise, {desync} stream desyncs")
    if exact != total or desync:
        print("FAIL: extracted tables do not reproduce numpy", file=sys.stderr)
        return 1
    if not args.check_only:
        write_header(wi, ki)
        print("wrote", os.path.normpath(HEADER))
    return 0


if __name__ == "__main__":
    sys.exit(main())

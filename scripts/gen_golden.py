#!/usr/bin/env python3
"""Generate golden vectors from the reference (ampribe/abloom) for
bit-compatibility tests. Requires the reference C extension built in
/tmp/refbuild (copy of /root/reference + `python3 setup.py build_ext
--inplace`). Outputs to src/test/resources/golden/.

Run from repo root:  python3 scripts/gen_golden.py
"""
import sys, struct

sys.path.insert(0, "/tmp/refbuild")
from abloom import BloomFilter  # noqa: E402

OUT = "src/test/resources/golden"


def gen_pyhash():
    ints = [0, 1, -1, 2, -2, 42, -42, 1000, -1000,
            (1 << 61) - 2, (1 << 61) - 1, 1 << 61, (1 << 61) + 1,
            (1 << 62), (1 << 63) - 1, -(1 << 63), -(1 << 62),
            -((1 << 61) - 1), -(1 << 61), 123456789012345678,
            -987654321098765432]
    floats = [0.0, -0.0, 1.0, -1.0, 42.0, 3.14159, -2.71828,
              1.5, -1.5, 0.5, 2.5e-10, 1e100, 1e-100, 1.7976931348623157e308,
              2.2250738585072014e-308, 5e-324, 2.220446049250313e-16,
              -1.7976931348623157e308, 6.02214076e23,
              float("inf"), float("-inf")]
    with open(f"{OUT}/pyhash_kat.txt", "w") as f:
        f.write("# CPython hash() of numerics (deterministic, no seed)\n")
        for n in ints:
            f.write(f"int\t{n}\t{hash(n)}\n")
        for v in floats:
            bits = struct.unpack("<q", struct.pack("<d", v))[0]
            f.write(f"float\t{bits}\t{hash(v)}\n")


def gen_sizing():
    caps = [1, 2, 10, 100, 1000, 12345, 100_000, 1_000_000, 10_000_000,
            123_456_789, 10**10]
    fps = [0.0001, 0.001, 0.01, 0.1, 0.5, 0.99, 0.025, 1e-6]
    with open(f"{OUT}/sizing_kat.txt", "w") as f:
        f.write("# capacity\tfp_rate_bits(LE int64 of double)\tblock_count\n")
        for c in caps:
            for p in fps:
                bf = BloomFilter(c, p, serializable=True)
                pb = struct.unpack("<q", struct.pack("<d", p))[0]
                f.write(f"{c}\t{pb}\t{bf.byte_count // 64}\n")


def gen_filters():
    cases = [
        ("bytes_small", 100, 0.01,
         [b"hello", b"world", b"", b"\x00\x01\x02", b"a" * 100]),
        ("strings", 1000, 0.01,
         [f"key{i}" for i in range(500)]),
        ("unicode", 100, 0.05,
         ["héllo wörld", "日本語テキスト", "emoji \U0001f600", "", "\x00nul"]),
        ("ints", 1000, 0.001,
         list(range(-250, 250)) + [2**63 - 1, -(2**63), 2**61 - 2, -1]),
        ("floats", 500, 0.01,
         [0.0, -0.0, 42.0, 3.14159, -2.71828, 1e100, 1e-100,
          float("inf"), float("-inf"), 5e-324, 0.1, 0.2, 0.3]),
        ("mixed", 200, 0.02,
         [b"bin", "str", 7, -7, 7.5, 42, 42.0, "sha-like-" + "ab" * 20]),
        ("single", 1, 0.01, ["only"]),
        ("repo_paths", 10000, 0.005,
         [f"org{i % 7}/repo{i % 13}" for i in range(300)]
         + [f"src/pkg{i % 5}/File{i}.scala" for i in range(300)]),
    ]
    with open(f"{OUT}/filter_kat.txt", "w") as f:
        f.write("# name\tcapacity\tfp_rate\tto_bytes hex (keys in gen_golden.py)\n")
        for name, cap, fp, keys in cases:
            bf = BloomFilter(cap, fp, serializable=True)
            bf.update(keys)
            f.write(f"{name}\t{cap}\t{fp!r}\t{bf.to_bytes().hex()}\n")


def gen_union():
    a = BloomFilter(500, 0.01, serializable=True)
    b = BloomFilter(500, 0.01, serializable=True)
    a.update([f"left{i}" for i in range(200)])
    b.update([f"right{i}" for i in range(200)])
    u = a | b
    with open(f"{OUT}/union_kat.txt", "w") as f:
        f.write(f"a\t{a.to_bytes().hex()}\n")
        f.write(f"b\t{b.to_bytes().hex()}\n")
        f.write(f"a_or_b\t{u.to_bytes().hex()}\n")


if __name__ == "__main__":
    gen_pyhash()
    gen_sizing()
    gen_filters()
    gen_union()
    print("golden vectors written to", OUT)

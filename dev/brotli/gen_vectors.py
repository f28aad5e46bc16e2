#!/usr/bin/env python3
"""Generate Brotli decode test vectors using a local libbrotli encoder
(via the brotlicffi binding shipped in the local conda pkgs).

The vectors pin graft.functions.BrotliKernel (the pure-Scala RFC 7932
decoder) against an independent, widely-deployed implementation across
the encoder's whole operating range: qualities 0..11 (each quality family
exercises different stream features — q0/q1 emit fast one-block streams,
q10/q11 lean hard on the static dictionary, transforms and context
modeling), window sizes 10..24, text/binary/random/repetitive payloads,
sizes 0..1 MiB (random data additionally forces UNCOMPRESSED meta-blocks).

Output: src/test/resources/brotli/vectors.bin
  [count u32 BE] then per vector:
  [rawLen u32 BE][compLen u32 BE][raw bytes][compressed bytes]
"""
import os
import random
import struct
import sys

sys.path.insert(0, "/root/miniconda/pkgs/brotlicffi-1.2.0.0-py313h7354ed3_0/"
                   "lib/python3.13/site-packages")
import brotlicffi  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(REPO, "src/test/resources/brotli")
os.makedirs(OUT, exist_ok=True)

rng = random.Random(421331)

ENGLISH = (
    "The quick brown fox jumps over the lazy dog. Information about the "
    "world that people should know when they download the description "
    "from the website, because different languages provide different "
    "public services and the government cannot provide everything for "
    "all the children during the first years of the development. "
    "However, the most important question is whether the International "
    "Conference on Language Technology will be able to receive the "
    "necessary support from the University and the Department of "
    "Education before the beginning of the following season. ")

HTML = (
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>A perfectly "
    "ordinary page</title><style>body{font-family:sans-serif}</style></head>"
    "<body><nav><a href=\"/home\">Home</a> | <a href=\"/about\">About</a>"
    "</nav><article><h1>Compression on the web</h1><p>Content-Encoding "
    "negotiation allows the server to choose between gzip, deflate, zstd "
    "and brotli depending on what the client advertises in its "
    "Accept-Encoding header. Most modern browsers prefer brotli for "
    "text resources because the static dictionary was trained on web "
    "content.</p></article><footer>&copy; 2026 Example Industries "
    "&middot; <a href=\"/privacy\">Privacy</a></footer></body></html> ")

MULTILINGUAL = (
    "Wikipédia est une encyclopédie libre. Свободная энциклопедия — это "
    "проект, который каждый может редактировать. ウィキペディアは誰でも編集"
    "できるフリー百科事典です。 Ελεύθερη εγκυκλοπαίδεια. Tiếng Việt: Bách "
    "khoa toàn thư mở. €£¥ — naïve café résumé übermäßig Đông. ")


def texts():
    cases = []
    # tiny / edge sizes
    cases += [b"", b"a", b"ab", b"the", b" the of and ", b"\x00",
              b"\xff" * 7, ENGLISH.encode()[:64]]
    # english, growing sizes (dictionary + transforms + context modeling)
    for n in (400, 4096, 65536, 262144):
        s = (ENGLISH * (n // len(ENGLISH) + 1))[:n]
        cases.append(s.encode())
    # english with casing variation (uppercase transforms)
    cases.append((ENGLISH.upper() + ENGLISH + ENGLISH.title()).encode())
    # html (the actual Content-Encoding: br use case)
    for n in (1, 8, 64):
        cases.append((HTML * n).encode())
    # multilingual utf-8 (multi-byte ferment arms)
    cases.append((MULTILINGUAL * 40).encode())
    # highly repetitive (long copy lengths, distance ring reuse)
    cases.append(b"abc" * 50000)
    cases.append((b"0123456789ABCDEF" * 4096) + b"tail")
    cases.append(b"\x00" * 1048576)
    # structured binary (signed context mode territory)
    cases.append(struct.pack("<" + "i" * 20000,
                             *[rng.randint(-100, 100) for _ in range(20000)]))
    cases.append(bytes(rng.randint(0, 255) & 0x3f for _ in range(30000)))
    # incompressible randomness (uncompressed meta-blocks)
    cases.append(bytes(rng.getrandbits(8) for _ in range(65536)))
    cases.append(bytes(rng.getrandbits(8) for _ in range(301)))
    return cases


def settings():
    # (quality, lgwin) pairs covering the feature space without a full
    # cross product; every quality family and window extreme appears
    return [(0, 22), (1, 10), (1, 22), (2, 16), (4, 22), (5, 12), (6, 22),
            (9, 18), (10, 22), (11, 10), (11, 22), (11, 24)]


def is_incompressible(raw: bytes) -> bool:
    return len(raw) > 1000 and len(brotlicffi.compress(raw, quality=1)) > 0.9 * len(raw)


vectors = []
for raw in texts():
    # incompressible payloads exercise only the UNCOMPRESSED meta-block
    # path, which barely varies by setting — 3 settings suffice (keeps the
    # committed vector file small; random bytes can't gzip either)
    cfgs = ([(1, 22), (6, 22), (11, 22)] if is_incompressible(raw)
            else settings())
    for (q, w) in cfgs:
        for mode in ((brotlicffi.MODE_GENERIC, brotlicffi.MODE_TEXT)
                     if q in (5, 11) else (brotlicffi.MODE_GENERIC,)):
            comp = brotlicffi.compress(raw, quality=q, lgwin=w, mode=mode)
            assert brotlicffi.decompress(comp) == raw
            vectors.append((raw, comp))

# dedupe identical (raw, comp) pairs (different settings can coincide)
seen = set()
unique = []
for raw, comp in vectors:
    k = (len(raw), comp)
    if k in seen:
        continue
    seen.add(k)
    unique.append((raw, comp))

path = os.path.join(OUT, "vectors.bin")
with open(path, "wb") as f:
    f.write(struct.pack(">I", len(unique)))
    for raw, comp in unique:
        f.write(struct.pack(">II", len(raw), len(comp)))
        f.write(raw)
        f.write(comp)
total_raw = sum(len(r) for r, _ in unique)
total_comp = sum(len(c) for _, c in unique)
print(f"wrote {path}: {len(unique)} vectors, "
      f"{total_raw} raw bytes, {total_comp} compressed bytes, "
      f"file {os.path.getsize(path)} bytes")

#!/usr/bin/env python3
"""Extract the RFC 7932 (Brotli) static data tables from a local libbrotli
build, for embedding as resources in the pure-Scala decoder
(graft.functions.BrotliKernel).

Everything extracted here is PUBLIC STANDARD DATA, defined normatively by
RFC 7932 (the static dictionary in Appendix A, the word transforms in
Appendix B, the literal-context lookup tables in Section 7.1, the
block-count code in Section 6). The local shared library is only a
convenient byte-exact carrier of that public data — extracting from it
avoids retyping 122 KB of standardized constants by hand.

Outputs (paths relative to the repo root):
  src/main/resources/graft/brotli/dictionary.bin   122,784 bytes, App. A
  src/main/resources/graft/brotli/context_lut.bin    2,048 bytes, §7.1
  src/main/resources/graft/brotli/transforms.bin   derived, App. B
  (and prints the block-length code table from §6 for cross-checking the
   constants hardcoded in BrotliKernel)

The transforms are derived EMPIRICALLY: for each transform id 0..120 the
library's own BrotliTransformDictionaryWord is applied to two distinctive
probe words, and the (prefix, word-operation, suffix) triple is solved
from the outputs. That sidesteps any dependence on internal struct
layouts AND validates the derivation (both probes must agree).

transforms.bin format (all lengths u8):
  [count] then per transform: [prefixLen][prefix][op][suffixLen][suffix]
  op: 0 = identity, 1..9 = OmitLast1..9, 10 = UppercaseFirst,
      11 = UppercaseAll, 12..20 = OmitFirst1..9
"""
import ctypes
import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LIB = os.environ.get("BROTLI_COMMON", "/root/miniconda/lib/libbrotlicommon.so")

lib = ctypes.CDLL(LIB)


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
lib.BrotliGetTransforms.restype = ctypes.c_void_p
lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
lib.BrotliTransformDictionaryWord.argtypes = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int, ctypes.c_void_p, ctypes.c_int]

OUT = os.path.join(REPO, "src/main/resources/graft/brotli")
os.makedirs(OUT, exist_ok=True)

# --- dictionary ----------------------------------------------------------
d = lib.BrotliGetDictionary().contents
size_bits = list(d.size_bits_by_length)
print("size_bits_by_length[4..24] =", size_bits[4:25])
print("data_size =", d.data_size)
assert d.data_size == 122784, d.data_size
dict_bytes = bytes(ctypes.cast(d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
assert dict_bytes[:16] == b"timedownlifeleft", dict_bytes[:16]
with open(os.path.join(OUT, "dictionary.bin"), "wb") as f:
    f.write(dict_bytes)
print("wrote dictionary.bin", len(dict_bytes))

# --- context lookup table ------------------------------------------------
lut = bytes((ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable"))
with open(os.path.join(OUT, "context_lut.bin"), "wb") as f:
    f.write(lut)
print("wrote context_lut.bin", len(lut))

# --- block-length code (cross-check print only) --------------------------
ranges = bytes((ctypes.c_uint8 * 104).in_dll(lib, "_kBrotliPrefixCodeRanges"))
tbl = [struct.unpack_from("<HBx", ranges, i * 4) for i in range(26)]
print("block-length code (offset, nbits):", tbl)

# --- transforms, derived empirically -------------------------------------
transforms = lib.BrotliGetTransforms()


def apply(word: bytes, idx: int) -> bytes:
    dst = (ctypes.c_uint8 * 256)()
    src = (ctypes.c_uint8 * len(word)).from_buffer_copy(word)
    n = lib.BrotliTransformDictionaryWord(dst, src, len(word), transforms, idx)
    return bytes(dst[:n])


def ferment_first(w: bytes) -> bytes:
    b = bytearray(w)
    if not b:
        return bytes(b)
    c = b[0]
    if c < 192:
        if 97 <= c <= 122:
            b[0] ^= 32
    elif c < 224:
        if len(b) > 1:
            b[1] ^= 32
    else:
        if len(b) > 2:
            b[2] ^= 5
    return bytes(b)


def ferment_all(w: bytes) -> bytes:
    b = bytearray(w)
    i = 0
    while i < len(b):
        c = b[i]
        if c < 192:
            if 97 <= c <= 122:
                b[i] ^= 32
            i += 1
        elif c < 224:
            if i + 1 < len(b):
                b[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(b):
                b[i + 2] ^= 5
            i += 3
    return bytes(b)


def candidates(w: bytes):
    yield 0, w
    for n in range(1, 10):
        yield n, w[:-n] if n < len(w) else b""
    yield 10, ferment_first(w)
    yield 11, ferment_all(w)
    for n in range(1, 10):
        yield 11 + n, w[n:] if n < len(w) else b""


PROBES = [b"abcdefghijklmnopqrstu", b"zyxwvutsrqponmlkjihgf"]

entries = []
for t in range(121):
    solved = None
    outs = [apply(p, t) for p in PROBES]
    for op, tw0 in candidates(PROBES[0]):
        pos = outs[0].find(tw0) if tw0 else -2
        if pos < 0 and tw0:
            continue
        # try every possible split position for empty transformed words
        positions = range(len(outs[0]) + 1) if not tw0 else [pos]
        for p0 in positions:
            prefix = outs[0][:p0]
            suffix = outs[0][p0 + len(tw0):]
            # verify on the second probe
            op_map = dict(candidates(PROBES[1]))
            tw1 = op_map[op]
            if prefix + tw1 + suffix == outs[1]:
                solved = (prefix, op, suffix)
                break
        if solved:
            break
    assert solved is not None, f"transform {t} unsolved: {outs}"
    entries.append(solved)

# sanity: transform 0 is the identity with empty prefix/suffix
assert entries[0] == (b"", 0, b""), entries[0]
with open(os.path.join(OUT, "transforms.bin"), "wb") as f:
    f.write(bytes([len(entries)]))
    for prefix, op, suffix in entries:
        f.write(bytes([len(prefix)]) + prefix + bytes([op]) +
                bytes([len(suffix)]) + suffix)
ops_used = sorted({e[1] for e in entries})
print(f"wrote transforms.bin ({len(entries)} transforms, ops used: {ops_used})")
for i in (0, 1, 2, 3, 4, 5, 9, 12, 44, 120):
    p, op, s = entries[i]
    print(f"  t{i}: prefix={p!r} op={op} suffix={s!r}")

"""Vectorized single-block MD5 (numpy) for hot per-gram hashing paths.

The engine's portable 60-bit hash is "top 60 bits of md5" (see
queries.py: the DuckDB oracles spell it ``CAST('0x' || substr(md5(x), 1, 15)
AS BIGINT)``), so fingerprint paths that hash one value per CHARACTER
POSITION (q43 winnowing: one md5 per gram, ~L hashes per document) pay one
Python ``hashlib.md5`` call per position. For messages that fit a single
64-byte MD5 block (<= 55 bytes — every winnowing gram, k=16) the whole
digest can instead be computed for ALL positions at once with numpy uint32
arithmetic: 64 rounds of in-place element-wise ops over a (chunk, 16) word
matrix. Measured on this container: ~3x over the ``hashlib`` loop at 2M
grams (0.45s vs 1.6s single-threaded), bit-identical output.

Chunked at _CHUNK rows so the six uint32 work arrays stay L2-resident —
the unchunked form is memory-bandwidth bound and LOSES to hashlib (measured
0.5x at 2M rows). RFC 1321 round structure; constants are the standard
``floor(abs(sin(i+1)) * 2^32)`` table, derived here rather than pasted.
"""
from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

# Per-round left-rotate amounts and message-word schedule (RFC 1321).
_S = np.array(
    [7, 12, 17, 22] * 4
    + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    np.uint32,
)
_K = np.array(
    [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    np.uint64,
).astype(np.uint32)
_G = np.array(
    list(range(16))
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    np.int64,
)

# Rows per compression sweep: 2^13 keeps the ~6 uint32 work arrays well
# inside L2 (6 * 4 B * 8192 = 192 KiB); measured optimum on this container
# is flat across 4k-16k and 1.5x worse by 256k.
_CHUNK = 1 << 13

_IV = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _compress_top60(M: np.ndarray, out: np.ndarray) -> None:
    """One MD5 compression over n independent single-block messages.

    M: (n, 16) uint32 little-endian message words (already padded).
    Writes the top 60 bits of each digest (= first 15 hex chars, the
    engine's portable hash) into ``out`` (int64). No allocations in the
    round loop: registers rotate by reference, the freed array becomes the
    next round's scratch.
    """
    n = M.shape[0]
    A = np.full(n, _IV[0], np.uint32)
    B = np.full(n, _IV[1], np.uint32)
    C = np.full(n, _IV[2], np.uint32)
    D = np.full(n, _IV[3], np.uint32)
    f = np.empty(n, np.uint32)
    scratch = np.empty(n, np.uint32)
    for i in range(64):
        # Round functions in their 3-op xor/and forms (fewer passes than
        # the (x&y)|(~x&z) textbook spelling).
        if i < 16:
            np.bitwise_xor(C, D, out=f)
            np.bitwise_and(f, B, out=f)
            np.bitwise_xor(f, D, out=f)
        elif i < 32:
            np.bitwise_xor(B, C, out=f)
            np.bitwise_and(f, D, out=f)
            np.bitwise_xor(f, C, out=f)
        elif i < 48:
            np.bitwise_xor(B, C, out=f)
            np.bitwise_xor(f, D, out=f)
        else:
            np.invert(D, out=f)
            np.bitwise_or(f, B, out=f)
            np.bitwise_xor(f, C, out=f)
        t = scratch
        np.add(A, f, out=t)
        t += _K[i]
        t += M[:, _G[i]]
        s = int(_S[i])
        np.left_shift(t, np.uint32(s), out=f)
        t >>= np.uint32(32 - s)
        t |= f
        t += B
        A, B, C, D, scratch = D, t, B, C, A
    A += np.uint32(_IV[0])
    B += np.uint32(_IV[1])
    # digest bytes are LE(A)||LE(B)||...; the "first 15 hex chars" value is
    # the big-endian int of the first 8 digest bytes >> 4.
    hi = A.byteswap().astype(np.uint64)
    hi <<= np.uint64(32)
    hi |= B.byteswap().astype(np.uint64)
    hi >>= np.uint64(4)
    out[:] = hi.view(np.int64)


def md5_top60_sliding(buf, k: int) -> np.ndarray:
    """Top-60-bit md5 of every k-byte sliding gram of ``buf``.

    Bit-identical to ``int.from_bytes(md5(buf[i:i+k]).digest()[:8],
    "big") >> 4`` for i in range(len(buf)-k+1) — the q43 winnowing gram
    hash. If ``buf`` is shorter than ``k``, hashes the single short
    message (matching the slice semantics of ``buf[0:k]``).
    """
    if not 1 <= k <= 55:
        raise ValueError(f"single-block md5 needs 1 <= k <= 55, got {k}")
    arr = np.frombuffer(buf, np.uint8)
    if len(arr) < k:
        return md5_top60_batch([bytes(buf)])
    n = len(arr) - k + 1
    grams = sliding_window_view(arr, k)
    out = np.empty(n, np.int64)
    block = np.zeros((min(n, _CHUNK), 64), np.uint8)
    # fixed-length messages share one padding: 0x80 terminator + bit length
    # little-endian in bytes 56..63 (k*8 < 2^16 so two bytes suffice)
    block[:, k] = 0x80
    bitlen = k * 8
    block[:, 56] = bitlen & 0xFF
    block[:, 57] = (bitlen >> 8) & 0xFF
    words = block.view("<u4")
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        m = hi - lo
        block[:m, :k] = grams[lo:hi]
        _compress_top60(words[:m], out[lo:hi])
    return out


def md5_top60_sliding_multi(bufs, k: int):
    """Top-60-bit md5 of every k-byte sliding gram of EACH buffer, with the
    compression chunks filled ACROSS buffer boundaries.

    The per-call overhead of the 64-round compression is ~448 numpy-dispatch
    invocations; for a single ~1.5 KB document that overhead eats the whole
    vectorization win (measured: per-doc calls ran no faster than the
    hashlib loop on the bench corpus). Packing all documents of an Arrow
    batch into shared _CHUNK-row blocks amortizes it to nothing.

    Every buffer must be >= k bytes (the caller routes shorter ones through
    md5_top60_batch, whose padding differs per length). Returns
    ``(values, counts)``: one flat int64 array of all gram hashes in input
    order, and the per-buffer gram counts for splitting.
    """
    if not 1 <= k <= 55:
        raise ValueError(f"single-block md5 needs 1 <= k <= 55, got {k}")
    counts = np.array([len(b) - k + 1 for b in bufs], np.int64)
    if (counts <= 0).any():
        raise ValueError("all buffers must be at least k bytes")
    total = int(counts.sum())
    out = np.empty(total, np.int64)
    block = np.zeros((_CHUNK, 64), np.uint8)
    block[:, k] = 0x80
    bitlen = k * 8
    block[:, 56] = bitlen & 0xFF
    block[:, 57] = (bitlen >> 8) & 0xFF
    words = block.view("<u4")
    pos = 0  # fill level of the current block
    written = 0
    for buf in bufs:
        grams = sliding_window_view(np.frombuffer(buf, np.uint8), k)
        g, n = 0, len(grams)
        while g < n:
            take = min(_CHUNK - pos, n - g)
            block[pos : pos + take, :k] = grams[g : g + take]
            pos += take
            g += take
            if pos == _CHUNK:
                _compress_top60(words, out[written : written + _CHUNK])
                written += _CHUNK
                pos = 0
    if pos:
        _compress_top60(words[:pos], out[written : written + pos])
    return out, counts


def md5_top60_batch(msgs) -> np.ndarray:
    """Top-60-bit md5 of each message in ``msgs`` (bytes, each <= 55 B).

    Variable-length companion to md5_top60_sliding for token paths; any
    message longer than 55 bytes raises (caller falls back to hashlib).
    """
    n = len(msgs)
    out = np.empty(n, np.int64)
    block = np.zeros((min(n, _CHUNK), 64), np.uint8)
    words = block.view("<u4")
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        m = hi - lo
        blk = block[:m]
        blk[:, :] = 0
        for j in range(m):
            msg = msgs[lo + j]
            ln = len(msg)
            if ln > 55:
                raise ValueError("message exceeds single MD5 block (55 B)")
            blk[j, :ln] = np.frombuffer(msg, np.uint8)
            blk[j, ln] = 0x80
            bitlen = ln * 8
            blk[j, 56] = bitlen & 0xFF
            blk[j, 57] = (bitlen >> 8) & 0xFF
        _compress_top60(words[:m], out[lo:hi])
    return out

"""Counter-based deterministic randomness: Threefry-4x64-20 + PMAC.

Reference-parity implementation of the reference's RNG design
(`hail/hail/src/is/hail/expr/ir/Random.scala:14-255`, design doc
`dev-docs/hail-query/randomness.md`):

- `threefry_encrypt` — the Threefry-4x64 block cipher, 20 rounds, with the
  reference's tweak schedule (t2 = t0 ^ t1, key injection every 4 rounds).
  Verified against the skein_golden_kat_short test vectors that the
  reference's own `RandomSuite.scala:16-30` pins.
- `pmac_hash` / `pmac` — the PMAC incremental hash over a message of 64-bit
  words (row UIDs), with the static-block nonce/staticID prefix and the
  padded/no-pad final-tweak distinction (`Random.scala:261-301`).
- `rand_doubles` — vectorized emulation of `ThreefryRandomEngine.nextDouble`
  (`Random.scala:553-572`): the "infinite-precision real rounded down"
  construction (exponent from trailing-zero count, significand from the
  next 52 bits), NOT the biased `(bits >> 11) / 2^53` ladder.

Everything is vectorized numpy over row batches: one row = one counter
(uid), so values are independent of partitioning and evaluation order —
the property the reference calls "deterministic and distributed" randomness.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

U64 = np.uint64

ROT_CONSTS = ((14, 16), (52, 57), (23, 40), (5, 37),
              (25, 33), (46, 12), (58, 22), (32, 32))

KEY_CONST = U64(0x1BD11BDAA9FC1A22)

STATIC_TWEAK = np.int64(-1).astype(U64)
FINAL_BLOCK_NO_PAD_TWEAK = np.int64(-2).astype(U64)
FINAL_BLOCK_PADDED_TWEAK = np.int64(-3).astype(U64)


def expand_key(k: Sequence[int]) -> np.ndarray:
    """4-word key -> 5-word expanded key (Random.scala:42-46)."""
    assert len(k) == 4
    k = np.asarray([U64(w & 0xFFFFFFFFFFFFFFFF) for w in k], dtype=U64)
    k4 = k[0] ^ k[1] ^ k[2] ^ k[3] ^ KEY_CONST
    return np.concatenate([k, np.asarray([k4], dtype=U64)])


DEFAULT_KEY = expand_key([0x215D6DFDB7DFDF6B, 0x045CFA043329C49F,
                          0x9EC75A93692444DD, 0x1284681663220F1C])


def _rotl(x: np.ndarray, n: int) -> np.ndarray:
    n = n & 63
    return (x << U64(n)) | (x >> U64(64 - n))


def threefry_encrypt(x: np.ndarray, tweak, key: np.ndarray = DEFAULT_KEY,
                     rounds: int = 20) -> np.ndarray:
    """Threefry-4x64 over a batch: x is (n, 4) uint64, returns (n, 4).

    `tweak` is (t0, t1) of scalars or (n,) arrays. Matches
    `Threefry.encrypt` (Random.scala:181-206) bit-for-bit.
    """
    assert key.shape == (5,)
    x = np.array(x, dtype=U64, copy=True)
    squeeze = False
    if x.ndim == 1:
        x = x[None, :]
        squeeze = True
    t0 = np.asarray(tweak[0], dtype=U64)
    t1 = np.asarray(tweak[1], dtype=U64)
    t = (t0, t1, t0 ^ t1)

    cols = [x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), x[:, 3].copy()]

    with np.errstate(over='ignore'):
        for d in range(rounds):
            if d % 4 == 0:
                s = d // 4
                cols[0] += key[s % 5]
                cols[1] += key[(s + 1) % 5] + t[s % 3]
                cols[2] += key[(s + 2) % 5] + t[(s + 1) % 3]
                cols[3] += key[(s + 3) % 5] + U64(s)
            r0, r1 = ROT_CONSTS[d % 8]
            cols[0] += cols[1]
            cols[1] = _rotl(cols[1], r0) ^ cols[0]
            cols[2] += cols[3]
            cols[3] = _rotl(cols[3], r1) ^ cols[2]
            cols[1], cols[3] = cols[3], cols[1]
        if rounds % 4 == 0:
            s = rounds // 4
            cols[0] += key[s % 5]
            cols[1] += key[(s + 1) % 5] + t[s % 3]
            cols[2] += key[(s + 2) % 5] + t[(s + 1) % 3]
            cols[3] += key[(s + 3) % 5] + U64(s)

    out = np.stack(cols, axis=-1)
    return out[0] if squeeze else out


def _as_u64_cols(message, n: int) -> List[np.ndarray]:
    cols = []
    for m in message:
        a = np.asarray(m)
        if a.ndim == 0:
            a = np.broadcast_to(a, (n,))
        cols.append(a.astype(np.int64).view(U64) if a.dtype.kind == 'i'
                    else a.astype(U64))
    return cols


def pmac_hash(nonce: int, static_id: int, message, n: int = None):
    """PMAC over per-row messages -> ((n,4) hash, final_tweak scalar).

    `message` is a sequence of message *words*, each a scalar or (n,) array
    (column-vectorized: row i's message is [message[0][i], message[1][i]...]).
    Mirrors `Threefry.pmacHash` (Random.scala:272-301): the nonce/staticID
    block is encrypted with the static tweak, full 4-word blocks are
    encrypted with tweak (block_start, 0) and xor-summed, and the final
    (possibly 1-padded) block is xored in raw; the caller encrypts with the
    returned final tweak.
    """
    if n is None:
        n = 1
        for m in message:
            a = np.asarray(m)
            if a.ndim:
                if a.shape[0] == 0:
                    n = 0
                    break
                n = max(n, a.shape[0])
    cols = _as_u64_cols(message, n)
    L = len(cols)
    padded_len = max((L + 3) & ~3, 4)
    padded = padded_len != L
    blocks = [np.broadcast_to(c, (n,)) for c in cols]
    if padded:
        pad = [np.full(n, U64(1) if j == L else U64(0), dtype=U64)
               for j in range(L, padded_len)]
        blocks = blocks + pad

    init = np.empty((n, 4), dtype=U64)
    init[:, 0] = U64(int(nonce) & 0xFFFFFFFFFFFFFFFF)
    init[:, 1] = U64(int(static_id) & 0xFFFFFFFFFFFFFFFF)
    init[:, 2] = 0
    init[:, 3] = 0
    s = threefry_encrypt(init, (STATIC_TWEAK, U64(0)))

    i = 0
    while i + 4 < padded_len:
        blk = np.stack(blocks[i:i + 4], axis=-1)
        enc = threefry_encrypt(blk, (U64(i), U64(0)))
        s ^= enc
        i += 4
    for j in range(4):
        s[:, j] ^= blocks[i + j]
    final_tweak = FINAL_BLOCK_PADDED_TWEAK if padded else FINAL_BLOCK_NO_PAD_TWEAK
    return s, final_tweak


def pmac(nonce: int, static_id: int, message, n: int = None) -> np.ndarray:
    """Full PMAC: hash then final encryption (Random.scala:261-265)."""
    s, ft = pmac_hash(nonce, static_id, message, n)
    return threefry_encrypt(s, (ft, U64(0)))


def _trailing_zeros(bits: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (bits != 0)."""
    low = bits & (~bits + U64(1))          # lowest set bit (power of two)
    # a power of two is exactly representable in f64; log2 is exact
    return np.log2(low.astype(np.float64)).astype(np.int64)


def rand_doubles(hash4: np.ndarray, final_tweak) -> np.ndarray:
    """One `nextDouble()` per row from a PMAC hash state.

    Emulates ThreefryRandomEngine: buffer = encrypt(state, (tweak, counter));
    nextLong() = buffer[0]; the infinite-precision double construction
    (Random.scala:553-572). The bits==0 refill loop is carried through the
    remaining buffer words (probability 2^-64 per step; beyond the first
    buffer the contribution is below double precision and clamps to 0).
    """
    n = hash4.shape[0]
    buf = threefry_encrypt(hash4, (np.broadcast_to(np.asarray(final_tweak, U64), (n,)),
                                   U64(0)))
    bits = buf[:, 0]
    exponent = np.full(n, 1022, dtype=np.int64)
    word = np.ones(n, dtype=np.int64)       # next unread buffer word index
    for w in (1, 2, 3):
        zero = bits == 0
        if not zero.any():
            break
        bits = np.where(zero, buf[:, w], bits)
        exponent = np.where(zero, exponent - 64, exponent)
        word = np.where(zero, w + 1, word)
    # rows still zero after 4 words: value is below 2^-256 -> 0.0
    dead = bits == 0
    bits = np.where(dead, U64(1) << U64(12), bits)

    e = _trailing_zeros(bits)
    exponent = exponent - e
    # significand: current bits if e < 12, else the next long (next word;
    # rows that exhausted the buffer would refill — approximate with a
    # second encryption only if needed)
    need_next = e >= 12
    if need_next.any():
        nxt_idx = np.minimum(word, 3)
        nxt = buf[np.arange(n), nxt_idx]
        refill = word > 3
        if refill.any():
            buf2 = threefry_encrypt(hash4, (np.broadcast_to(np.asarray(final_tweak, U64), (n,)), U64(1)))
            nxt = np.where(refill, buf2[:, 0], nxt)
        sig_src = np.where(need_next, nxt, bits)
    else:
        sig_src = bits
    significand = sig_src >> U64(12)
    result = (exponent.astype(np.int64) << np.int64(52)).view(U64) | significand
    out = result.view(np.float64).copy()
    out[dead] = 0.0
    out[exponent < 0] = 0.0
    return out


def rand_unif01(nonce: int, static_id: int, message, n: int = None) -> np.ndarray:
    """Uniform [0,1) doubles, one per row: PMAC(uids) -> nextDouble."""
    s, ft = pmac_hash(nonce, static_id, message, n)
    return rand_doubles(s, ft)


def rand_int64s(nonce: int, static_id: int, message, n: int = None) -> np.ndarray:
    """Four raw 64-bit words per row (the engine's first buffer fill)."""
    s, ft = pmac_hash(nonce, static_id, message, n)
    nn = s.shape[0]
    return threefry_encrypt(s, (np.broadcast_to(np.asarray(ft, U64), (nn,)), U64(0)))

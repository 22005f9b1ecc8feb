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


# ---------------------------------------------------------------------------
# ThreefryRandomEngine emulation (Random.scala:406-572): a per-row buffered
# stream over encrypt(state, (finalTweak, counter)); ints are consumed
# high-32-first within each 64-bit word.
# ---------------------------------------------------------------------------

_MASK32 = 0xFFFFFFFF


class ScalarEngine:
    """Exact per-row engine for the rare slow paths (rejection resampling)."""

    def __init__(self, state4, final_tweak):
        self.state = np.asarray(state4, dtype=U64)
        self.tweak = U64(final_tweak)
        self.counter = 0
        self.used = 8
        self.buf = None

    def _fill(self):
        self.buf = threefry_encrypt(self.state[None, :],
                                    (self.tweak, U64(self.counter)))[0]
        self.used = 0
        self.counter += 1

    def next_int(self) -> int:
        if self.used >= 8:
            self._fill()
        result = int(self.buf[self.used >> 1])
        self.used += 1
        parity = self.used & 1
        shift = parity << 5
        return (result >> shift) & _MASK32

    def next_long(self) -> int:
        self.used += self.used & 1
        if self.used >= 8:
            self._fill()
        r = int(self.buf[self.used >> 1])
        self.used += 2
        return r

    def next_int_bounded(self, n: int) -> int:
        # Lemire-style bounded draw (Random.scala:491-508)
        mult = n * (self.next_int() & _MASK32)
        result = mult >> 32
        fraction = mult & _MASK32
        if fraction < (1 << 32) - n:
            return result
        mult_high = (((n * (self.next_int() & _MASK32)) >> 32)
                     + (n * (self.next_int() & _MASK32))) >> 32
        s = fraction + mult_high
        carry = (s >> 32) & 1
        return result + carry

    def next_long_bounded(self, l: int) -> int:
        x = (self.next_long() & ((1 << 64) - 1)) >> 1
        r = x % l
        while x - r + (l - 1) >= (1 << 63):
            x = (self.next_long() & ((1 << 64) - 1)) >> 1
            r = x % l
        return r


def map4_unif(block: np.ndarray) -> np.ndarray:
    """RandomSeededFunctions._rand_unif: an (n,4) random block -> uniform
    [0,1) doubles via the infinite-precision-bitstream construction (bits
    scanned long3..long0, significand always long0 >>> 12)."""
    n = block.shape[0]
    bits = block[:, 3].copy()
    exp = np.full(n, 1022, dtype=np.int64)
    for w in (2, 1, 0):
        zero = bits == 0
        if not zero.any():
            break
        bits = np.where(zero, block[:, w], bits)
        exp = np.where(zero, exp - 64, exp)
    dead = bits == 0
    bits = np.where(dead, U64(1), bits)
    exp = exp - _trailing_zeros(bits)
    result = (exp.astype(np.int64) << np.int64(52)).view(U64) \
        | (block[:, 0] >> U64(12))
    out = result.view(np.float64).copy()
    out[dead] = 0.0
    return out


def _rand_state(nonce: int, static_id: int, words, n: int = None):
    """PMAC the uid words -> ((n,4) engine state, final tweak)."""
    return pmac_hash(nonce, static_id, words, n)


def rand_unif_exact(nonce, static_id, words, n=None) -> np.ndarray:
    """hl.rand_unif parity: _rand_unif over rngState.rand() (the PMAC final
    encryption block)."""
    s, ft = pmac_hash(nonce, static_id, words, n)
    block = threefry_encrypt(s, (ft, U64(0)))
    return map4_unif(block)


def rand_int32_bounded(nonce, static_id, words, bound, n=None) -> np.ndarray:
    """hl.rand_int32 parity: engine nextInt(bound) per row. `bound` is a
    scalar or (n,) int array."""
    s, ft = pmac_hash(nonce, static_id, words, n)
    nrows = s.shape[0]
    block0 = threefry_encrypt(s, (ft, U64(0)))
    hi = (block0[:, 0] >> U64(32)).astype(np.int64)   # first nextInt: high 32
    b = np.broadcast_to(np.asarray(bound, dtype=np.int64), (nrows,))
    mult = b * hi
    result = (mult >> np.int64(32)).astype(np.int64)
    fraction = mult & np.int64(_MASK32)
    slow = fraction >= (np.int64(1 << 32) - b)
    if slow.any():
        for i in np.where(slow)[0]:
            result[i] = ScalarEngine(s[i], ft).next_int_bounded(int(b[i]))
    return result.astype(np.int32)


def rand_int64_full(nonce, static_id, words, n=None) -> np.ndarray:
    """hl.rand_int64() parity: engine nextLong per row."""
    s, ft = pmac_hash(nonce, static_id, words, n)
    return threefry_encrypt(s, (ft, U64(0)))[:, 0].view(np.int64).copy()


def rand_int64_bounded(nonce, static_id, words, bound, n=None) -> np.ndarray:
    """hl.rand_int64(l) parity: engine nextLong(l) per row."""
    s, ft = pmac_hash(nonce, static_id, words, n)
    nrows = s.shape[0]
    b = np.broadcast_to(np.asarray(bound, dtype=np.int64), (nrows,))
    out = np.empty(nrows, dtype=np.int64)
    block0 = threefry_encrypt(s, (ft, U64(0)))
    x = (block0[:, 0] >> U64(1)).astype(np.int64)
    r = x % b
    ok = (x - r + (b - 1)) >= 0
    out[ok] = r[ok]
    for i in np.where(~ok)[0]:
        out[i] = ScalarEngine(s[i], ft).next_long_bounded(int(b[i]))
    return out


def _long_to_double_bits(result: int) -> float:
    import struct as _struct
    return _struct.unpack('<d', _struct.pack('<Q', result & ((1 << 64) - 1)))[0]


def _scalar_next_double(eng: 'ScalarEngine') -> float:
    """Engine nextDouble (Random.scala:553-572)."""
    bits = eng.next_long() & ((1 << 64) - 1)
    exponent = 1022
    while bits == 0:
        bits = eng.next_long() & ((1 << 64) - 1)
        exponent -= 64
    e = (bits & -bits).bit_length() - 1
    exponent -= e
    significand = (bits if e < 12 else eng.next_long() & ((1 << 64) - 1)) >> 12
    return _long_to_double_bits(((exponent & 0xFFF) << 52) | significand)


ScalarEngine.next_double = _scalar_next_double


_EXPMAX = 1024 * 0.693147180559945309417232121458  # log(DBL_MAX)


def rbeta_engine(eng: 'ScalarEngine', aa: float, bb: float) -> float:
    """Beta variate via Cheng's BB/BC algorithms (R nmath rbeta.c; jdistlib
    Beta.random) consuming the engine's nextDouble stream."""
    import math
    if math.isnan(aa) or math.isnan(bb) or aa < 0.0 or bb < 0.0:
        return float('nan')
    if not math.isfinite(aa) and not math.isfinite(bb):
        return 0.5
    if aa == 0.0 and bb == 0.0:
        return 0.0 if eng.next_double() < 0.5 else 1.0
    if not math.isfinite(aa) or bb == 0.0:
        return 1.0
    if not math.isfinite(bb) or aa == 0.0:
        return 0.0

    a = min(aa, bb)
    b = max(aa, bb)
    alpha = a + b

    def v_w(AA, beta, u1):
        v = beta * math.log(u1 / (1.0 - u1))
        if v <= _EXPMAX:
            w = AA * math.exp(v)
            if not math.isfinite(w):
                w = 1.7976931348623157e308
        else:
            w = 1.7976931348623157e308
        return v, w

    if a <= 1.0:  # Algorithm BC — NOTE R swaps notation here: a = LARGER
        a = max(aa, bb)
        b = min(aa, bb)
        alpha = a + b
        beta = 1.0 / b
        delta = 1.0 + a - b
        k1 = delta * (0.0138889 + 0.0416667 * b) / (a * beta - 0.777778)
        k2 = 0.25 + (0.5 + 0.25 / delta) * b
        while True:
            u1 = eng.next_double()
            u2 = eng.next_double()
            if u1 < 0.5:
                y = u1 * u2
                z = u1 * y
                if 0.25 * u2 + z - y >= k1:
                    continue
            else:
                z = u1 * u1 * u2
                if z <= 0.25:
                    v, w = v_w(a, beta, u1)
                    break
                if z >= k2:
                    continue
            v, w = v_w(a, beta, u1)
            if alpha * (math.log(alpha / (b + w)) + v) - 1.3862944 >= math.log(z):
                break
        return b / (b + w) if aa != a else w / (b + w)

    # Algorithm BB
    beta = math.sqrt((alpha - 2.0) / (2.0 * a * b - alpha))
    gamma = a + 1.0 / beta
    while True:
        u1 = eng.next_double()
        u2 = eng.next_double()
        v, w = v_w(a, beta, u1)
        z = u1 * u1 * u2
        r = gamma * v - 1.3862944
        s = a + r - w
        if s + 2.609438 >= 5.0 * z:
            break
        t = math.log(z)
        if s > t:
            break
        if r + alpha * math.log(alpha / (b + w)) >= t:
            break
    return b / (b + w) if aa != a else w / (b + w)


def rand_beta_exact(nonce, static_id, words, a, b, lo=None, hi=None, n=None):
    """hl.rand_beta parity: jdistlib Beta.random per row, rejection-resampled
    into [lo, hi] when bounds are given (RandomSeededFunctions rand_beta)."""
    s, ft = pmac_hash(nonce, static_id, words, n)
    nrows = s.shape[0]
    av = np.broadcast_to(np.asarray(a, dtype=np.float64), (nrows,))
    bv = np.broadcast_to(np.asarray(b, dtype=np.float64), (nrows,))
    out = np.empty(nrows, dtype=np.float64)
    for i in range(nrows):
        eng = ScalarEngine(s[i], ft)
        val = rbeta_engine(eng, float(av[i]), float(bv[i]))
        if lo is not None or hi is not None:
            lo_ = 0.0 if lo is None else lo
            hi_ = 1.0 if hi is None else hi
            while val < lo_ or val > hi_:
                val = rbeta_engine(eng, float(av[i]), float(bv[i]))
        out[i] = val
    return out


def rand_cat_exact(nonce, static_id, words, weights, n=None):
    """hl.rand_cat parity: u = _rand_unif(block) * sum(weights), then linear
    scan (RandomSeededFunctions rand_cat). `weights` is (n, k)."""
    s, ft = pmac_hash(nonce, static_id, words, n)
    block = threefry_encrypt(s, (ft, U64(0)))
    u = map4_unif(block)
    w = np.asarray(weights, dtype=np.float64)
    if w.ndim == 1:
        w = np.broadcast_to(w[None, :], (s.shape[0], w.shape[0]))
    total = w.sum(axis=1)
    r = u * total
    # the scode scans by SUBTRACTION (r > w[i] -> r -= w[i]; i++), which is
    # not bit-identical to a cumulative-sum comparison — replicate it
    k = w.shape[1]
    nrows = w.shape[0]
    idx = np.zeros(nrows, dtype=np.int64)
    rows = np.arange(nrows)
    for _ in range(k):
        w_i = w[rows, np.minimum(idx, k - 1)]
        cond = (r > w_i) & (idx < k)
        if not cond.any():
            break
        r = np.where(cond, r - w_i, r)
        idx = np.where(cond, idx + 1, idx)
    return idx.astype(np.int32)

"""Threefry randomness parity (reference Random.scala / RandomSuite.scala).

- Threefry-4x64-20 against the skein_golden_kat_short test vectors the
  reference's own RandomSuite.scala:16-30 pins.
- Vectorized engine vs an independent scalar port of
  ThreefryRandomEngine.nextDouble (Random.scala:426-572).
- Stability of hl.rand_* across partitionings and repartitioning
  (dev-docs/hail-query/randomness.md: "deterministic and distributed").
"""

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.ir.random import (DEFAULT_KEY, expand_key, pmac, pmac_hash,
                                rand_unif01, threefry_encrypt)

U = np.uint64


class TestThreefryVectors:
    def test_skein_kat_zero(self):
        k = expand_key([0, 0, 0, 0])
        out = threefry_encrypt(np.zeros(4, U), (U(0), U(0)), key=k)
        exp = np.array([0x09218EBDE6C85537, 0x55941F5266D86105,
                        0x4BD25E16282434DC, 0xEE29EC846BD2E40B], dtype=U)
        assert (out == exp).all()

    def test_skein_kat_nonzero(self):
        k = expand_key([0x1716151413121110, 0x1F1E1D1C1B1A1918,
                        0x2726252423222120, 0x2F2E2D2C2B2A2928])
        tw = (U(0x0706050403020100), U(0x0F0E0D0C0B0A0908))
        x = np.array([0xF8F9FAFBFCFDFEFF, 0xF0F1F2F3F4F5F6F7,
                      0xE8E9EAEBECEDEEEF, 0xE0E1E2E3E4E5E6E7], dtype=U)
        out = threefry_encrypt(x, tw, key=k)
        exp = np.array([0x008CF75D18C19DA0, 0x1D7D14BE2266E7D8,
                        0x5D09E0E985FE673B, 0xB4A5480C6039B172], dtype=U)
        assert (out == exp).all()

    def test_batched_matches_single(self):
        rng = np.random.default_rng(0)
        xs = rng.integers(0, 2**63, (16, 4)).astype(U)
        batch = threefry_encrypt(xs, (U(3), U(7)))
        for i in range(16):
            single = threefry_encrypt(xs[i], (U(3), U(7)))
            assert (batch[i] == single).all()


# -- independent scalar port of the reference engine (test oracle) ----------

def _scalar_threefry(k, t0, t1, x):
    ROT = ((14, 16), (52, 57), (23, 40), (5, 37),
           (25, 33), (46, 12), (58, 22), (32, 32))
    M = (1 << 64) - 1
    t = (t0, t1, t0 ^ t1)
    x = list(x)
    for d in range(20):
        if d % 4 == 0:
            s = d // 4
            x[0] = (x[0] + k[s % 5]) & M
            x[1] = (x[1] + k[(s + 1) % 5] + t[s % 3]) & M
            x[2] = (x[2] + k[(s + 2) % 5] + t[(s + 1) % 3]) & M
            x[3] = (x[3] + k[(s + 3) % 5] + s) & M
        r0, r1 = ROT[d % 8]
        x[0] = (x[0] + x[1]) & M
        x[1] = (((x[1] << r0) | (x[1] >> (64 - r0))) & M) ^ x[0]
        x[2] = (x[2] + x[3]) & M
        x[3] = (((x[3] << r1) | (x[3] >> (64 - r1))) & M) ^ x[2]
        x[1], x[3] = x[3], x[1]
    s = 5
    x[0] = (x[0] + k[s % 5]) & M
    x[1] = (x[1] + k[(s + 1) % 5] + t[s % 3]) & M
    x[2] = (x[2] + k[(s + 2) % 5] + t[(s + 1) % 3]) & M
    x[3] = (x[3] + k[(s + 3) % 5] + s) & M
    return x


class _ScalarEngine:
    """Pure-python port of ThreefryRandomEngine (Random.scala:426-572)."""

    def __init__(self, nonce, static_id, message):
        M = (1 << 64) - 1
        key = [int(w) for w in DEFAULT_KEY]
        s = _scalar_threefry(key, -1 & M, 0, [nonce & M, static_id & M, 0, 0])
        # pmacHashFromState
        L = len(message)
        padded_len = max((L + 3) & ~3, 4)
        padded = padded_len != L
        msg = [m & M for m in message] + [0] * (padded_len - L)
        if padded:
            msg[L] = 1
        i = 0
        while i + 4 < padded_len:
            blk = _scalar_threefry(key, i, 0, msg[i:i + 4])
            s = [a ^ b for a, b in zip(s, blk)]
            i += 4
        s = [a ^ b for a, b in zip(s, msg[i:i + 4])]
        self.state = s
        self.tweak = (-3 if padded else -2) & M
        self.key = key
        self.counter = 0
        self.buffer = None
        self.used = 8

    def next_long(self):
        if self.used >= 8:
            self.buffer = _scalar_threefry(self.key, self.tweak, self.counter,
                                           list(self.state))
            self.counter += 1
            self.used = 0
        r = self.buffer[self.used >> 1]
        self.used += 2
        return r

    def next_double(self):
        bits = self.next_long()
        exponent = 1022
        while bits == 0:
            bits = self.next_long()
            exponent -= 64
        e = (bits & -bits).bit_length() - 1
        exponent -= e
        sig = (bits if e < 12 else self.next_long()) >> 12
        if exponent < 0:
            return 0.0
        result = (exponent << 52) | sig
        return np.uint64(result).view(np.float64).item()


class TestEngineParity:
    def test_vectorized_matches_scalar_port(self):
        rng = np.random.default_rng(42)
        uids = rng.integers(0, 2**62, 300).astype(np.int64)
        for nonce, sid in [(0, 0), (0, 17), (123456789, 5), (2**63 - 1, 99)]:
            vec = rand_unif01(nonce, sid, [uids])
            for j in range(0, 300, 17):
                eng = _ScalarEngine(nonce, sid, [int(uids[j])])
                assert vec[j] == eng.next_double(), (nonce, sid, uids[j])

    def test_multiword_message(self):
        uids = np.arange(50, dtype=np.int64)
        salts = np.full(50, 7, dtype=np.int64)
        vec = rand_unif01(0, 3, [uids, salts])
        eng = _ScalarEngine(0, 3, [11, 7])
        assert vec[11] == eng.next_double()

    def test_pmac_block_boundaries(self):
        # message lengths spanning the 4-word block boundary + padding rules
        outs = set()
        for L in range(0, 9):
            msg = [np.asarray([i + 1], dtype=np.int64) for i in range(L)]
            h = pmac(5, 6, msg, n=1)
            outs.add(tuple(int(w) for w in h[0]))
        assert len(outs) == 9  # all distinct

    def test_padding_distinct_from_explicit_one(self):
        # [x] padded with 1 must differ from message [x, 1] (tweak differs)
        a = pmac(0, 0, [np.asarray([9], np.int64)], n=1)
        b = pmac(0, 0, [np.asarray([9], np.int64), np.asarray([1], np.int64)],
                 n=1)
        assert (a != b).any()


class TestRandStability:
    def test_distribution(self):
        u = rand_unif01(0, 1, [np.arange(200_000, dtype=np.int64)])
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.005
        assert abs(np.var(u) - 1 / 12) < 0.002

    def test_same_seed_partitioning_invariant(self):
        a = (hl.utils.range_table(100, 8)
             .annotate(x=hl.rand_unif(0, 1, seed=7)).x.collect())
        b = (hl.utils.range_table(100, 3)
             .annotate(x=hl.rand_unif(0, 1, seed=7)).x.collect())
        c = (hl.utils.range_table(100, 1)
             .annotate(x=hl.rand_unif(0, 1, seed=7)).x.collect())
        assert a == b == c

    def test_repartition_preserves_values(self):
        t = hl.utils.range_table(60, 5).annotate(x=hl.rand_norm(seed=3))
        before = t.x.collect()
        after = t.repartition(2).x.collect()
        assert before == after

    def test_checkpoint_roundtrip(self, tmp_path):
        t = hl.utils.range_table(40, 4).annotate(x=hl.rand_unif(seed=11))
        before = t.x.collect()
        t2 = t.checkpoint(str(tmp_path / 'rt.ht'))
        assert t2.x.collect() == before
        # rand over the read table uses (partIdx, rowIdx) TUPLE uids
        # (reference PartitionNativeReader makeUID) — deterministic for the
        # read partitioning; repartitioning re-keys the stream, as in the
        # reference (a new read context assigns new uids)
        r1 = t2.annotate(y=hl.rand_unif(seed=13)).y.collect()
        r1b = hl.read_table(str(tmp_path / 'rt.ht')).annotate(
            y=hl.rand_unif(seed=13)).y.collect()
        assert r1 == r1b

    def test_different_seeds_differ(self):
        t = hl.utils.range_table(50, 2)
        a = t.annotate(x=hl.rand_unif(seed=1)).x.collect()
        b = t.annotate(x=hl.rand_unif(seed=2)).x.collect()
        assert a != b

    def test_rand_functions_deterministic_with_seed(self):
        t = hl.utils.range_table(30, 3)
        for f in [lambda: hl.rand_bool(0.5, seed=4),
                  lambda: hl.rand_pois(3.0, seed=4),
                  lambda: hl.rand_int32(0, 10, seed=4),
                  lambda: hl.rand_beta(1.0, 2.0, seed=4),
                  lambda: hl.rand_gamma(2.0, 1.0, seed=4)]:
            a = t.annotate(x=f()).x.collect()
            b = t.annotate(x=f()).x.collect()
            assert a == b


def test_engine_rand_int32_reference_values():
    """Engine nextInt(n) parity pins (the reference's own test_randomness.py
    values for range_table(5).annotate(x=rand_int32(5)) and the 5x2 entries
    grid)."""
    import numpy as np
    from hail_tpu.ir.random import rand_int32_bounded
    got = rand_int32_bounded(0, 0, [np.arange(5, dtype=np.int64)], 5)
    assert list(got) == [4, 3, 2, 3, 3]
    r = np.repeat(np.arange(5, dtype=np.int64), 2)
    c = np.tile(np.arange(2, dtype=np.int64), 5)
    got2 = rand_int32_bounded(0, 0, [r, c], 5)
    assert list(got2) == [0, 3, 2, 4, 1, 4, 4, 2, 4, 4]


def test_engine_scalar_matches_vectorized():
    import numpy as np
    from hail_tpu.ir.random import (ScalarEngine, pmac_hash, rand_doubles,
                                    rand_int64_full)
    s, ft = pmac_hash(3, 9, [np.arange(4, dtype=np.int64)])
    vec_d = rand_doubles(s, ft)
    vec_l = rand_int64_full(3, 9, [np.arange(4, dtype=np.int64)])
    for i in range(4):
        e = ScalarEngine(s[i], ft)
        assert e.next_long() & ((1 << 64) - 1) == int(vec_l[i]) & ((1 << 64) - 1)
        e2 = ScalarEngine(s[i], ft)
        assert e2.next_double() == vec_d[i]


def test_rand_functions_deterministic_after_reset():
    import hail_tpu as hl
    hl.init(idempotent=True)
    hl.reset_global_randomness()
    t = hl.utils.range_table(5)
    a = t.annotate(x=hl.rand_int32(5)).x.collect()
    hl.reset_global_randomness()
    t = hl.utils.range_table(5)
    b = t.annotate(x=hl.rand_int32(5)).x.collect()
    assert a == b == [4, 3, 2, 3, 3]

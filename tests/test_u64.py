import numpy as np

from groot_tpu.ops import u64

rng = np.random.default_rng(0)


def rand_u64(n):
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def pairs(a):
    return u64.from_np(a)


def test_roundtrip():
    a = rand_u64(100)
    assert (u64.to_np(*pairs(a)) == a).all()


def test_xor_mul_min():
    a, b = rand_u64(256), rand_u64(256)
    pa, pb = pairs(a), pairs(b)
    with np.errstate(over="ignore"):
        assert (u64.to_np(*u64.xor(pa, pb)) == (a ^ b)).all()
        assert (u64.to_np(*u64.mul(pa, pb)) == (a * b)).all()
    assert (u64.to_np(*u64.minimum(pa, pb)) == np.minimum(a, b)).all()
    assert (np.asarray(u64.lt(pa, pb)) == (a < b)).all()
    assert (np.asarray(u64.eq(pa, pa)) == True).all()  # noqa: E712


def test_rol_ror_shr():
    a = rand_u64(300)
    r = rng.integers(0, 64, size=300).astype(np.uint32)
    pa = pairs(a)
    ru = r.astype(np.uint64)
    with np.errstate(over="ignore"):
        expect = np.where(ru == 0, a, (a << ru) | (a >> (np.uint64(64) - ru)))
    assert (u64.to_np(*u64.rol(pa, r)) == expect).all()
    with np.errstate(over="ignore"):
        expect_r = np.where(ru == 0, a, (a >> ru) | (a << (np.uint64(64) - ru)))
    assert (u64.to_np(*u64.ror(pa, r)) == expect_r).all()
    for s in (1, 27, 31, 32, 33, 63):
        assert (u64.to_np(*u64.shr(pa, s)) == (a >> np.uint64(s))).all()
        with np.errstate(over="ignore"):
            assert (u64.to_np(*u64.shl(pa, s)) == (a << np.uint64(s))).all()


def test_min_reduce():
    a = rand_u64(1024).reshape(32, 32)
    pa = pairs(a)
    got = u64.to_np(*u64.min_reduce(pa, axis=1))
    assert (got == a.min(axis=1)).all()
    got0 = u64.to_np(*u64.min_reduce(pa, axis=0))
    assert (got0 == a.min(axis=0)).all()

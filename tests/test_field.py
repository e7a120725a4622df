"""Field arithmetic: numpy-u64 oracle and JAX u32-limb ops vs python ints.

Mirrors the identities checked by the reference suite
(/root/reference/test/f3g.test.js) plus dense randomized differential tests.
"""
import numpy as np
import pytest

from pil2_stark_tpu.field import gl64, f3

P = gl64.P_INT
RNG = np.random.default_rng(0xC0FFEE)


def rand_u64(n):
    # include values near p and near 2^32 boundaries
    vals = RNG.integers(0, P, size=n, dtype=np.uint64)
    specials = np.array(
        [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P - 0xFFFFFFFF],
        dtype=np.uint64,
    )
    vals[: len(specials)] = specials
    return vals


class TestGL64:
    def test_add_sub_mul_vs_python(self):
        a = rand_u64(4096)
        b = rand_u64(4096)[::-1].copy()
        ai = a.astype(object)
        bi = b.astype(object)
        assert np.all(gl64.add(a, b).astype(object) == (ai + bi) % P)
        assert np.all(gl64.sub(a, b).astype(object) == (ai - bi) % P)
        assert np.all(gl64.mul(a, b).astype(object) == (ai * bi) % P)
        assert np.all(gl64.neg(a).astype(object) == (-ai) % P)

    def test_inv(self):
        a = rand_u64(64)
        a[a == 0] = 1
        inv = gl64.inv(a)
        assert np.all(gl64.mul(a, inv) == np.uint64(1))

    def test_batch_inverse(self):
        a = rand_u64(33)
        a[a == 0] = 5
        r = gl64.batch_inverse(a)
        assert np.all(gl64.mul(a, r) == np.uint64(1))

    def test_exp(self):
        a = rand_u64(16)
        for e in [0, 1, 2, 5, P - 2]:
            expect = np.array([pow(int(x), e, P) for x in a], dtype=np.uint64)
            assert np.all(gl64.exp(a, e) == expect)

    def test_root_chain(self):
        # w[32] = 7^(2^32) has order 2^32 (f3g.js:40); w[0] == 1
        assert gl64.w(0) == 1
        assert gl64.w(1) == P - 1  # order-2 root is -1
        for s in range(1, 33):
            assert pow(gl64.w(s), 2, P) == gl64.w(s - 1)
            assert (gl64.w(s) * gl64.w_inv(s)) % P == 1

    def test_powers(self):
        ps = gl64.powers(3, 100, start=7)
        expect = np.array([(7 * pow(3, i, P)) % P for i in range(100)], dtype=np.uint64)
        assert np.all(ps == expect)


class TestF3Scalar:
    def test_mul_inv_roundtrip(self):
        a = (123456789, 987654321, 31415926535 % P)
        assert f3.eq(f3.mul(a, f3.inv(a)), 1)

    def test_extension_identities(self):
        a = (5, 7, 11)
        b = (13, 17, 19)
        # distributivity
        lhs = f3.mul(a, f3.add(b, b))
        rhs = f3.add(f3.mul(a, b), f3.mul(a, b))
        assert f3.eq(lhs, rhs)
        # x * x * x == x + 1  where x = (0,1,0)
        x = (0, 1, 0)
        x3 = f3.mul(f3.mul(x, x), x)
        assert f3.eq(x3, (1, 1, 0))

    def test_mixed_dim(self):
        a = 17
        b = (1, 2, 3)
        assert f3.add(a, b) == (18, 2, 3)
        assert f3.sub(a, b) == (16, P - 2, P - 3)
        assert f3.mul(a, b) == (17, 34, 51)

    def test_batch_inverse(self):
        vals = [5, (1, 2, 3), 7, (9, 8, 7)]
        invs = f3.batch_inverse(vals)
        for v, iv in zip(vals, invs):
            assert f3.eq(f3.mul(v, iv), 1)


class TestJaxGL:
    @pytest.fixture(scope="class")
    def mods(self):
        from pil2_stark_tpu.field import jax_gl, jax_f3

        return jax_gl, jax_f3

    def test_roundtrip(self, mods):
        jax_gl, _ = mods
        a = rand_u64(1024)
        assert np.all(jax_gl.to_u64(jax_gl.from_u64(a)) == a)

    def test_ops_vs_oracle(self, mods):
        jax_gl, _ = mods
        a = rand_u64(4096)
        b = rand_u64(4096)[::-1].copy()
        ga, gb = jax_gl.from_u64(a), jax_gl.from_u64(b)
        assert np.all(jax_gl.to_u64(jax_gl.add(ga, gb)) == gl64.add(a, b))
        assert np.all(jax_gl.to_u64(jax_gl.sub(ga, gb)) == gl64.sub(a, b))
        assert np.all(jax_gl.to_u64(jax_gl.mul(ga, gb)) == gl64.mul(a, b))
        assert np.all(jax_gl.to_u64(jax_gl.neg(ga)) == gl64.neg(a))
        assert np.all(jax_gl.to_u64(jax_gl.pow7(ga)) == gl64.exp(a, 7))

    def test_exp_const(self, mods):
        jax_gl, _ = mods
        a = rand_u64(64)
        for e in [0, 1, 3, 1 << 20]:
            got = jax_gl.to_u64(jax_gl.exp_const(jax_gl.from_u64(a), e))
            assert np.all(got == gl64.exp(a, e))

    def test_f3_vs_scalar(self, mods):
        jax_gl, jax_f3 = mods
        n = 257
        a = rand_u64(3 * n).reshape(3, n)
        b = rand_u64(3 * n)[::-1].copy().reshape(3, n)
        ga = jax_gl.from_u64(a)
        gb = jax_gl.from_u64(b)
        got_mul = jax_gl.to_u64(jax_f3.mul(ga, gb))
        got_add = jax_gl.to_u64(jax_f3.add(ga, gb))
        got_sub = jax_gl.to_u64(jax_f3.sub(ga, gb))
        for i in range(0, n, 37):
            av = tuple(int(x) for x in a[:, i])
            bv = tuple(int(x) for x in b[:, i])
            assert tuple(int(x) for x in got_mul[:, i]) == f3.mul(av, bv)
            assert tuple(int(x) for x in got_add[:, i]) == f3.add(av, bv)
            assert tuple(int(x) for x in got_sub[:, i]) == f3.sub(av, bv)

    def test_f3_mixed_dims(self, mods):
        jax_gl, jax_f3 = mods
        n = 64
        a = rand_u64(n).reshape(1, n)
        b = rand_u64(3 * n).reshape(3, n)
        ga, gb = jax_gl.from_u64(a), jax_gl.from_u64(b)
        got = jax_gl.to_u64(jax_f3.add(ga, gb))
        for i in range(0, n, 13):
            expect = f3.add(int(a[0, i]), tuple(int(x) for x in b[:, i]))
            assert tuple(int(x) for x in got[:, i]) == expect
        got = jax_gl.to_u64(jax_f3.mul(ga, gb))
        for i in range(0, n, 13):
            expect = f3.mul(int(a[0, i]), tuple(int(x) for x in b[:, i]))
            assert tuple(int(x) for x in got[:, i]) == expect
        got = jax_gl.to_u64(jax_f3.sub(ga, gb))
        for i in range(0, n, 13):
            expect = f3.sub(int(a[0, i]), tuple(int(x) for x in b[:, i]))
            assert tuple(int(x) for x in got[:, i]) == expect

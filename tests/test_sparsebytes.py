"""ops/sparsebytes — sparse-byte roll transport: pack/unpack round-trip,
overflow detection, corrupt-stream rejection, bucket quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.ops import bitpack, sparsebytes as sb


def _random_roll(rng, shape, density):
    return (rng.random(shape) < density).astype(np.uint8)


@pytest.mark.parametrize("shape,density", [((2, 16, 3, 11), 0.05),
                                           ((1, 8, 1, 8), 0.5),
                                           ((3, 32, 5, 84), 0.01)])
def test_round_trip_random(shape, density):
    rng = np.random.default_rng(0)
    roll = _random_roll(rng, shape, density)
    pk = np.packbits(roll, axis=-1)
    cap = int((pk != 0).sum()) + 7
    buf, count = jax.jit(sb.sparse_pack,
                         static_argnums=1)(jnp.asarray(pk), cap)
    buf, count = np.asarray(buf), int(np.asarray(count))
    assert count == (pk != 0).sum()
    back = sb.sparse_unpack(buf, count, pk.shape)
    np.testing.assert_array_equal(back, pk)
    np.testing.assert_array_equal(
        bitpack.unpack_rolls(back, shape[-1]), roll)
    # pad tail is zero-filled (positions AND values)
    assert not buf[count:].any()


def test_positions_are_flat_c_order_and_values_match():
    pk = np.zeros((2, 3, 4), np.uint8)
    pk[0, 1, 2] = 7
    pk[1, 2, 3] = 200
    buf, count = sb.sparse_pack(jnp.asarray(pk), cap=8)
    buf, count = np.asarray(buf), int(np.asarray(count))
    assert count == 2
    pos = buf[:2, :4].copy().view("<u4").reshape(-1)
    np.testing.assert_array_equal(pos, [0 * 12 + 1 * 4 + 2,
                                        1 * 12 + 2 * 4 + 3])
    np.testing.assert_array_equal(buf[:2, 4], [7, 200])


def test_extremes():
    # all-zero: count 0, unpack gives zeros; all-255: count = size
    z = np.zeros((2, 4, 3), np.uint8)
    buf, count = sb.sparse_pack(jnp.asarray(z), cap=4)
    assert int(np.asarray(count)) == 0
    np.testing.assert_array_equal(
        sb.sparse_unpack(np.asarray(buf), 0, z.shape), z)
    f = np.full((2, 4, 3), 255, np.uint8)
    buf, count = sb.sparse_pack(jnp.asarray(f), cap=f.size)
    assert int(np.asarray(count)) == f.size
    np.testing.assert_array_equal(
        sb.sparse_unpack(np.asarray(buf), f.size, f.shape), f)


def test_overflow_is_detectable():
    f = np.full((4, 8), 3, np.uint8)
    buf, count = sb.sparse_pack(jnp.asarray(f), cap=5)
    assert int(np.asarray(count)) == 32 > 5    # exact even when truncated
    # the first cap records are still the first nonzero bytes in order
    buf = np.asarray(buf)
    pos = buf[:5, :4].copy().view("<u4").reshape(-1)
    np.testing.assert_array_equal(pos, np.arange(5))


def test_unpack_rejects_corrupt_streams():
    good = np.zeros((2, 5), np.uint8)
    good[0, 0] = 3          # position 3, value 0... set a value too
    good[0, 4] = 9
    sb.sparse_unpack(good, 1, (2, 2))
    with pytest.raises(ValueError, match="out of range"):
        sb.sparse_unpack(good, 1, (1, 2))      # position 3 >= size 2
    with pytest.raises(ValueError, match="can't hold"):
        sb.sparse_unpack(good, 3, (2, 2))      # count > buffer rows
    with pytest.raises(ValueError, match="can't hold"):
        sb.sparse_unpack(np.zeros((2, 4), np.uint8), 1, (2, 2))


def test_record_cap_and_chunks():
    # cap: 25% of packed bytes, rounded UP to whole fetch chunks
    assert sb.record_cap(4 * sb.FETCH_CHUNK) == sb.FETCH_CHUNK
    assert sb.record_cap(4 * (sb.FETCH_CHUNK + 1)) == 2 * sb.FETCH_CHUNK
    assert sb.record_cap(8) == sb.FETCH_CHUNK          # tiny rolls round up
    assert sb.record_cap(100, chunk=16) == 32          # 25 -> 2 chunks of 16
    # chunk count covers the valid records; >= 1 even when empty
    assert sb.n_chunks(0) == 1
    assert sb.n_chunks(1) == 1
    assert sb.n_chunks(sb.FETCH_CHUNK) == 1
    assert sb.n_chunks(sb.FETCH_CHUNK + 1) == 2
    assert sb.n_chunks(33, chunk=16) == 3

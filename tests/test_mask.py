"""Unit tests for the mask algebra (reference semantics: vampnet/mask.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu import mask as pmask
from vampnet_tpu.util import codebook_flatten, codebook_unflatten


KEY = jax.random.PRNGKey(0)


def _x(b=2, c=4, t=100):
    return jnp.zeros((b, c, t), dtype=jnp.int32)


def test_gamma_schedule():
    r = jnp.array([0.0, 0.5, 1.0])
    g = pmask._gamma(r)
    np.testing.assert_allclose(g, [1.0, np.cos(np.pi / 4), 1e-10], atol=1e-6)
    # inverse round-trips in the interior
    np.testing.assert_allclose(pmask._invgamma(pmask._gamma(0.3)), 0.3, atol=1e-5)


def test_full_empty_mask():
    x = _x()
    assert int(pmask.full_mask(x).sum()) == x.size
    assert int(pmask.empty_mask(x).sum()) == 0


def test_apply_mask():
    x = jnp.arange(24, dtype=jnp.int32).reshape(2, 3, 4)
    mask = jnp.zeros_like(x).at[:, :, 1].set(1)
    out, m = pmask.apply_mask(x, mask, mask_token=999)
    assert (out[:, :, 1] == 999).all()
    assert (out[:, :, 0] == x[:, :, 0]).all()
    assert (m == mask).all()


def test_linear_random_extremes():
    x = _x()
    m0 = pmask.linear_random(KEY, x, 0.0)
    m1 = pmask.linear_random(KEY, x, 1.0)
    assert int(m0.sum()) == 0
    assert int(m1.sum()) == x.size


def test_random_uses_gamma():
    x = _x(b=1, c=4, t=2000)
    m = pmask.random(KEY, x, 0.5)  # gamma(0.5) ~ 0.707
    frac = float(m.mean())
    assert abs(frac - np.cos(np.pi / 4)) < 0.05


def test_inpaint():
    x = _x(b=2, c=4, t=50)
    m = pmask.inpaint(x, 10, 5)
    assert (m[:, :, :10] == 0).all()
    assert (m[:, :, -5:] == 0).all()
    assert (m[:, :, 10:-5] == 1).all()
    # zero prefix/suffix keeps everything masked
    m = pmask.inpaint(x, 0, 0)
    assert int(m.sum()) == x.size
    # per-batch counts
    m = pmask.inpaint(x, jnp.array([3, 7]), jnp.array([0, 2]))
    assert (m[0, :, :3] == 0).all() and (m[0, :, 3] == 1).all()
    assert (m[1, :, :7] == 0).all() and (m[1, :, -2:] == 0).all()
    assert (m[0, :, -2:] == 1).all()


def _reference_periodic(t, period, width):
    """Direct transcription of reference vampnet/mask.py:101-125 loops."""
    mask = np.ones(t, dtype=np.int64)
    if period == 0:
        return mask
    for j in range(t):
        if j % period == 0:
            j_start = max(0, j - width // 2)
            j_end = min(t - 1, j + width // 2) + 1
            mask[j_start:j_end] = 0
    return mask


@pytest.mark.parametrize("period,width,t", [
    (7, 1, 100), (13, 3, 100), (5, 4, 37), (30, 5, 100), (7, 1, 862), (3, 2, 10),
])
def test_periodic_mask_matches_reference(period, width, t):
    x = _x(b=1, c=2, t=t)
    m = pmask.periodic_mask(x, period, width)
    ref = _reference_periodic(t, period, width)
    np.testing.assert_array_equal(np.asarray(m[0, 0]), ref)


def test_periodic_mask_zero_period():
    x = _x()
    assert int(pmask.periodic_mask(x, 0).sum()) == x.size


def test_periodic_random_roll_preserves_count():
    x = _x(b=1, c=1, t=100)
    m0 = pmask.periodic_mask(x, 7, 1)
    m1 = pmask.periodic_mask(x, 7, 1, random_roll=True, key=KEY)
    # roll is circular so the unmasked count only changes by edge effects
    assert abs(int(m0.sum()) - int(m1.sum())) <= 1


def test_codebook_unmask_and_mask():
    x = _x(b=1, c=6, t=10)
    m = pmask.full_mask(x)
    m = pmask.codebook_unmask(m, 2)
    assert (m[:, :2] == 0).all() and (m[:, 2:] == 1).all()
    m = pmask.empty_mask(x)
    m = pmask.codebook_mask(m, 3)
    assert (m[:, :3] == 0).all() and (m[:, 3:] == 1).all()
    # None passes through
    assert (pmask.codebook_unmask(pmask.full_mask(x), None) == 1).all()


def test_and_or():
    x = _x(b=1, c=1, t=4)
    a = jnp.array([[[1, 1, 0, 0]]])
    b = jnp.array([[[1, 0, 1, 0]]])
    np.testing.assert_array_equal(np.asarray(pmask.mask_and(a, b))[0, 0], [1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(pmask.mask_or(a, b))[0, 0], [1, 1, 1, 0])


def test_dropout():
    x = _x(b=1, c=2, t=100)
    m = pmask.empty_mask(x)
    m2 = pmask.dropout(KEY, m, 0.5)
    # sampled with replacement: at most 50 distinct timesteps become 1
    per_t = np.asarray(m2[0, 0])
    assert 0 < per_t.sum() <= 50
    # all codebooks agree per timestep
    np.testing.assert_array_equal(np.asarray(m2[0, 0]), np.asarray(m2[0, 1]))
    # p=0 is identity
    assert (pmask.dropout(KEY, m, 0.0) == m).all()


def test_onset_mask():
    z = _x(b=1, c=4, t=50)
    m = pmask.onset_mask([10, 49], z, width=2)
    assert (m[:, :, 8:12] == 0).all()
    assert (m[:, :, 47:50] == 0).all()
    assert (m[:, :, 0:8] == 1).all()


def test_codebook_flatten_roundtrip():
    x = jnp.arange(2 * 3 * 5, dtype=jnp.int32).reshape(2, 3, 5)
    flat = codebook_flatten(x)
    assert flat.shape == (2, 15)
    # t-major, c-minor interleave: first 3 entries are x[:, :, 0]
    np.testing.assert_array_equal(np.asarray(flat[0, :3]), np.asarray(x[0, :, 0]))
    back = codebook_unflatten(flat, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_time_stretch_mask():
    x = _x(b=1, c=2, t=20)
    m = pmask.time_stretch_mask(x, 4)
    ref = _reference_periodic(20, 4, 1)
    np.testing.assert_array_equal(np.asarray(m[0, 0]), ref)

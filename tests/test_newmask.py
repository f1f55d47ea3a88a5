"""Unit tests for training-time mask variants (reference vampnet/newmask.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from vampnet_tpu import newmask

KEY = jax.random.PRNGKey(7)


def _x(b=3, c=5, t=40):
    return jnp.zeros((b, c, t), dtype=jnp.int32)


def test_random_returns_ignore():
    m, ig = newmask.random(KEY, _x(), 0.5)
    assert m.shape == ig.shape == (3, 5, 40)
    assert ig.dtype == bool and not bool(ig.any())


def test_random_along_time():
    m = newmask.random_along_time(KEY, _x(), 0.5)
    assert m.shape == (3, 40)


def test_stemgen_random_structure():
    x = _x(b=4, c=5, t=30)
    m, ig = newmask.stemgen_random(KEY, x, 0.5)
    m, ig = np.asarray(m), np.asarray(ig)
    for i in range(4):
        # find the sampled level: the unique row that is neither all-0-ignored
        # below nor all-1-masked above
        levels = [c for c in range(5) if not ig[i, c].any()]
        assert len(levels) == 1
        c = levels[0]
        assert (m[i, :c] == 0).all() and ig[i, :c].all() or c == 0
        assert (m[i, c + 1:] == 1).all() and ig[i, c + 1:].all() or c == 4


def test_hugo_random_hierarchical():
    x = _x(b=2, c=6, t=50)
    m, ig = newmask.hugo_random(KEY, x, 0.4)
    m, ig = np.asarray(m), np.asarray(ig)
    # hierarchy: if codebook c is masked at (b,t), all codebooks above are too
    for c in range(5):
        assert ((m[:, c, :] == 1) <= (m[:, c + 1, :] == 1)).all()
    # ignore starts one level above the mask level
    assert (ig.astype(int) <= m).all()


def test_drop_ones():
    m = jnp.ones((2, 3, 100), dtype=jnp.int32)
    out = newmask.drop_ones(KEY, m, 0.5)
    frac = float(out.mean())
    assert 0.35 < frac < 0.65


def test_tria_mask():
    x = _x(b=4, c=3, t=100)
    m = np.asarray(newmask.tria_mask(KEY, x, 0.1, 0.4))
    for i in range(4):
        n_keep = int((m[i, 0] == 0).sum())
        assert 10 <= n_keep <= 40
        # prefix structure
        assert (m[i, :, :n_keep] == 0).all() and (m[i, :, n_keep:] == 1).all()

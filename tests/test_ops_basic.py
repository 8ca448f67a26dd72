"""Tests for positional encoding, compositing, and depth sampling."""
import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops import (cumsum_exclusive, positional_encoding,
                                  sample_depth, volume_rendering_relu)
from scenedreamer_tpu.ops.pe import pe_out_dim


def test_positional_encoding_matches_numpy(rng):
    x = rng.standard_normal((4, 7, 3)).astype(np.float32)
    deg = 4
    out = np.asarray(positional_encoding(jnp.asarray(x), deg, incl_orig=True))
    expected = np.concatenate(
        [f(x * np.pi * 2.0 ** i) for i in range(deg)
         for f in (np.sin, np.cos)] + [x], axis=-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
    assert out.shape[-1] == pe_out_dim(3, deg, True)


def test_cumsum_exclusive(rng):
    x = rng.standard_normal((3, 5)).astype(np.float32)
    out = np.asarray(cumsum_exclusive(jnp.asarray(x), axis=1))
    expected = np.concatenate(
        [np.zeros((3, 1), np.float32), np.cumsum(x, 1)[:, :-1]], axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_volume_rendering_weights(rng):
    sigma = rng.standard_normal((2, 9, 1)).astype(np.float32)
    dists = np.abs(rng.standard_normal((2, 9, 1))).astype(np.float32)
    w = np.asarray(volume_rendering_relu(jnp.asarray(sigma),
                                         jnp.asarray(dists), axis=-2))
    fe = np.maximum(sigma, 0) * dists
    accu = np.concatenate([np.zeros((2, 1, 1)), np.cumsum(fe, 1)[:, :-1]], 1)
    expected = (1 - np.exp(-fe)) * np.exp(-accu)
    np.testing.assert_allclose(w, expected, rtol=1e-3, atol=1e-5)
    # weights sum to at most 1 (transmittance)
    assert np.all(w.sum(1) <= 1.0 + 1e-5)


def _make_intervals(rng, r, m):
    """Random sorted non-overlapping intervals with a random valid count."""
    nvalid = rng.integers(0, m + 1, size=r)
    entry = np.zeros((r, m), np.float32)
    exit_ = np.zeros((r, m), np.float32)
    mask = np.zeros((r, m), bool)
    for i in range(r):
        t = 1.0
        for j in range(nvalid[i]):
            t += rng.uniform(0.1, 2.0)
            entry[i, j] = t
            t += rng.uniform(0.05, 1.5)
            exit_[i, j] = t
            mask[i, j] = True
    return np.stack([entry, exit_], -1), mask


def test_sample_depth_deterministic_within_intervals(rng):
    r, m, s = 16, 4, 9
    depth, mask = _make_intervals(rng, r, m)
    rand_depth, new_dists, idx = sample_depth(
        jax.random.PRNGKey(0), jnp.asarray(depth), jnp.asarray(mask),
        nsamples=s, deterministic=True, use_box_boundaries=False,
        sample_depth_clip=100.0)
    rand_depth = np.asarray(rand_depth)
    idx = np.asarray(idx)
    assert rand_depth.shape == (r, s - 1)
    for i in range(r):
        if not mask[i].any():
            np.testing.assert_allclose(rand_depth[i], 0.0, atol=1e-6)
            continue
        for k in range(s - 1):
            j = idx[i, k]
            assert mask[i, j]
            assert depth[i, j, 0] - 1e-4 <= rand_depth[i, k] \
                <= depth[i, j, 1] + 1e-4, (i, k, j)


def test_sample_depth_clip_limits_total(rng):
    r, m = 8, 4
    depth, mask = _make_intervals(rng, r, m)
    clip = 0.7
    rand_depth, new_dists, idx = sample_depth(
        jax.random.PRNGKey(1), jnp.asarray(depth), jnp.asarray(mask),
        nsamples=12, deterministic=False, use_box_boundaries=False,
        sample_depth_clip=clip)
    # accumulated in-solid distance of every sample must be below clip
    dists = np.where(mask, depth[..., 1] - depth[..., 0], 0)
    accu_excl = np.cumsum(dists, -1) - dists
    rd, ix = np.asarray(rand_depth), np.asarray(idx)
    for i in range(r):
        if not mask[i].any():
            continue
        insolid = accu_excl[i, ix[i]] + (rd[i] - depth[i, ix[i], 0])
        assert np.all(insolid <= clip + 1e-4)


def test_sample_depth_boundaries_mode(rng):
    r, m, s = 6, 4, 5
    depth, mask = _make_intervals(rng, r, m)
    rand_depth, new_dists, idx = sample_depth(
        jax.random.PRNGKey(2), jnp.asarray(depth), jnp.asarray(mask),
        nsamples=s, deterministic=False, use_box_boundaries=True,
        sample_depth_clip=100.0)
    # S = nsamples + m + 1 - 1
    assert rand_depth.shape == (r, s + m)
    assert np.all(np.asarray(new_dists) >= -1e-6)

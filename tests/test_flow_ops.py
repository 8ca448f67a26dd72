"""Flow ops (channelnorm / correlation / resample2d) vs numpy oracles
implementing the CUDA kernel contracts
(`third_party/correlation/src/correlation_cuda_kernel.cu:96-147`,
`third_party/resample2d/src/resample2d_kernel.cu:15-76`)."""
import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.flow import (channel_norm, correlation,
                                       resample2d)


def test_channel_norm():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 5, 7)).astype(np.float32)
    out = np.asarray(channel_norm(jnp.asarray(x)))
    np.testing.assert_allclose(out[..., 0],
                               np.linalg.norm(x, axis=-1), rtol=1e-6)
    out1 = np.asarray(channel_norm(jnp.asarray(x), norm_deg=1))
    np.testing.assert_allclose(out1[..., 0], np.abs(x).sum(-1),
                               rtol=1e-5)


def _corr_oracle(x1, x2, pad, ksize, maxd, s1, s2):
    n, h, w, c = x1.shape
    krad = (ksize - 1) // 2
    rad = maxd // s2
    disp = 2 * rad + 1
    border = krad + maxd
    ph, pw = h + 2 * pad, w + 2 * pad
    oh = int(np.ceil((ph - 2 * border) / s1))
    ow = int(np.ceil((pw - 2 * border) / s1))
    x1p = np.pad(x1, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    x2p = np.pad(x2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((n, oh, ow, disp * disp), np.float64)
    for b in range(n):
        for iy in range(oh):
            for ix in range(ow):
                y1, x1c = border + iy * s1, border + ix * s1
                for tj in range(-rad, rad + 1):
                    for ti in range(-rad, rad + 1):
                        acc = 0.0
                        for j in range(-krad, krad + 1):
                            for i in range(-krad, krad + 1):
                                acc += np.dot(
                                    x1p[b, y1 + j, x1c + i],
                                    x2p[b, y1 + tj * s2 + j,
                                        x1c + ti * s2 + i])
                        tc = (tj + rad) * disp + (ti + rad)
                        out[b, iy, ix, tc] = acc / (ksize * ksize * c)
    return out


def test_correlation_matches_oracle():
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(2, 8, 9, 3)).astype(np.float32)
    x2 = rng.normal(size=(2, 8, 9, 3)).astype(np.float32)
    for (pad, k, maxd, s1, s2) in ((4, 1, 4, 1, 1), (3, 3, 2, 1, 1),
                                   (4, 1, 4, 2, 2)):
        ours = np.asarray(correlation(jnp.asarray(x1), jnp.asarray(x2),
                                      pad_size=pad, kernel_size=k,
                                      max_displacement=maxd,
                                      stride1=s1, stride2=s2))
        ref = _corr_oracle(x1, x2, pad, k, maxd, s1, s2)
        assert ours.shape == ref.shape, (pad, k, maxd, s1, s2)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_correlation_self_peak_at_zero_displacement():
    """Correlating a map with itself peaks at the zero-displacement
    channel (center of the disp^2 block)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 10, 10, 4)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)   # unit vectors:
    # zero-displacement cosine 1 dominates by Cauchy-Schwarz
    out = np.asarray(correlation(jnp.asarray(x), jnp.asarray(x),
                                 pad_size=0, kernel_size=1,
                                 max_displacement=2))
    center = out[..., 12]          # disp=5, (0,0) -> 2*5+2
    assert (center >= out.max(axis=-1) - 1e-5).all()


def test_resample2d_zero_flow_identity_and_shift():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 6, 7, 2)).astype(np.float32)
    zero = np.zeros((1, 6, 7, 2), np.float32)
    out = np.asarray(resample2d(jnp.asarray(x), jnp.asarray(zero)))
    np.testing.assert_allclose(out, x, atol=1e-6)
    # integer shift by (+1, 0): output(x) = input(x+1)
    fl = zero.copy()
    fl[..., 0] = 1.0
    out = np.asarray(resample2d(jnp.asarray(x), jnp.asarray(fl)))
    np.testing.assert_allclose(out[:, :, :-1], x[:, :, 1:], atol=1e-6)


def test_resample2d_bilinear_and_grads():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 5, 5, 1)).astype(np.float32)
    fl = np.full((1, 5, 5, 2), 0.5, np.float32)
    out = np.asarray(resample2d(jnp.asarray(x), jnp.asarray(fl)))
    expect = 0.25 * (x[0, 1:, 1:, 0] + x[0, 1:, :-1, 0]
                     + x[0, :-1, 1:, 0] + x[0, :-1, :-1, 0])
    np.testing.assert_allclose(out[0, :-1, :-1, 0], expect, atol=1e-6)
    # differentiable through both image and flow (the reference ships
    # hand-written backward kernels; XLA autodiff covers both)
    gx, gf = jax.grad(lambda a, f: jnp.sum(
        resample2d(a, f) ** 2), argnums=(0, 1))(jnp.asarray(x),
                                                jnp.asarray(fl))
    assert np.abs(np.asarray(gx)).sum() > 0
    assert np.abs(np.asarray(gf)).sum() > 0
    # nearest mode
    out_n = np.asarray(resample2d(jnp.asarray(x), jnp.asarray(fl),
                                  bilinear=False))
    np.testing.assert_allclose(out_n[0, :-1, :-1], x[0, 1:, 1:],
                               atol=1e-6)

"""Flow-model ops: channel norm, cost-volume correlation, flow warping.

Capability parity with the reference's CUDA-only third_party extensions
(`imaginaire/third_party/{channelnorm,correlation,resample2d}`) — kept
for the full imaginaire layer surface even though no SceneDreamer model
uses them (SURVEY.md §2.6). Contracts match the CUDA kernels:

  * `channel_norm` — per-pixel L_p norm over channels
    (`channelnorm/channelnorm.py:9-29`, norm_deg=2 default).
  * `correlation` — FlowNet cost volume
    (`correlation/src/correlation_cuda_kernel.cu:96-147`,
    `correlation_cuda.cc:25-38`): zero-pad both inputs by pad_size,
    sample the first image on a stride1 grid starting at
    max_displacement, dot against the second image displaced by
    (tj, ti) * stride2 within max_displacement/stride2 steps, averaged
    over channels * kernel_size^2.
  * `resample2d` — bilinear (or nearest) warping of input1 by a 2-ch
    flow field, border-clamped
    (`resample2d/src/resample2d_kernel.cu:15-76`; flow layout (dx, dy)).

TPU-native: all three are pure jnp — XLA autodiff provides the
backward passes the reference hand-writes, and the correlation's
displacement loop is a compile-time unrolled stack of shifted
elementwise products + channel reductions (fusable; MXU-free by
design since the contraction is only over C).

NHWC layout (the reference is NCHW; converters transpose).
"""
import numpy as np
import jax
import jax.numpy as jnp


def channel_norm(x, norm_deg=2):
    """[..., C] -> [..., 1] L_p norm over the channel axis."""
    if norm_deg == 2:
        return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return jnp.power(jnp.sum(jnp.abs(x) ** norm_deg, axis=-1,
                             keepdims=True), 1.0 / norm_deg)


def correlation(x1, x2, pad_size=4, kernel_size=1, max_displacement=4,
                stride1=1, stride2=1):
    """Cost volume between two feature maps.

    Args:
        x1, x2: [N, H, W, C].
    Returns: [N, outH, outW, disp_size^2] with
        disp_size = 2 * (max_displacement // stride2) + 1, channel
        index c = (tj + rad) * disp_size + (ti + rad), matching the
        CUDA channel order (`correlation_cuda_kernel.cu:139-141`).
    """
    n, h, w, c = x1.shape
    p = pad_size
    krad = (kernel_size - 1) // 2
    rad = max_displacement // stride2
    disp = 2 * rad + 1
    border = krad + max_displacement
    ph, pw = h + 2 * p, w + 2 * p
    out_h = -(-(ph - 2 * border) // stride1)
    out_w = -(-(pw - 2 * border) // stride1)
    nelems = kernel_size * kernel_size * c

    x1p = jnp.pad(x1, ((0, 0), (p, p), (p, p), (0, 0)))
    x2p = jnp.pad(x2, ((0, 0), (p, p), (p, p), (0, 0)))

    # grid of x1 sample positions. The CUDA kernel starts at
    # max_displacement (`correlation_cuda_kernel.cu:109`), which reads
    # out of bounds whenever kernel_size > 1 (never exercised: FlowNet
    # uses kernel_size=1); we start at border = krad + max_displacement
    # — identical for kernel_size=1 and well-defined beyond it.
    ys = border + stride1 * np.arange(out_h)
    xs = border + stride1 * np.arange(out_w)

    outs = []
    for tj in range(-rad, rad + 1):
        for ti in range(-rad, rad + 1):
            dy, dx = tj * stride2, ti * stride2
            acc = 0.0
            for j in range(-krad, krad + 1):
                for i in range(-krad, krad + 1):
                    a = x1p[:, ys[0] + j:ys[0] + j + stride1
                            * (out_h - 1) + 1:stride1,
                            xs[0] + i:xs[0] + i + stride1
                            * (out_w - 1) + 1:stride1]
                    b = x2p[:, ys[0] + dy + j:ys[0] + dy + j + stride1
                            * (out_h - 1) + 1:stride1,
                            xs[0] + dx + i:xs[0] + dx + i + stride1
                            * (out_w - 1) + 1:stride1]
                    acc = acc + jnp.sum(a * b, axis=-1)
            outs.append(acc / nelems)
    return jnp.stack(outs, axis=-1)


def resample2d(x, flow, kernel_size=1, bilinear=True):
    """Warp x by a per-pixel flow.

    Args:
        x: [N, H, W, C].
        flow: [N, H, W, 2] as (dx, dy) pixel offsets (reference reads
            channel 0 as dx, 1 as dy, `resample2d_kernel.cu:42-43`).
    Returns: [N, H, W, C]; source coords border-clamped like the CUDA
        kernel (note the reference keeps the out-of-range bilinear
        weights, so fully-OOB samples scale toward the border value).
    """
    n, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing='ij')
    xf = gx[None] + flow[..., 0]
    yf = gy[None] + flow[..., 1]
    if not bilinear:
        xn = jnp.clip(jnp.floor(xf + 0.5).astype(jnp.int32), 0, w - 1)
        yn = jnp.clip(jnp.floor(yf + 0.5).astype(jnp.int32), 0, h - 1)
        return jax.vmap(lambda xi, yi, xxi: xxi[yi, xi])(xn, yn, x)
    alpha = xf - jnp.floor(xf)
    beta = yf - jnp.floor(yf)
    xl = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, w - 1)
    xr = jnp.clip(jnp.floor(xf).astype(jnp.int32) + 1, 0, w - 1)
    yt = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, h - 1)
    yb = jnp.clip(jnp.floor(yf).astype(jnp.int32) + 1, 0, h - 1)

    def gather(xi, yi, xx):
        return xx[yi, xi]                                    # [H, W, C]

    def one(xx, xl_, xr_, yt_, yb_, a_, b_):
        tl = gather(xl_, yt_, xx)
        tr = gather(xr_, yt_, xx)
        bl = gather(xl_, yb_, xx)
        br = gather(xr_, yb_, xx)
        a_ = a_[..., None]
        b_ = b_[..., None]
        return ((1 - a_) * (1 - b_) * tl + a_ * (1 - b_) * tr
                + (1 - a_) * b_ * bl + a_ * b_ * br)

    return jax.vmap(one)(x, xl, xr, yt, yb, alpha, beta)

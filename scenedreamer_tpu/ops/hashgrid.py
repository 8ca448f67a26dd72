"""Multiresolution hash-grid encoding (Instant-NGP style).

Contract parity with the reference CUDA gridencoder
(`gridencoder/src/gridencoder.cu` + `gridencoder/grid.py`):

  * per-level scale  = exp2(level * log2(per_level_scale)) * H - 1
    resolution       = ceil(scale) + 1                       (cu:126-127)
  * corner index     = tiled (row-major with stride capped at
    hashmap_size) or `fast_hash` xor-of-primes when the level
    overflows the table (cu:35-72)
  * table layout     = one [total, C] array with per-level offsets,
    min(2^log2_hashmap_size, (res[+1])^D) entries rounded up to 8
    (grid.py:113-123); init uniform(-1e-4, 1e-4) (grid.py:133-135)
  * inputs in [0, 1]; out-of-bound points produce zeros (cu:98-123)

TPU-native design: the forward is expressed as vectorized uint32 hashing +
XLA gathers + lerps. Both the table gradient (scatter-add; deterministic on
TPU, unlike the CUDA atomicAdd) and the input gradient (needed because the
last 2 input dims carry the trainable scene code) come from XLA autodiff —
no custom VJP needed. `jax.checkpoint` around the caller keeps the 2^D
gathered corner values out of the residual set when memory matters.
"""
import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

# 'scan' = sequential per-level loop (the measured-fastest mode that
# also bounds memory); 'vmap' = all levels vectorized together — OOMs
# at flagship scale on 16GB v5e (the [L, N, K, C] corner tensor
# tile-pads 16x) but useful on larger-HBM parts. Both exact.
FOLDED_LEVEL_MODE = os.environ.get('SCENEDREAMER_HASH_LEVEL_MODE', 'scan')

# Coarse levels whose corner grid has side <= this use the dense-splat
# backward (MXU matmul accumulation over the reachable cell space +
# trace-time-constant remap into hash slots) instead of sorting all
# N * 2^D update rows — the TPU analog of the reference CUDA kernel's
# tiled (non-hashed) index path (`gridencoder.cu:54-72`). 0 disables.
DENSE_BWD_MAX_SIDE = int(os.environ.get('SCENEDREAMER_HASH_DENSE_SIDE', '64'))
# Points per chunk in the splat matmul (bounds the [chunk, side^2]
# one-hot operand; 0 = single shot). Swept on v5e: 4096 is the measured
# knee (131072->1.130s, 8192->1.065s, 4096->1.035s, 2048->1.040s
# isolated encode fwd+bwd) — the 131072 default materialized a 944 MB
# one-hot in HBM and ran the splat at 1.6 TFLOP/s; at 4096 the 29 MB
# operand still exceeds the ~16 MB VMEM but XLA can pipeline it in
# slices instead of round-tripping the whole thing.
SPLAT_CHUNK = int(os.environ.get('SCENEDREAMER_SPLAT_CHUNK', '4096'))
# Payload dtype carried through the fine-level sort in the table
# gradient. bfloat16 halves the sorted bytes; the cumsum still
# accumulates in f32, and the reference's CUDA backward accumulates in
# fp16 outright (gridencoder.cu:268-282). 'float32' to disable.
SORT_PAYLOAD_DTYPE = jnp.bfloat16 if os.environ.get(
    'SCENEDREAMER_SORT_PAYLOAD', 'bfloat16') == 'bfloat16' \
    else jnp.float32

# Dtype the (baked) tables are gathered in. 'bfloat16' halves the
# random-gather bytes of the forward hot loop AND the saved corner
# residuals — the TPU analog of the reference's half-precision table
# mode (`gridencoder.cu` half2 path / AMP training). Master tables and
# gradients stay f32; only the gathered values round. Opt-in: the
# flagship train config runs AMP-disabled
# (`scenedreamer_train.yaml:11-12`), so f32 is the parity default.
GATHER_DTYPE = jnp.bfloat16 if os.environ.get(
    'SCENEDREAMER_TABLE_GATHER', 'float32') == 'bfloat16' else jnp.float32

# While 1 is not a good hash prime, it preserves memory coherence in dim 0
# (same rationale and constants as Instant-NGP / the reference, cu:42).
_PRIMES = np.array([1, 2654435761, 805459861, 3674653429, 2097192037,
                    1434869437, 2165219737], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    gridtype: str = 'hash'          # 'hash' | 'tiled'
    align_corners: bool = False
    # 'xor'    = the reference fast_hash (xor of per-dim prime
    #            products, cu:35-51) — required for converted reference
    #            checkpoints (table slots must match).
    # 'paired' = ADD combine (h = sum_d c_d * P_d mod 2^32, P_0 = 1):
    #            the two dim-0 corners of every interpolation cell land
    #            in ADJACENT slots, so the hot gather fetches 2^(D-1)
    #            two-row slices instead of 2^D rows (the fine-level
    #            gather is row-transaction bound, PERF.md), the scene
    #            fold becomes a cyclic shift, and the backward sort
    #            carries half the rows at double width. Training-from-
    #            scratch option; same collision character as the
    #            reference (its dim-0 prime is already 1/linear).
    hash_variant: str = 'xor'

    @staticmethod
    def create(input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
               log2_hashmap_size=19, desired_resolution=None,
               per_level_scale=2.0, gridtype='hash', align_corners=False,
               hash_variant='xor'):
        if desired_resolution is not None:
            per_level_scale = float(np.exp2(
                np.log2(desired_resolution / base_resolution)
                / (num_levels - 1)))
        return HashGridSpec(input_dim, num_levels, level_dim,
                            base_resolution, log2_hashmap_size,
                            float(per_level_scale), gridtype, align_corners,
                            hash_variant)

    @property
    def max_params(self):
        return 2 ** self.log2_hashmap_size

    @property
    def output_dim(self):
        return self.num_levels * self.level_dim

    def level_resolution(self, level):
        scale = np.exp2(level * np.log2(self.per_level_scale)) \
            * self.base_resolution - 1.0
        return int(np.ceil(scale)) + 1, float(scale)

    def offsets(self):
        """Per-level start offsets into the flat table (reference
        grid.py:113-123)."""
        offs, off = [], 0
        for lv in range(self.num_levels):
            res, _ = self.level_resolution(lv)
            side = res if self.align_corners else res + 1
            n = min(self.max_params, side ** self.input_dim)
            n = int(np.ceil(n / 8) * 8)
            offs.append(off)
            off += n
        offs.append(off)
        return np.array(offs, dtype=np.int64)

    @property
    def table_size(self):
        return int(self.offsets()[-1])


def init_hashgrid_table(key, spec, dtype=jnp.float32):
    return jax.random.uniform(key, (spec.table_size, spec.level_dim),
                              dtype=dtype, minval=-1e-4, maxval=1e-4)


def _corner_bits(d):
    idx = np.arange(2 ** d, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(d, dtype=np.uint32)[None, :]) & 1)


def _combine_hash(variant, corner, primes):
    """corner [..., D] uint32 -> uint32 hash (pre-mask).

    'xor' = the reference fast_hash (cu:35-51); 'paired' = ADD combine
    (see HashGridSpec.hash_variant): both wrap mod 2^32, both keep
    dim 0 linear (prime 1)."""
    d = corner.shape[-1]
    h = jnp.zeros(corner.shape[:-1], jnp.uint32)
    if variant == 'paired':
        for dd in range(d):
            h = h + corner[..., dd] * primes[dd]
        return h
    for dd in range(d):
        h = h ^ (corner[..., dd] * primes[dd])
    return h


# Segment-boundary strategy inside `segment_sum_sorted`. 'sentinel'
# (default) merges one zero-payload sentinel row per table slot into
# the payload sort; the inclusive cumsum AT the sentinel positions then
# gives every boundary prefix directly — no binary search. 'search'
# keeps the r1 searchsorted formulation (device-profiled at 83 ms/level
# = 58% of the fine-level backward; the sentinel path replaces it with
# one cheap 2-operand sort).
SEGSUM_MODE = os.environ.get('SCENEDREAMER_SEGSUM', 'sentinel')
# Pack pairs of 16-bit payload columns into u32 sort operands (sort
# cost scales with operand count; the packed values are bit-identical
# after the round trip). Applies only when the payload dtype is 16-bit.
SEGSUM_PACK = os.environ.get('SCENEDREAMER_SEGSUM_PACK', '1') == '1'


def segment_sum_sorted(upd, idx, num_segments):
    """Deterministic scatter-free segment sum: sort + cumsum + gather.

    XLA's scatter-add lowers to a serial per-update loop on TPU (~1 s
    for 14M updates); this formulation uses only sort / cumsum / gather,
    all of which are fast vector paths. It is also the deterministic
    replacement for the reference CUDA backward's atomicAdd
    (`gridencoder.cu:227-314`, nondeterministic accumulation order).

    Sentinel mode: one sentinel row per segment (key=r, payload=0) is
    appended BEHIND the data rows, so the stable sort places it after
    every data row of key r. The inclusive f32 cumsum at sentinel r's
    sorted position is then the prefix sum over all segments <= r, and
    adjacent differences give the per-segment sums. Locating the
    sentinels is a permutation inversion (one 2-operand sort) — far
    cheaper than the 22-step binary search over the sorted keys that
    `searchsorted` lowers to (a gather-bound while loop).

    upd: [M, C]; idx: [M] int32 in [0, num_segments). Returns [S, C].
    """
    m, ch = upd.shape
    s = num_segments
    if SEGSUM_MODE == 'sentinel':
        keys = jnp.concatenate(
            [idx, jnp.arange(s, dtype=idx.dtype)])
        orig = jnp.arange(m + s, dtype=jnp.int32)
        packed = (SEGSUM_PACK and upd.dtype.itemsize == 2
                  and ch % 2 == 0 and ch >= 2)
        if packed:
            # bitcast bf16 pairs -> u32 halves the sort operand count;
            # the sort only permutes rows, so the round trip is
            # bit-identical to sorting the bf16 columns directly
            rows = jnp.concatenate(
                [upd, jnp.zeros((s, ch), upd.dtype)], axis=0)
            u32 = jax.lax.bitcast_convert_type(
                rows.reshape(m + s, ch // 2, 2), jnp.uint32)
            cols = [u32[:, c] for c in range(ch // 2)]
        else:
            cols = [jnp.concatenate(
                [upd[:, c], jnp.zeros((s,), upd.dtype)])
                for c in range(ch)]
        ops = jax.lax.sort([keys, orig] + cols, num_keys=1)
        so = ops[1]
        su = jnp.stack(ops[2:], axis=-1)             # [m+s, ch or ch/2]
        if packed:
            su = jax.lax.bitcast_convert_type(
                su, upd.dtype).reshape(m + s, ch)
        c = jnp.cumsum(su.astype(jnp.float32), axis=0)      # inclusive
        # invert the sort permutation: rank[k] = sorted position of
        # input row k; rows m..m+s-1 are the sentinels in r order
        _, rank = jax.lax.sort(
            [so, jnp.arange(m + s, dtype=jnp.int32)], num_keys=1)
        pos = rank[m:]                                      # [s]
        csent = jnp.take(c, pos, axis=0)                    # prefix(<=r)
        prev = jnp.concatenate(
            [jnp.zeros((1, ch), c.dtype), csent[:-1]], axis=0)
        return (csent - prev).astype(upd.dtype)
    # 'search': sort + exclusive cumsum + searchsorted boundaries
    ops = jax.lax.sort([idx] + [upd[:, c] for c in range(ch)],
                       num_keys=1)
    si = ops[0]
    su = jnp.stack(ops[1:], axis=-1)
    c = jnp.cumsum(su.astype(jnp.float32), axis=0)
    c = jnp.concatenate(
        [jnp.zeros((1, ch), c.dtype), c], axis=0)
    r = jnp.arange(num_segments, dtype=si.dtype)
    # segment r spans [start_r, start_{r+1}) in the sorted order, so one
    # searchsorted gives both boundaries
    start = jnp.searchsorted(si, r, side='left')
    end = jnp.concatenate(
        [start[1:], jnp.full((1,), m, start.dtype)])
    return (jnp.take(c, end, axis=0)
            - jnp.take(c, start, axis=0)).astype(upd.dtype)


# Corner-interpolation reduction form. The r3 HLO dump showed XLA
# lowering `einsum('nk,nkc->nc')` in the level-scan body as 2^D
# separate fusions, each materializing a [2^D, N, C] intermediate —
# and the preference between forms FLIPS with context (all measured on
# v5e, Aug 19 r3):
#   * ISOLATED encode fwd+bwd: 'slices' (2^D static slice multiply-
#     adds, one streaming fusion) wins 0.652 s vs einsum's 0.713 s.
#   * ISOLATED encode fwd-only: einsum wins 0.655 s vs slices' 1.01 s.
#   * IN-CONTEXT full tile grad step (the metric that ships): einsum
#     wins 15445 rays/s vs slices' 12152 — the opposite of the
#     isolated fwd+bwd — so 'einsum' is the default everywhere.
# 'split' picks einsum in the primal / slices in the AD pair (the
# per-program winner of the ISOLATED runs; useful for encode-only
# workloads). The slice form adds ascending in k; einsum may associate
# differently, so the forms agree to f32 rounding (~1e-9 abs, tested),
# not bit-for-bit.
INTERP_MODE = os.environ.get('SCENEDREAMER_INTERP', 'einsum')


def _interp_sum(w, vals, grad_ctx):
    """out[n, c] = sum_k w[n, k] * vals[n, k, c]."""
    use_slices = (INTERP_MODE == 'slices'
                  or (INTERP_MODE == 'split' and grad_ctx))
    if not use_slices:
        return jnp.einsum('nk,nkc->nc', w.astype(vals.dtype), vals)
    wk = w.astype(vals.dtype)
    out = wk[:, 0, None] * vals[:, 0, :]
    for k in range(1, vals.shape[1]):
        out = out + wk[:, k, None] * vals[:, k, :]
    return out


def _interp_dw(g, vals):
    """dw[n, k] = sum_c g[n, c] * vals[n, k, c] (grad context only)."""
    if INTERP_MODE == 'einsum':
        return jnp.einsum('nc,nkc->nk', g, vals)
    gk = g.astype(vals.dtype)
    return jnp.stack([jnp.sum(gk * vals[:, k, :], axis=-1)
                      for k in range(vals.shape[1])], axis=-1)


def _corner_idx_w(variant, pgu, frac, primes, size):
    """Corner hash ids + trilinear weights WITHOUT the [N, 2^D, D]
    intermediates.

    The hash combine is separable per dimension (xor/add of per-dim
    prime products), so each dimension contributes one of two
    precomputed [N] arrays (base_d*P_d or (base_d+1)*P_d) per corner;
    likewise each weight is a product of per-dim taps. The r3 HLO dump
    showed the corner/weight build materializing [N, 2^D, D] tensors
    whose minor D axis lane-pads (8,128) up to 42x; this form only ever
    touches [N] columns and the final [N, 2^D] stacks. Bit-exact: same
    u32 ops, same ascending-dimension combine/multiply order as
    `_combine_hash` + `jnp.prod`.

    pgu: [N, D] uint32 floor cell; frac: [N, D] f32; size: table slots
    (int — bit-AND when a power of two, else modulo, matching the
    `% size` of the generic path).
    Returns idx [N, 2^D] int32 (reduced to [0, size)), w [N, 2^D] f32.
    """
    size = int(size)
    pow2 = size & (size - 1) == 0
    red = (lambda h: h & jnp.uint32(size - 1)) if pow2 else \
        (lambda h: h % jnp.uint32(size))
    d = pgu.shape[-1]
    a0 = [pgu[:, dd] * primes[dd] for dd in range(d)]
    a1 = [(pgu[:, dd] + jnp.uint32(1)) * primes[dd] for dd in range(d)]
    t1 = [frac[:, dd] for dd in range(d)]
    t0 = [1.0 - frac[:, dd] for dd in range(d)]
    op = (lambda x, y: x + y) if variant == 'paired' else \
        (lambda x, y: x ^ y)
    idx_cols, w_cols = [], []
    for k in range(2 ** d):
        h = a1[0] if (k & 1) else a0[0]
        wk = t1[0] if (k & 1) else t0[0]
        for dd in range(1, d):
            bit = (k >> dd) & 1
            h = op(h, a1[dd] if bit else a0[dd])
            wk = wk * (t1[dd] if bit else t0[dd])
        idx_cols.append(red(h).astype(jnp.int32))
        w_cols.append(wk)
    return (jnp.stack(idx_cols, axis=-1), jnp.stack(w_cols, axis=-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_interp_impl(rows, tl, idx, w):
    vals = jnp.take(tl.astype(GATHER_DTYPE), idx, axis=0)  # [N, K, C]
    return _interp_sum(w, vals, grad_ctx=False)


def _gather_interp_fwd(rows, tl, idx, w):
    vals = jnp.take(tl.astype(GATHER_DTYPE), idx, axis=0)
    out = _interp_sum(w, vals, grad_ctx=True)
    # the corner-index residual is saved FLAT: under the level lax.scan
    # the stacked [L, N, 2^D] s32 residual can get an XLA layout with
    # the 2^D axis minor, which tile-pads (8,128) 16x — 8.6 GB at
    # crop-256 training scale. A 1-D residual leaves no bad choice.
    return out, (vals, idx.reshape(-1), w)


def _gather_interp_bwd(rows, res, g):
    vals, idx_flat, w = res
    dw = _interp_dw(g, vals).astype(w.dtype)
    if INTERP_MODE == 'einsum':
        upd = (w[..., None] * g[:, None, :]).reshape(-1, vals.shape[-1])
    else:
        # same outer product, written as K static slice products so the
        # build streams in one fusion (k-major rows match reshape(-1))
        upd = jnp.concatenate(
            [(w[:, k, None] * g)[:, None, :] for k in range(w.shape[1])],
            axis=1).reshape(-1, vals.shape[-1])
    # table cotangent in the weights' (= master table's) dtype, NOT
    # g.dtype: under SCENEDREAMER_TABLE_GATHER=bfloat16 the cotangent
    # arrives bf16 but the master table and its gradient stay f32
    dtl = segment_sum_sorted(upd.astype(SORT_PAYLOAD_DTYPE),
                             idx_flat, rows).astype(w.dtype)
    return dtl, None, dw


_gather_interp_impl.defvjp(_gather_interp_fwd, _gather_interp_bwd)


def gather_interp(tl, idx, w):
    """out[n] = sum_k w[n,k] * tl[idx[n,k]] — the hash-grid inner op.

    Custom VJP: the table gradient uses `segment_sum_sorted` instead of
    XLA scatter-add (the fwd+bwd hot path of the whole renderer), and
    the gathered corner rows are saved as residuals so the backward
    performs NO gathers at all (residual memory is N * K * C floats per
    level — cheap next to re-gathering).
    """
    return _gather_interp_impl(tl.shape[0], tl, idx, w)


def _paired_vals(tl, base):
    """Fetch row pairs (base, base+1 mod S) as [N, K, 2, C] via ONE
    slice-size-2 gather from the cyclically-extended table (row S is a
    copy of row 0, so base = S-1 wraps without a select)."""
    s, c = tl.shape
    ext = jnp.concatenate([tl, tl[:1]], axis=0).astype(GATHER_DTYPE)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    vals = jax.lax.gather(
        ext, base.reshape(-1, 1), dn, slice_sizes=(2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return vals.reshape(base.shape[0], base.shape[1], 2, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _paired_gather_interp_impl(rows, tl, base, w):
    vals = _paired_vals(tl, base)
    return jnp.einsum('nkj,nkjc->nc', w.astype(vals.dtype), vals)


def _paired_gather_interp_fwd(rows, tl, base, w):
    vals = _paired_vals(tl, base)
    out = jnp.einsum('nkj,nkjc->nc', w.astype(vals.dtype), vals)
    # residuals saved with LONG minor axes: under the level scan a
    # stacked residual whose minor axis is 2 would tile-pad 64x if XLA
    # picks it minor (the CLAUDE.md flat-residual rule)
    n = base.shape[0]
    return out, (vals.reshape(n, -1), base.reshape(-1),
                 w.reshape(n, -1))


def _paired_gather_interp_bwd(rows, res, g):
    vals_flat, base_flat, w_flat = res
    n = vals_flat.shape[0]
    k = w_flat.shape[1] // 2
    c = vals_flat.shape[1] // (2 * k)
    vals = vals_flat.reshape(n, k, 2, c)
    w = w_flat.reshape(n, k, 2)
    dw = jnp.einsum('nc,nkjc->nkj', g, vals).astype(w.dtype)
    # per-pair payload: [w0*g | w1*g] (2C wide) keyed by the pair BASE —
    # half the sorted rows of the per-corner form at double width
    upd = (w[..., None] * g[:, None, None, :]) \
        .reshape(-1, 2 * c)                              # [N*K, 2C]
    pair = segment_sum_sorted(upd.astype(SORT_PAYLOAD_DTYPE),
                              base_flat, rows).astype(jnp.float32)
    # slot r takes the even half of pairs based at r and the odd half
    # of pairs based at r-1; roll(+1) realizes the cyclic wrap
    dtl = pair[:, :c] + jnp.roll(pair[:, c:], 1, axis=0)
    return dtl.astype(w.dtype), None, dw


_paired_gather_interp_impl.defvjp(_paired_gather_interp_fwd,
                                  _paired_gather_interp_bwd)


def paired_gather_interp(tl, base, w):
    """out[n] = sum_k sum_j w[n,k,j] * tl[(base[n,k]+j) mod S] — the
    paired-variant inner op: K two-row slices per point instead of 2K
    row gathers; table gradient via a half-row-count segment sum."""
    return _paired_gather_interp_impl(tl.shape[0], tl, base, w)


def _paired_corner_fetch(tl, mask, pgu, frac, primes):
    """2^D-corner interpolation under the paired ADD-combine hash: one
    base per dim-1.. corner combo; the two dim-0 corners ride each
    two-row slice (requires primes[0] == 1)."""
    d = pgu.shape[-1]
    bits_r = jnp.asarray(_corner_bits(d - 1), jnp.uint32)
    rest = pgu[:, None, 1:] + bits_r[None]        # [N, 2^(D-1), D-1]
    h = pgu[:, None, 0] + _combine_hash('paired', rest, primes[1:])
    base = (h & mask).astype(jnp.int32)           # [N, 2^(D-1)]
    wr = jnp.where(bits_r[None].astype(bool), frac[:, None, 1:],
                   1.0 - frac[:, None, 1:])
    wr = jnp.prod(wr, axis=-1)                    # [N, 2^(D-1)]
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)
    w = wr[..., None] * wx[:, None, :]            # [N, K, 2]
    return paired_gather_interp(tl, base, w)


def _level_encode(spec, table_level, x, level):
    """Encode one level. x: [N, D] in [0,1]. Returns [N, C]."""
    d = spec.input_dim
    res, scale = spec.level_resolution(level)
    hashmap_size = table_level.shape[0]

    pos = x * scale + (0.0 if spec.align_corners else 0.5)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.uint32)

    bits = _corner_bits(d)                                   # [2^D, D]
    bits_j = jnp.asarray(bits, jnp.uint32)
    corner = pos_grid[..., None, :] + bits_j                 # [N, 2^D, D]

    # interpolation weights
    w = jnp.where(bits_j[None].astype(bool), frac[..., None, :],
                  1.0 - frac[..., None, :])
    w = jnp.prod(w, axis=-1)                                 # [N, 2^D]

    # tiled (row-major) index, with the stride cap of the reference
    side = np.uint64(res if spec.align_corners else res + 1)
    stride = np.uint64(1)
    idx = jnp.zeros(corner.shape[:-1], jnp.uint32)
    overflow = False
    for dd in range(d):
        if stride > np.uint64(hashmap_size):
            overflow = True
            break
        idx = idx + corner[..., dd] * jnp.uint32(stride)
        stride *= side
    if stride > np.uint64(hashmap_size):
        overflow = True
    if spec.gridtype == 'hash' and overflow:
        idx = _combine_hash(spec.hash_variant, corner,
                            jnp.asarray(_PRIMES[:d], jnp.uint32))
    idx = (idx % jnp.uint32(hashmap_size)).astype(jnp.int32)

    return gather_interp(table_level, idx, w)


def _all_levels_hashed_uniform(spec):
    """True when every level overflows into hash mode and has the same
    capped table size (the flagship D=5 config) — enables the scan path."""
    offs = spec.offsets()
    sizes = set(int(offs[i + 1] - offs[i])
                for i in range(spec.num_levels))
    if len(sizes) != 1 or spec.gridtype != 'hash':
        return False
    for lv in range(spec.num_levels):
        res, _ = spec.level_resolution(lv)
        side = res if spec.align_corners else res + 1
        if side ** spec.input_dim <= spec.max_params:
            return False
    return True


def _encode_flat_scan(spec, table, x01):
    """All-hash uniform-size levels as ONE lax.scan: a single compiled
    level body instead of num_levels unrolled subgraphs (compiles in
    seconds where the unrolled graph takes tens of minutes AOT), with
    the gathered corners transient in fwd AND bwd via remat."""
    d = spec.input_dim
    lvls = spec.num_levels
    size = spec.table_size // lvls
    table3 = table.reshape(lvls, size, spec.level_dim)
    scales = jnp.asarray([spec.level_resolution(lv)[1]
                          for lv in range(lvls)], jnp.float32)
    primes = jnp.asarray(_PRIMES[:d], jnp.uint32)
    offset = 0.0 if spec.align_corners else 0.5

    def body(carry, inp):
        tl, scale = inp
        pos = x01 * scale + offset
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        idx, w = _corner_idx_w(spec.hash_variant,
                               pos_grid.astype(jnp.uint32), frac,
                               primes, size)
        out_l = gather_interp(tl, idx, w)
        return carry, out_l

    _, outs = jax.lax.scan(body, None, (table3, scales))      # [L, N, C]
    return outs.transpose(1, 0, 2).reshape(x01.shape[0],
                                           spec.output_dim)


def _encode_flat(spec, table, x01):
    """[N, D] in [0,1] -> [N, L*C]."""
    if _all_levels_hashed_uniform(spec):
        return _encode_flat_scan(spec, table, x01)
    offs = spec.offsets()
    outs = []
    for lv in range(spec.num_levels):
        tl = jax.lax.slice_in_dim(table, int(offs[lv]), int(offs[lv + 1]),
                                  axis=0)
        # remat: the gathered [N, 2^D, C] corner values would otherwise
        # be saved as backward residuals — at D=5, L=16 that is tens of
        # GB of HBM (4x tile-padded). Recomputing the gathers in the
        # backward pass keeps them transient.
        enc = jax.checkpoint(
            lambda tl_, x_, lv_=lv: _level_encode(spec, tl_, x_, lv_))
        outs.append(enc(tl, x01))
    return jnp.concatenate(outs, axis=-1)


# xor permutation strategy inside `_xor_bake`. 'blocked' (default)
# exploits the butterfly structure of j ^ m: the high mask bits permute
# whole 128-row blocks (one cheap block-granular take at HBM bandwidth)
# and the low bits apply the SAME 128-element permutation inside every
# block — expressed as one [128, 128] one-hot matmul on the MXU, which
# is bit-exact (each output row receives exactly one 1.0-weighted term
# at HIGHEST precision). Measured on v5e: 10.6 ms -> 1.14 ms per bake
# of a [2^19, 8] f32 table x 4 masks (the gather form pays the random-
# row transaction floor on all S rows). 'gather' keeps the plain form.
XOR_BAKE_MODE = os.environ.get('SCENEDREAMER_XOR_BAKE', 'blocked')
_XOR_BLOCK = 128


def _xor_take(x, m):
    """out[j] = x[j ^ m] for a [S, C] table, S a power of two and m a
    traced uint32 scalar in [0, S)."""
    s, c = x.shape
    blo = min(_XOR_BLOCK, s)
    if XOR_BAKE_MODE != 'blocked' or s & (s - 1) or s % blo:
        j = jnp.arange(s, dtype=jnp.uint32)
        return jnp.take(x, (j ^ m).astype(jnp.int32), axis=0)
    shi = s // blo
    x3 = x.reshape(shi, blo, c)
    m = m.astype(jnp.uint32)
    hi = (m // jnp.uint32(blo)).astype(jnp.int32)
    lo = m & jnp.uint32(blo - 1)
    xh = jnp.take(x3, jnp.arange(shi, dtype=jnp.int32) ^ hi, axis=0)
    i = jnp.arange(blo, dtype=jnp.uint32)
    perm1h = ((i[:, None] ^ lo) == i[None, :]).astype(x.dtype)
    out = jnp.einsum('ij,bjc->bic', perm1h, xh,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(s, c)


def _shift_take(x, m):
    """out[j] = x[(j + m) mod S] — a cyclic shift (contiguous block
    copies at HBM bandwidth; no butterfly needed)."""
    return jnp.roll(x, -m.astype(jnp.int32), axis=0)


def _inv_shift_take(x, m):
    """out[k] = x[(k - m) mod S] — the inverse of `_shift_take`."""
    return jnp.roll(x, m.astype(jnp.int32), axis=0)


def _make_bake(take, inv_take):
    """Scene-fold bake: baked[j] = sum_a w[a] * take(tl, m_a)[j], with a
    custom VJP built from the permutation's inverse (the cotangent is
    d_tl[k] = sum_a w[a] * g[inv(k, m_a)] — gathers/moves only, never a
    scatter; d_w[a] reuses the permuted g)."""

    @jax.custom_vjp
    def bake(tl, masks, w):
        out = jnp.zeros_like(tl)
        for a in range(masks.shape[0]):
            out = out + w[a] * take(tl, masks[a])
        return out

    def fwd(tl, masks, w):
        return bake(tl, masks, w), (tl, masks, w)

    def bwd(res, g):
        tl, masks, w = res
        d_tl = jnp.zeros_like(tl)
        d_w = []
        for a in range(masks.shape[0]):
            ga = inv_take(g, masks[a])
            d_tl = d_tl + w[a] * ga
            d_w.append(jnp.sum(tl * ga))
        return d_tl, None, jnp.stack(d_w).astype(w.dtype)

    bake.defvjp(fwd, bwd)
    return bake


# baked[j] = sum_a w[a] * tl[j ^ masks[a]] — the xor-variant scene fold
# (xor is its own inverse; `_xor_take` does the butterfly decomposition)
_xor_bake = _make_bake(_xor_take, _xor_take)

# baked[j] = sum_a w[a] * tl[(j + shifts[a]) mod S] — the paired-variant
# scene fold: with the ADD-combine hash the scene-corner contributions
# are additive offsets, so the bake is a blend of cyclic shifts (cheap,
# and it preserves the row adjacency the paired gather relies on)
_shift_bake = _make_bake(_shift_take, _inv_shift_take)


@functools.lru_cache(maxsize=32)
def _dense_remap_consts(size, side_max, sides, primes, variant='xor'):
    """Trace-time constants mapping the dense corner-cell space of each
    coarse level into hash-table slots.

    The hash id of every reachable cell (x, y, z) < side is a compile-time
    constant, so the sort that `segment_sum_sorted` performs at runtime can
    be done ONCE here in numpy: `perm` gathers the dense grad rows into
    hash-sorted order and `start`/`end` delimit each table slot's run.
    Cells in the [side, side_max) padding (and any unreachable cells) are
    parked in a sentinel segment past the table.

    Returns (perm [L, side_max^3], start [L, size], end [L, size]) int32.
    """
    sm = side_max
    j = np.arange(sm ** 3, dtype=np.int64)
    x = j // (sm * sm)
    y = (j // sm) % sm
    z = j % sm
    perms, starts, ends = [], [], []
    for side in sides:
        if variant == 'paired':
            h = (x.astype(np.uint32) * np.uint32(primes[0])
                 + y.astype(np.uint32) * np.uint32(primes[1])
                 + z.astype(np.uint32) * np.uint32(primes[2]))
        else:
            h = ((x.astype(np.uint32) * np.uint32(primes[0]))
                 ^ (y.astype(np.uint32) * np.uint32(primes[1]))
                 ^ (z.astype(np.uint32) * np.uint32(primes[2])))
        h = (h & np.uint32(size - 1)).astype(np.int64)
        valid = (x < side) & (y < side) & (z < side)
        h = np.where(valid, h, size)              # sentinel: drop row
        perm = np.argsort(h, kind='stable')
        hs = h[perm]
        starts.append(np.searchsorted(hs, np.arange(size), 'left'))
        ends.append(np.searchsorted(hs, np.arange(size), 'right'))
        perms.append(perm)
    return (np.asarray(perms, np.int32), np.asarray(starts, np.int32),
            np.asarray(ends, np.int32))


_SPLAT_DTYPE = jnp.bfloat16 if os.environ.get(
    'SCENEDREAMER_SPLAT_DTYPE', 'bfloat16') == 'bfloat16' else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_interp(static, tl, pos_grid, frac, perm, start, end):
    return _splat_gather(static, tl, pos_grid, frac, grad_ctx=False)


def _splat_gather(static, tl, pos_grid, frac, grad_ctx):
    """Forward: identical math to `gather_interp` (hash + 2^3 corner
    gathers, or the paired two-row slices); only the VJP differs.
    `grad_ctx` picks the interp-sum form per program (see INTERP_MODE)."""
    size, _, variant = static
    d = pos_grid.shape[-1]
    primes = jnp.asarray(_PRIMES[:d], jnp.uint32)
    if variant == 'paired':
        return _paired_corner_fetch(tl, jnp.uint32(size - 1),
                                    pos_grid.astype(jnp.uint32), frac,
                                    primes)
    idx, w = _corner_idx_w(variant, pos_grid.astype(jnp.uint32), frac,
                           primes, size)
    vals = jnp.take(tl.astype(GATHER_DTYPE), idx, axis=0)
    return _interp_sum(w, vals, grad_ctx=grad_ctx)


def _splat_fwd(static, tl, pos_grid, frac, perm, start, end):
    out = _splat_gather(static, tl, pos_grid, frac, grad_ctx=True)
    return out, (tl, pos_grid, frac, perm, start, end)


def _splat_bwd(static, res, g):
    """Dense-splat table gradient.

    d_dense[x, y, z, c] = sum_n Xs[n,x] * Ys[n,y] * Zs[n,z] * g[n,c]
    where each splat vector has the two trilinear taps (1-f) at i and f
    at i+1 — all 2^3 corner contributions of all points in TWO MXU
    matmuls over the [side^3] reachable-cell space instead of a
    [N*2^3]-row sort. bf16 operands / f32 accumulation (the reference
    CUDA backward accumulates in fp16 via half2 atomicAdd,
    `gridencoder.cu:268-282`, so this is strictly tighter). The dense
    grid is then remapped into hash slots with trace-time constants
    (`_dense_remap_consts`) — no runtime sort at all.

    The frac cotangent IS computed (re-gather + per-dim exclusion
    products) so jax.grad w.r.t. the input coords matches the sort
    path bit-for-bit in structure — production training stop-gradients
    ray depths, but the op is public and must not silently drop input
    gradients on coarse levels only.
    """
    size, sm, variant = static
    tl, pos_grid, frac, perm, start, end = res
    n, c = g.shape
    sd = _SPLAT_DTYPE
    iota = jnp.arange(sm, dtype=pos_grid.dtype)

    def dense_chunk(pg, fr, gg):
        def splat(i, f):
            base = (iota[None, :] == i[:, None]).astype(sd) * \
                (1.0 - f)[:, None].astype(sd)
            hi = (iota[None, :] == i[:, None] + 1).astype(sd) * \
                f[:, None].astype(sd)
            return base + hi                                 # [n, sm]

        m = pg.shape[0]
        xs = splat(pg[:, 0], fr[:, 0])
        ys = splat(pg[:, 1], fr[:, 1])
        zs = splat(pg[:, 2], fr[:, 2])
        wxy = (xs[:, :, None] * ys[:, None, :]).reshape(m, sm * sm)
        gzc = (zs[:, :, None] * gg.astype(sd)[:, None, :]) \
            .reshape(m, sm * c)
        return jax.lax.dot_general(
            wxy, gzc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [sm^2, sm*C]

    chunk = SPLAT_CHUNK
    if chunk and n > chunk:
        pad = (-n) % chunk
        pgp = jnp.pad(pos_grid, ((0, pad), (0, 0)),
                      constant_values=-2)   # never matches iota/iota+1
        frp = jnp.pad(frac, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
        k = pgp.shape[0] // chunk

        def body(acc, inp):
            pg, fr, gg = inp
            return acc + dense_chunk(pg, fr, gg), None

        dense, _ = jax.lax.scan(
            body, jnp.zeros((sm * sm, sm * c), jnp.float32),
            (pgp.reshape(k, chunk, -1), frp.reshape(k, chunk, -1),
             gp.reshape(k, chunk, -1)))
    else:
        dense = dense_chunk(pos_grid, frac, g)
    dense = dense.reshape(sm ** 3, c)
    sorted_rows = jnp.take(dense, perm, axis=0)
    cum = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32), jnp.cumsum(sorted_rows, axis=0)],
        axis=0)
    d_tl = (jnp.take(cum, end, axis=0) - jnp.take(cum, start, axis=0))

    # input (frac) cotangent: re-gather the corner values and form the
    # per-dimension exclusion products — same math the sort path gets
    # from autodiff through w = prod(t)
    d = pos_grid.shape[-1]
    bits = jnp.asarray(_corner_bits(d), jnp.int32)
    primes = jnp.asarray(_PRIMES[:d], jnp.uint32)
    corner = pos_grid[:, None, :] + bits[None]
    h = _combine_hash(variant, corner.astype(jnp.uint32), primes)
    idx = (h & jnp.uint32(size - 1)).astype(jnp.int32)
    vals = jnp.take(tl, idx, axis=0)                      # [N, K, C]
    gv = _interp_dw(g, vals)                              # [N, K]
    bit_on = bits[None].astype(bool)                      # [1, K, D]
    t = jnp.where(bit_on, frac[:, None, :],
                  1.0 - frac[:, None, :])                 # [N, K, D]
    sign = jnp.where(bit_on, 1.0, -1.0).astype(g.dtype)
    dfrac_cols = []
    for dd in range(d):
        excl = jnp.prod(
            jnp.concatenate([t[..., :dd], t[..., dd + 1:]], axis=-1),
            axis=-1)                                      # [N, K]
        dfrac_cols.append(
            jnp.sum(gv * sign[..., dd] * excl, axis=-1))
    dfrac = jnp.stack(dfrac_cols, axis=-1).astype(frac.dtype)
    return (d_tl.astype(g.dtype), None, dfrac, None, None, None)


_splat_interp.defvjp(_splat_fwd, _splat_bwd)


def foldable(spec, scene_dim=2):
    """The scene-folded fast path applies when every level is in hash
    (overflow) mode with the same power-of-2 capped size — the flagship
    D=5 config. Then `% size` == `& (size-1)` distributes over xor."""
    if not _all_levels_hashed_uniform(spec):
        return False
    size = spec.table_size // spec.num_levels
    return size & (size - 1) == 0 and spec.input_dim > scene_dim


def hashgrid_encode_folded(spec, table, xyz, scene, bound=1.0):
    """Exact hash-grid encode for points sharing trailing 'scene'
    coordinates (the SceneDreamer world code, `scenedreamer.py:299-303`).

    Per level the 2^Ds scene-corner contributions are folded into ONE
    pre-baked table via xor permutations (cheap, O(S) structured
    gathers), so each point needs only 2^Dp corner lookups instead of
    2^D — a 4x gather/scatter reduction for Ds=2. Produces bit-equal
    results to `hashgrid_encode` on the concatenated input (tested).

    Args:
        xyz: [N, Dp] spatial coords in [-bound, bound].
        scene: [Ds] shared trailing coords in [-bound, bound].
    Returns: [N, L*C].
    """
    dp = xyz.shape[-1]
    ds = scene.shape[-1]
    assert dp + ds == spec.input_dim
    assert foldable(spec, ds), 'spec not foldable'
    lvls = spec.num_levels
    size = spec.table_size // lvls
    mask = jnp.uint32(size - 1)
    table3 = table.reshape(lvls, size, spec.level_dim)
    scales = jnp.asarray([spec.level_resolution(lv)[1]
                          for lv in range(lvls)], jnp.float32)
    bits_s = jnp.asarray(_corner_bits(ds), jnp.uint32)      # [2^Ds, Ds]
    primes_p = jnp.asarray(_PRIMES[:dp], jnp.uint32)
    primes_s = jnp.asarray(_PRIMES[dp:dp + ds], jnp.uint32)
    offset = 0.0 if spec.align_corners else 0.5

    x01 = (xyz + bound) / (2.0 * bound)
    s01 = (scene + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1, keepdims=True) \
        | jnp.any((s01 < 0.0) | (s01 > 1.0))

    variant = spec.hash_variant
    paired = variant == 'paired'

    def bake(tl, scale):
        """Scene corners -> fold masks + blend weights -> baked table.
        'xor': xor-permutation blend; 'paired': cyclic-shift blend
        (both exact; the shift keeps row adjacency for the paired
        gather)."""
        spos = s01 * scale + offset
        sgrid = jnp.floor(spos)
        sfrac = spos - sgrid
        scorner = sgrid.astype(jnp.uint32)[None, :] + bits_s  # [2^Ds,Ds]
        ws = jnp.where(bits_s.astype(bool), sfrac[None, :],
                       1.0 - sfrac[None, :])
        ws = jnp.prod(ws, axis=-1)                            # [2^Ds]
        masks = _combine_hash(variant, scorner, primes_s) & mask
        if paired:
            return _shift_bake(tl, masks, ws)
        return _xor_bake(tl, masks, ws)

    def body(carry, inp):
        tl, scale = inp
        baked = bake(tl, scale)
        # spatial corners on the baked table
        pos = x01 * scale + offset
        pg = jnp.floor(pos)
        frac = pos - pg
        if paired:
            out_l = _paired_corner_fetch(baked, mask,
                                         pg.astype(jnp.uint32), frac,
                                         primes_p)
            return carry, out_l
        idx, w = _corner_idx_w(variant, pg.astype(jnp.uint32), frac,
                               primes_p, size)
        out_l = gather_interp(baked, idx, w)
        return carry, out_l

    # coarse prefix: levels whose corner grid fits a dense side (sides
    # increase monotonically with level) use the dense-splat backward
    sides = [spec.level_resolution(lv)[0] + (0 if spec.align_corners
                                             else 1)
             for lv in range(lvls)]
    nd = 0
    if dp == 3 and DENSE_BWD_MAX_SIDE > 0 and FOLDED_LEVEL_MODE == 'scan':
        while nd < lvls and sides[nd] <= DENSE_BWD_MAX_SIDE:
            nd += 1

    # ONE scan group padded to the largest dense side: splitting into
    # size-matched groups was measured compile-3x-slower for no runtime
    # win (the small-side splat matmuls are cheap even padded)
    groups = [(0, nd)] if nd else []

    def make_body(sm):
        def body_dense(carry, inp):
            tl, scale, perm, start, end = inp
            baked = bake(tl, scale)
            pos = x01 * scale + offset
            pg = jnp.floor(pos)
            frac = pos - pg
            out_l = _splat_interp((size, sm, variant), baked,
                                  pg.astype(jnp.int32), frac, perm,
                                  start, end)
            return carry, out_l
        return body_dense

    dense_outs = []
    for lo, hi in groups:
        sm = sides[hi - 1]
        perm, start, end = _dense_remap_consts(
            size, sm, tuple(sides[lo:hi]),
            tuple(int(p) for p in _PRIMES[:dp]), variant)
        bdy = make_body(sm)
        if hi - lo == 1:
            _, o = bdy(None, (table3[lo], scales[lo],
                              jnp.asarray(perm[0]), jnp.asarray(start[0]),
                              jnp.asarray(end[0])))
            dense_outs.append(o[None])
        else:
            _, o = jax.lax.scan(
                bdy, None,
                (table3[lo:hi], scales[lo:hi], jnp.asarray(perm),
                 jnp.asarray(start), jnp.asarray(end)))
            dense_outs.append(o)                              # [g, N, C]

    if nd == lvls:
        outs = jnp.concatenate(dense_outs, axis=0)
    elif FOLDED_LEVEL_MODE == 'vmap':
        outs = jax.vmap(lambda tl, s: body(None, (tl, s))[1])(
            table3, scales)                                   # [L, N, C]
    else:
        _, outs = jax.lax.scan(body, None,
                               (table3[nd:], scales[nd:]))
        if nd > 0:
            outs = jnp.concatenate(dense_outs + [outs], axis=0)
    out = outs.transpose(1, 0, 2).reshape(xyz.shape[0],
                                          spec.output_dim)
    return jnp.where(oob, 0.0, out)


def hashgrid_encode(spec, table, x, bound=1.0, chunk=None):
    """Encode points.

    Args:
        spec: HashGridSpec.
        table: [table_size, level_dim] parameter array.
        x: [..., input_dim] coordinates in [-bound, bound].
        chunk: points per sequential chunk (None = single shot). The
            per-point corner index/weight intermediates are O(2^D * D)
            and 4x tile-padded on TPU; chunking with `lax.map` bounds
            peak HBM to O(chunk) regardless of ray count (the tile loop
            equivalent the CUDA kernel gets from its grid).

    Returns:
        [..., num_levels * level_dim] features; zero for out-of-bound points.
    """
    prefix = x.shape[:-1]
    x = x.reshape(-1, spec.input_dim)
    n = x.shape[0]
    x01 = (x + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1, keepdims=True)

    if chunk is None or n <= chunk:
        out = _encode_flat(spec, table, x01)
    else:
        pad = (-n) % chunk
        xp = jnp.pad(x01, ((0, pad), (0, 0)))
        xc = xp.reshape(-1, chunk, spec.input_dim)
        out = jax.lax.map(lambda xi: _encode_flat(spec, table, xi), xc)
        out = out.reshape(-1, spec.output_dim)[:n]
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, spec.output_dim)

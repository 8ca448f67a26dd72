"""Hash-grid encoder tests: oracle comparison, gradients, determinism."""
import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                           init_hashgrid_table)

PRIMES = np.array([1, 2654435761, 805459861, 3674653429, 2097192037],
                  dtype=np.uint64)


def oracle_encode(spec, table, x01):
    """Trusted-slow numpy implementation of the instant-ngp contract."""
    n = x01.shape[0]
    d = spec.input_dim
    offs = spec.offsets()
    out = np.zeros((n, spec.num_levels, spec.level_dim), np.float64)
    for lv in range(spec.num_levels):
        res, scale = spec.level_resolution(lv)
        hsize = int(offs[lv + 1] - offs[lv])
        tl = table[offs[lv]:offs[lv + 1]]
        for i in range(n):
            if np.any(x01[i] < 0) or np.any(x01[i] > 1):
                continue
            pos = x01[i] * scale + (0.0 if spec.align_corners else 0.5)
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            acc = np.zeros(spec.level_dim)
            for corner in range(2 ** d):
                w = 1.0
                pc = pg.copy()
                for dd in range(d):
                    if (corner >> dd) & 1:
                        w *= frac[dd]
                        pc[dd] += 1
                    else:
                        w *= 1 - frac[dd]
                stride = np.uint64(1)
                side = np.uint64(res if spec.align_corners else res + 1)
                idx = np.uint64(0)
                for dd in range(d):
                    if stride > np.uint64(hsize):
                        break
                    idx += pc[dd] * stride
                    stride *= side
                if spec.gridtype == 'hash' and stride > np.uint64(hsize):
                    h = np.uint64(0)
                    for dd in range(d):
                        p = np.uint64(
                            (pc[dd] * PRIMES[dd]) & np.uint64(0xFFFFFFFF))
                        if spec.hash_variant == 'paired':
                            h = (h + p) & np.uint64(0xFFFFFFFF)
                        else:
                            h ^= p
                    idx = h & np.uint64(0xFFFFFFFF)
                acc += w * tl[int(idx % np.uint64(hsize))]
            out[i, lv] = acc
    return out.reshape(n, -1)


def test_hashgrid_matches_oracle_3d(rng):
    spec = HashGridSpec.create(input_dim=3, num_levels=4, level_dim=2,
                               base_resolution=4, log2_hashmap_size=7,
                               desired_resolution=32)
    table = np.asarray(init_hashgrid_table(jax.random.PRNGKey(0), spec))
    x = rng.random((32, 3)).astype(np.float32) * 2 - 1
    out = np.asarray(hashgrid_encode(spec, jnp.asarray(table),
                                     jnp.asarray(x)))
    expected = oracle_encode(spec, table, (x + 1) / 2)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_hashgrid_matches_oracle_5d(rng):
    # SceneDreamer config shape: D=5, every level hashed
    spec = HashGridSpec.create(input_dim=5, num_levels=3, level_dim=4,
                               base_resolution=16, log2_hashmap_size=10,
                               desired_resolution=64)
    table = np.asarray(init_hashgrid_table(jax.random.PRNGKey(1), spec))
    x = rng.random((16, 5)).astype(np.float32) * 2 - 1
    out = np.asarray(hashgrid_encode(spec, jnp.asarray(table),
                                     jnp.asarray(x)))
    expected = oracle_encode(spec, table, (x + 1) / 2)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_hashgrid_tiled_small_levels(rng):
    # base level of a 2D tiled grid fits -> row-major indexing path
    spec = HashGridSpec.create(input_dim=2, num_levels=3, level_dim=2,
                               base_resolution=4, log2_hashmap_size=19,
                               desired_resolution=16, gridtype='tiled')
    table = np.asarray(init_hashgrid_table(jax.random.PRNGKey(2), spec))
    x = rng.random((24, 2)).astype(np.float32) * 2 - 1
    out = np.asarray(hashgrid_encode(spec, jnp.asarray(table),
                                     jnp.asarray(x)))
    expected = oracle_encode(spec, table, (x + 1) / 2)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_hashgrid_oob_zeroed():
    spec = HashGridSpec.create(input_dim=3, num_levels=2, level_dim=2,
                               base_resolution=4, log2_hashmap_size=6,
                               desired_resolution=8)
    table = init_hashgrid_table(jax.random.PRNGKey(0), spec) + 1.0
    x = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    out = np.asarray(hashgrid_encode(spec, table, x))
    np.testing.assert_allclose(out[0], 0.0)
    assert np.abs(out[1]).sum() > 0


def test_hashgrid_gradients_flow_to_table_and_inputs(rng):
    spec = HashGridSpec.create(input_dim=5, num_levels=2, level_dim=2,
                               base_resolution=4, log2_hashmap_size=8,
                               desired_resolution=16)
    table = init_hashgrid_table(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((8, 5)).astype(np.float32) * 1.6 - 0.8)

    def loss(tbl, xx):
        return jnp.sum(hashgrid_encode(spec, tbl, xx) ** 2)

    gt, gx = jax.grad(loss, argnums=(0, 1))(table, x)
    assert np.abs(np.asarray(gt)).sum() > 0
    assert np.abs(np.asarray(gx)).sum() > 0
    assert gt.shape == table.shape and gx.shape == x.shape

    # numerical check of input grad along one coordinate
    eps = 1e-3
    x_p = x.at[0, 4].add(eps)
    x_m = x.at[0, 4].add(-eps)
    num = (loss(table, x_p) - loss(table, x_m)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(gx)[0, 4], float(num),
                               rtol=0.05, atol=1e-4)


def test_chunked_matches_unchunked():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.ops.hashgrid import (HashGridSpec,
                                               hashgrid_encode,
                                               init_hashgrid_table)
    spec = HashGridSpec.create(input_dim=3, num_levels=4, level_dim=2,
                               log2_hashmap_size=8, desired_resolution=64)
    table = init_hashgrid_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1000, 3),
                           minval=-1, maxval=1)
    a = hashgrid_encode(spec, table, x, chunk=None)
    b = hashgrid_encode(spec, table, x, chunk=256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ga = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(spec, t, x, chunk=None) ** 2))(table)
    gb = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(spec, t, x, chunk=256) ** 2))(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=1e-5)


def test_scan_path_matches_unrolled():
    """The uniform-levels lax.scan fast path must equal the unrolled
    per-level path (flagship D=5 uses the scan path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.ops import hashgrid as hg
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=4, level_dim=2,
                                  log2_hashmap_size=10,
                                  desired_resolution=256)
    assert hg._all_levels_hashed_uniform(spec)
    table = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 5),
                           minval=0.01, maxval=0.99)
    a = hg._encode_flat_scan(spec, table, x)
    # force the unrolled path
    outs = []
    offs = spec.offsets()
    for lv in range(spec.num_levels):
        tl = jax.lax.slice_in_dim(table, int(offs[lv]),
                                  int(offs[lv + 1]), axis=0)
        outs.append(hg._level_encode(spec, tl, x, lv))
    b = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ga = jax.grad(lambda t: jnp.sum(
        hg._encode_flat_scan(spec, t, x) ** 2))(table)
    assert np.isfinite(np.asarray(ga)).all()
    assert float(jnp.abs(ga).sum()) > 0


def test_dense_splat_backward_matches_sort_backward(monkeypatch):
    """Coarse-level dense-splat table grads == sort-based segment-sum
    grads (the two backward formulations of the folded path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.ops import hashgrid as hg
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=4, level_dim=2,
                                  log2_hashmap_size=10,
                                  desired_resolution=256)
    table = hg.init_hashgrid_table(jax.random.PRNGKey(3), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (500, 3),
                             minval=-0.9, maxval=0.9)
    scene = jnp.asarray([-0.2, 0.55])

    def grads(t, s):
        return jax.grad(lambda tt, ss: jnp.sum(jnp.sin(
            hg.hashgrid_encode_folded(spec, tt, xyz, ss) * 30.0)),
            argnums=(0, 1))(t, s)

    monkeypatch.setattr(hg, 'DENSE_BWD_MAX_SIDE', 0)
    gt_sort, gs_sort = jax.jit(grads)(table, scene)
    monkeypatch.setattr(hg, 'DENSE_BWD_MAX_SIDE', 64)
    gt_dense, gs_dense = jax.jit(grads)(table, scene)
    assert np.abs(np.asarray(gt_dense)).sum() > 0
    # bf16 splat operands: tolerate ~0.5% relative (the reference CUDA
    # backward accumulates in fp16, gridencoder.cu:268-282)
    np.testing.assert_allclose(np.asarray(gt_dense), np.asarray(gt_sort),
                               rtol=0, atol=2e-2 * float(
                                   np.abs(np.asarray(gt_sort)).max()))
    np.testing.assert_allclose(np.asarray(gs_dense), np.asarray(gs_sort),
                               rtol=1e-2, atol=1e-5)


def test_dense_splat_input_gradient_matches_sort(monkeypatch):
    """jax.grad w.r.t. the spatial coords must NOT depend on whether
    coarse levels use the dense-splat or the sort backward — the splat
    custom_vjp computes the frac cotangent via exclusion products."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.ops import hashgrid as hg
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=4, level_dim=2,
                                  log2_hashmap_size=10,
                                  desired_resolution=256)
    table = hg.init_hashgrid_table(jax.random.PRNGKey(3), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(7), (200, 3),
                             minval=-0.9, maxval=0.9)
    scene = jnp.asarray([-0.2, 0.55])

    def gx(x):
        return jax.grad(lambda xx: jnp.sum(jnp.sin(
            hg.hashgrid_encode_folded(spec, table, xx, scene) * 30.0)))(x)

    monkeypatch.setattr(hg, 'DENSE_BWD_MAX_SIDE', 0)
    g_sort = jax.jit(gx)(xyz)
    monkeypatch.setattr(hg, 'DENSE_BWD_MAX_SIDE', 64)
    g_dense = jax.jit(gx)(xyz)
    assert np.abs(np.asarray(g_sort)).sum() > 0
    np.testing.assert_allclose(
        np.asarray(g_dense), np.asarray(g_sort),
        rtol=0, atol=2e-2 * float(np.abs(np.asarray(g_sort)).max()))


def test_folded_scene_encode_matches_standard():
    """Scene-folded fast path == standard 5D encode (same table)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.ops import hashgrid as hg
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=4, level_dim=2,
                                  log2_hashmap_size=10,
                                  desired_resolution=256)
    assert hg.foldable(spec, 2)
    table = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (400, 3),
                             minval=-0.95, maxval=0.95)
    scene = jnp.asarray([0.3, -0.4])
    x5 = jnp.concatenate(
        [xyz, jnp.broadcast_to(scene, (400, 2))], axis=-1)
    a = hg.hashgrid_encode(spec, table, x5)
    b = hg.hashgrid_encode_folded(spec, table, xyz, scene)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # gradients agree too (table + scene code)
    ga = jax.grad(lambda t, s: jnp.sum(hg.hashgrid_encode(
        spec, t, jnp.concatenate(
            [xyz, jnp.broadcast_to(s, (400, 2))], -1)) ** 2),
        argnums=(0, 1))(table, scene)
    gb = jax.grad(lambda t, s: jnp.sum(hg.hashgrid_encode_folded(
        spec, t, xyz, s) ** 2), argnums=(0, 1))(table, scene)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-3, atol=1e-4)


def test_segment_sum_sorted_modes_match_scatter(rng, monkeypatch):
    """Both boundary strategies (sentinel merge / searchsorted) equal a
    trusted np.add.at scatter, including empty segments, a single hot
    segment, and fewer updates than segments."""
    from scenedreamer_tpu.ops import hashgrid as hg
    cases = [(2000, 64, 8), (37, 512, 3), (100, 16, 2)]
    for m, s, ch in cases:
        idx = rng.integers(0, s, m).astype(np.int32)
        upd = rng.normal(size=(m, ch)).astype(np.float32)
        ref = np.zeros((s, ch), np.float32)
        np.add.at(ref, idx, upd)
        for mode in ('sentinel', 'search'):
            monkeypatch.setattr(hg, 'SEGSUM_MODE', mode)
            out = np.asarray(hg.segment_sum_sorted(
                jnp.asarray(upd), jnp.asarray(idx), s))
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4,
                                       err_msg=f'{mode} {m}x{s}x{ch}')
    # all updates into one segment
    idx = np.full(500, 3, np.int32)
    upd = np.ones((500, 2), np.float32)
    for mode in ('sentinel', 'search'):
        monkeypatch.setattr(hg, 'SEGSUM_MODE', mode)
        out = np.asarray(hg.segment_sum_sorted(
            jnp.asarray(upd), jnp.asarray(idx), 8))
        assert out[3, 0] == 500.0 and float(np.abs(out).sum()) == 1000.0


def test_xor_take_blocked_bit_exact(rng, monkeypatch):
    """The blocked xor permutation (block take + one-hot MXU matmul) is
    bit-exact vs the plain gather form, including masks that touch only
    low bits, only high bits, and non-power-of-2 table fallback."""
    from scenedreamer_tpu.ops import hashgrid as hg
    monkeypatch.setattr(hg, 'XOR_BAKE_MODE', 'blocked')
    for s, c in ((1 << 13, 8), (256, 4), (64, 3)):
        x = jnp.asarray(rng.normal(size=(s, c)).astype(np.float32))
        for m in (0, 1, 7, s // 2, s - 1, 0b1010101 % s):
            ref = jnp.take(x, (jnp.arange(s, dtype=jnp.uint32)
                               ^ jnp.uint32(m)).astype(jnp.int32), axis=0)
            got = hg._xor_take(x, jnp.uint32(m))
            assert bool(jnp.all(ref == got)), (s, c, m)
    # non-power-of-2 size falls back to the gather form
    x = jnp.asarray(rng.normal(size=(48, 2)).astype(np.float32))
    got = hg._xor_take(x, jnp.uint32(0))
    assert bool(jnp.all(got == x))


def test_xor_bake_blocked_matches_gather_fwd_bwd(rng, monkeypatch):
    """_xor_bake fwd and grads agree between 'blocked' and 'gather'."""
    from scenedreamer_tpu.ops import hashgrid as hg
    s, c = 1 << 12, 8
    tl = jnp.asarray(rng.normal(size=(s, c)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, s, 4), jnp.uint32)
    w = jnp.asarray(rng.normal(size=4).astype(np.float32))

    def loss(t, ww):
        return jnp.sum(jnp.tanh(hg._xor_bake(t, masks, ww)))

    outs = {}
    for mode in ('gather', 'blocked'):
        monkeypatch.setattr(hg, 'XOR_BAKE_MODE', mode)
        out = hg._xor_bake(tl, masks, w)
        gt, gw = jax.grad(loss, argnums=(0, 1))(tl, w)
        outs[mode] = (np.asarray(out), np.asarray(gt), np.asarray(gw))
    for a, b in zip(outs['gather'], outs['blocked']):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_segment_sum_packed_bitexact_vs_unpacked(rng, monkeypatch):
    """u32-packed bf16 sort payloads produce bit-identical segment sums
    to the unpacked bf16 path, including odd channel counts (no pack)."""
    from scenedreamer_tpu.ops import hashgrid as hg
    for m, s, ch in ((5000, 128, 8), (700, 64, 2), (301, 32, 3)):
        idx = jnp.asarray(rng.integers(0, s, m), jnp.int32)
        upd = jnp.asarray(
            rng.normal(size=(m, ch)).astype(np.float32)).astype(
                jnp.bfloat16)
        outs = {}
        for pack in (False, True):
            monkeypatch.setattr(hg, 'SEGSUM_PACK', pack)
            outs[pack] = np.asarray(
                hg.segment_sum_sorted(upd, idx, s).astype(jnp.float32))
        np.testing.assert_array_equal(outs[False], outs[True],
                                      err_msg=f'{m}x{s}x{ch}')


def test_paired_variant_matches_oracle_5d(rng):
    """hash_variant='paired' (ADD-combine, adjacency-pairing hash) on
    the standard encode path vs the numpy oracle."""
    spec = HashGridSpec.create(input_dim=5, num_levels=3, level_dim=4,
                               base_resolution=16, log2_hashmap_size=10,
                               desired_resolution=64,
                               hash_variant='paired')
    table = np.asarray(init_hashgrid_table(jax.random.PRNGKey(1), spec))
    x = rng.random((16, 5)).astype(np.float32) * 2 - 1
    out = np.asarray(hashgrid_encode(spec, jnp.asarray(table),
                                     jnp.asarray(x)))
    expected = oracle_encode(spec, table, (x + 1) / 2)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_paired_folded_matches_standard():
    """The paired fast path (slice-2 gathers + shift bake + half-row
    segment-sum backward) == the standard encode under the SAME paired
    hash, values AND gradients."""
    from scenedreamer_tpu.ops import hashgrid as hg
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=4, level_dim=2,
                                  log2_hashmap_size=10,
                                  desired_resolution=256,
                                  hash_variant='paired')
    assert hg.foldable(spec, 2)
    table = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (400, 3),
                             minval=-0.95, maxval=0.95)
    scene = jnp.asarray([0.3, -0.4])
    x5 = jnp.concatenate(
        [xyz, jnp.broadcast_to(scene, (400, 2))], axis=-1)
    a = hg.hashgrid_encode(spec, table, x5)
    b = hg.hashgrid_encode_folded(spec, table, xyz, scene)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ga = jax.grad(lambda t, s: jnp.sum(hg.hashgrid_encode(
        spec, t, jnp.concatenate(
            [xyz, jnp.broadcast_to(s, (400, 2))], -1)) ** 2),
        argnums=(0, 1))(table, scene)
    gb = jax.grad(lambda t, s: jnp.sum(hg.hashgrid_encode_folded(
        spec, t, xyz, s) ** 2), argnums=(0, 1))(table, scene)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-3, atol=1e-4)


def test_paired_gather_interp_grads(rng, monkeypatch):
    """paired_gather_interp == the plain take formulation of the same
    op (values + table/weight grads incl. the base = S-1 wrap). f32
    sort payload: this checks the op's LOGIC at O(1) magnitudes (the
    default bf16 payload's rounding is exercised by the production-
    scale tests where table values are O(1e-4))."""
    from scenedreamer_tpu.ops import hashgrid as hg
    monkeypatch.setattr(hg, 'SORT_PAYLOAD_DTYPE', jnp.float32)
    s, c, n, k = 64, 4, 200, 4
    tl = jnp.asarray(rng.normal(size=(s, c)).astype(np.float32))
    base = rng.integers(0, s, size=(n, k)).astype(np.int32)
    base[0, 0] = s - 1        # exercise the cyclic wrap
    base = jnp.asarray(base)
    w = jnp.asarray(rng.normal(size=(n, k, 2)).astype(np.float32))

    def ref(tl_, w_):
        v0 = jnp.take(tl_, base, axis=0)                 # [N,K,C]
        v1 = jnp.take(tl_, (base + 1) % s, axis=0)
        return jnp.sum(w_[..., 0, None] * v0 + w_[..., 1, None] * v1,
                       axis=1)

    out = hg.paired_gather_interp(tl, base, w)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(tl, w)), atol=1e-5)

    f = lambda tl_, w_: jnp.sum(
        hg.paired_gather_interp(tl_, base, w_) ** 2)
    fr = lambda tl_, w_: jnp.sum(ref(tl_, w_) ** 2)
    g = jax.grad(f, argnums=(0, 1))(tl, w)
    gr = jax.grad(fr, argnums=(0, 1))(tl, w)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gr[1]),
                               rtol=1e-3, atol=1e-3)


def test_shift_bake_matches_direct(rng):
    """_shift_bake fwd/bwd == the direct roll formulation."""
    from scenedreamer_tpu.ops import hashgrid as hg
    s, c = 32, 3
    tl = jnp.asarray(rng.normal(size=(s, c)).astype(np.float32))
    shifts = jnp.asarray(np.array([0, 5, 31, 17], np.uint32))
    w = jnp.asarray(np.array([0.1, 0.4, 0.3, 0.2], np.float32))

    def ref(tl_, w_):
        return sum(w_[a] * jnp.roll(tl_, -int(shifts[a]), axis=0)
                   for a in range(4))

    out = hg._shift_bake(tl, shifts, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(tl, w)),
                               atol=1e-6)
    g = jax.grad(lambda t, w_: jnp.sum(
        hg._shift_bake(t, shifts, w_) ** 2), argnums=(0, 1))(tl, w)
    gr = jax.grad(lambda t, w_: jnp.sum(ref(t, w_) ** 2),
                  argnums=(0, 1))(tl, w)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-5)


def test_interp_modes_agree(monkeypatch):
    """'split' / 'slices' / 'einsum' interp forms agree to f32 rounding
    (einsum contracts in a different association order, so agreement is
    ~1e-9 absolute, not bit-exact; the custom_vjp picks per-program
    winners on TPU and accuracy must not depend on the knob)."""
    from scenedreamer_tpu.ops import hashgrid as hg
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=4, level_dim=8,
                                  log2_hashmap_size=12,
                                  desired_resolution=256)
    t = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (777, 3),
                             minval=-0.9, maxval=0.9)
    sc = jnp.asarray([0.1, -0.3])

    def run():
        out = hg.hashgrid_encode_folded(spec, t, xyz, sc)
        g = jax.grad(lambda tt, ss: jnp.sum(
            hg.hashgrid_encode_folded(spec, tt, xyz, ss) ** 2),
            argnums=(0, 1))(t, sc)
        return (np.asarray(out), np.asarray(g[0]), np.asarray(g[1]))

    results = {}
    for mode in ('split', 'slices', 'einsum'):
        monkeypatch.setattr(hg, 'INTERP_MODE', mode)
        results[mode] = run()
    for mode in ('slices', 'einsum'):
        for a, b in zip(results['split'], results[mode]):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)

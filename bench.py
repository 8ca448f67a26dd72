"""Headline benchmark: rays/s/chip, forward+backward, 540x960 x 24
samples/ray (BASELINE.json primary metric).

Measures the full differentiable render path of the flagship generator —
stratified depth sampling, 5-d multiresolution hash-grid encode
(fwd + scatter-add bwd), style-modulated RenderMLP, SKYMLP, volume
compositing, RenderCNN — as one jitted loss+grad step per ray tile,
iterated over a 540x960 frame like the reference's tile loop
(`imaginaire/generators/scenedreamer.py:600-628`), on whatever single
chip is available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is
reported against our own round-0 recorded value when present in
BENCH_BASELINE.json, else 1.0.
"""
import json
import os
import sys
import time


def _log(msg):
    print(f'[bench] {time.strftime("%H:%M:%S")} {msg}', file=sys.stderr,
          flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: the flagship grad step takes ~10 min of
# remote AOT compile over the axon tunnel; a warm cache turns reruns of
# the same program into a disk load. BENCH_NO_CACHE=1 opts out.
if not bool(int(os.environ.get('BENCH_NO_CACHE', '0'))):
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    _cache_dir = enable_compilation_cache()
    _log(f'compilation cache at {_cache_dir}' if _cache_dir
         else 'compilation cache off (disabled or unavailable)')

_env = os.environ.get
FRAME_H = int(_env('BENCH_H', 540))
FRAME_W = int(_env('BENCH_W', 960))
TILE = int(_env('BENCH_TILE', 0))
NUM_SAMPLES = int(_env('BENCH_SAMPLES', 24))
MAX_INTERVALS = int(_env('BENCH_M', 6))   # num_blocks_early_stop (train)
PAD = 6


def _pick_tile(frame_h, frame_w, samples, pad,
               budget=int(_env('BENCH_TILE_BUDGET', 1_750_000)),
               area_cap=int(_env('BENCH_TILE_AREA', 262_144))):
    """Exact-divisor tile grid minimizing total padded rays.

    The square-128 shifted-tile loop pushes 1.385x the frame's rays
    through the field (pad halos + edge-tile shift overlap). Tiles
    that divide the frame EXACTLY need no edge shift, so only the pad
    halo is wasted: a 2x4 grid of 270x240 tiles covers 540x960 with
    1.048x rays in 8 dispatches instead of 40. Constraints:

    - padded points/tile <= budget: the proven crop-256 training-step
      scale (~1.7M fits the grad step on one 16 GB v5e, PERF.md);
    - padded AREA/tile <= area_cap: RenderCNN/activation memory scales
      with tile area regardless of sample count, so a small
      BENCH_SAMPLES must not select a near-frame-sized tile;
    - short side >= 64: a sliver tile (e.g. 541x31) tile-pads its
      minor axis up to 16-42x on TPU (CLAUDE.md layout note).

    The candidate minimizing TOTAL padded rays across the grid wins;
    falls back to the 128 shifted loop when no divisor grid beats it
    (prime-ish frames).
    """
    import math
    n128 = math.ceil(frame_h / 128) * math.ceil(frame_w / 128)
    cost128 = n128 * (128 + pad) * (128 + pad)
    min_side = min(64, frame_h, frame_w)
    best = None
    div_h = [d for d in range(1, frame_h + 1) if frame_h % d == 0]
    div_w = [d for d in range(1, frame_w + 1) if frame_w % d == 0]
    for th in div_h:
        for tw in div_w:
            if min(th, tw) < min_side:
                continue
            area = (th + pad) * (tw + pad)
            if area > area_cap or area * (samples + 1) > budget:
                continue
            n = (frame_h // th) * (frame_w // tw)
            key = (n * area, n)        # total padded rays, then dispatches
            if best is None or key < best[0]:
                best = (key, (th, tw))
    if best is None or best[0][0] >= cost128:
        return 128, 128
    return best[1]


if TILE:                       # explicit BENCH_TILE: square shifted loop
    TILE_H = TILE_W = TILE
else:
    TILE_H, TILE_W = _pick_tile(FRAME_H, FRAME_W, NUM_SAMPLES, PAD)
TILE_H = int(_env('BENCH_TILE_H', 0)) or TILE_H
TILE_W = int(_env('BENCH_TILE_W', 0)) or TILE_W
WARMUP_STEPS = 2
TIMED_REPS = int(_env('BENCH_REPS', 1))
SCENE = int(_env('BENCH_SCENE', 256))
TINY = bool(int(_env('BENCH_TINY', '0')))  # smoke-test model size
# time only the first N tiles and extrapolate (stress configs: a
# 2160x3840 frame is 510 tiles; a subset proves memory + rate)
MAX_TILES = int(_env('BENCH_MAX_TILES', '0'))
# BENCH_AMP=1: bf16 module compute / f32 params+losses — the TPU
# analog of the reference's trainer amp_config (disabled in the
# shipped config, so the default metric stays f32)
AMP = bool(int(_env('BENCH_AMP', '0')))


def build():
    from scenedreamer_tpu.data.synthetic import make_world
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.ops.ray_voxel import (camera_rays,
                                                ray_voxel_intersection)
    from scenedreamer_tpu.scene import camera as cam

    dtype = jnp.bfloat16 if AMP else jnp.float32
    variant = os.environ.get('BENCH_HASH_VARIANT', 'xor')
    if TINY:
        cfg = GeneratorConfig(
            num_samples=NUM_SAMPLES, num_blocks_early_stop=MAX_INTERVALS,
            pad=PAD, style_dims=16, interm_style_dims=32,
            final_feat_dim=8, hash_num_levels=4, hash_level_dim=4,
            hash_log2_size=10, hash_desired_resolution=128,
            mlp_hidden=32, style_enc_num_filters=8, dtype=dtype,
            hash_variant=variant)
    else:
        cfg = GeneratorConfig(num_samples=NUM_SAMPLES,
                              num_blocks_early_stop=MAX_INTERVALS,
                              pad=PAD, dtype=dtype,
                              hash_variant=variant)
    world = make_world(size=SCENE, seed=42)
    _log(f'world built {world.dims}')
    model = SceneDreamerGenerator(cfg=cfg)

    # full-frame ray intersection once (as the reference does per frame);
    # camera sensor = output frame + CNN pad (`scenedreamer.py:554`)
    cam_h, cam_w = FRAME_H + PAD, FRAME_W + PAD
    rng = np.random.default_rng(0)
    ori, d, up, _f = cam.rand_camera_pose_tour(world, rng)
    f = 0.5 / np.tan(0.5 * np.deg2rad(26.0))
    rd = camera_rays(jnp.asarray(d), jnp.asarray(up), f * (FRAME_W - 1),
                     ((cam_h - 1) / 2, (cam_w - 1) / 2),
                     (cam_h, cam_w))
    # giant frames (stress config: 8.3M rays over a 2048^2 grid) are
    # chunk-dispatched by the op's chunk='auto' default
    vid, dep, hit = ray_voxel_intersection(
        jnp.asarray(world.voxel), jnp.asarray(ori), rd.reshape(-1, 3),
        MAX_INTERVALS)
    # force a real host sync (block_until_ready lies over the tunnel)
    _log(f'full-frame ray intersection done (hits {int(jnp.sum(hit))})')
    vid = vid.reshape(cam_h, cam_w, MAX_INTERVALS)
    dep = dep.reshape(cam_h, cam_w, MAX_INTERVALS, 2)
    hit = hit.reshape(cam_h, cam_w, MAX_INTERVALS)

    # fixed-shape padded tiles over the output frame (edge tiles shifted
    # back into range so ONE executable covers the whole frame)
    th, tw = TILE_H + PAD, TILE_W + PAD
    tiles = []
    for y in range(0, FRAME_H, TILE_H):
        for x in range(0, FRAME_W, TILE_W):
            tiles.append((min(y, FRAME_H - TILE_H),
                          min(x, FRAME_W - TILE_W)))

    # transfer the (large, shared) BEV fields ONCE — at scene 2048 each
    # is ~200 MB and per-tile re-transfer would multiply HBM residency
    hf_dev = jnp.asarray(world.height_field.transpose(0, 2, 3, 1))
    sf_dev = jnp.asarray(world.semantic_field.transpose(0, 2, 3, 1))
    ori_dev = jnp.asarray(ori)[None]

    def tile_batch(y0, x0):
        return {
            'voxel_id': vid[None, y0:y0 + th, x0:x0 + tw],
            'depth': dep[None, y0:y0 + th, x0:x0 + tw],
            'hit_mask': hit[None, y0:y0 + th, x0:x0 + tw],
            'raydirs': rd[None, y0:y0 + th, x0:x0 + tw],
            'cam_ori': ori_dev,
            'height_field': hf_dev,
            'semantic_field': sf_dev,
        }

    # exact sky-ray compaction (r5): per-tile hit-ray counts, bucketed
    # to 1/8-of-tile granularity so at most 8 program variants exist;
    # rays beyond the count are pure sky = exactly-zero field terms
    # (generator.render_pixels compact_k docstring; tested exact)
    tile_ks = [None] * len(tiles)
    if bool(int(_env('BENCH_COMPACT', '1'))):
        ray_hit = np.asarray(hit[:, :, 0])
        r_all = th * tw
        gran = -(-r_all // 8)
        tile_ks = []
        for (y0, x0) in tiles:
            cnt = int(ray_hit[y0:y0 + th, x0:x0 + tw].sum())
            k = min(r_all, -(-cnt // gran) * gran)
            tile_ks.append(None if k >= r_all else k)
        _log(f'compact_k buckets: {sorted(set(tile_ks), key=str)}')

    key = jax.random.PRNGKey(0)
    example = tile_batch(*tiles[0])
    params = model.init({'params': key}, example, world.dims, key,
                        random_style=True)
    jax.block_until_ready(params)
    _log('model init done')
    target = jnp.zeros((1, TILE_H, TILE_W, 3), jnp.float32)

    def loss_fn(p, batch, ck):
        out = model.apply(p, batch, world.dims, key, random_style=True,
                          compact_k=ck)
        return jnp.mean((out['fake_images'] - target) ** 2)

    step = jax.jit(jax.grad(loss_fn), static_argnums=2)
    build.pieces = (step, params, tile_batch, tiles)
    build.model, build.world, build.cfg = model, world, cfg
    build.tile_ks = tile_ks
    return step, params, tile_batch, tiles


def build_full_gan_step():
    """BENCH_FULL=1: the true BASELINE 'GAN training step' — D update +
    G update with the full loss assembly (N+1 GAN vs real and
    pseudo-real, KL, perceptual, L2) and both optimizers, per tile.
    The headline metric stays the renderer fwd+bwd for continuity with
    BENCH_BASELINE; this mode quantifies the gap."""
    import jax.random as jr
    from scenedreamer_tpu.models.discriminator import GANcraftDiscriminator
    from scenedreamer_tpu.train import losses as L
    from scenedreamer_tpu.train.trainer import GANTrainer, TrainerConfig

    step, params, tile_batch, tiles = build.pieces  # set by build()
    model, world, cfg = build.model, build.world, build.cfg
    rng = np.random.default_rng(1)
    crop_h, crop_w = TILE_H, TILE_W

    def gan_batch(y0, x0):
        b = tile_batch(y0, x0)
        b = dict(b)
        b['pseudo_real_img'] = jnp.asarray(
            rng.normal(size=(1, crop_h, crop_w, 3)).astype(np.float32))
        b['images'] = jnp.asarray(
            rng.normal(size=(1, crop_h, crop_w, 3)).astype(np.float32))
        masks = jax.nn.one_hot(
            rng.integers(1, 12, (1, crop_h, crop_w)), 12,
            dtype=jnp.float32)
        b['fake_masks'] = masks
        b['real_masks'] = masks
        return b

    amp_dt = jnp.bfloat16 if AMP else jnp.float32
    dis = GANcraftDiscriminator(num_labels=12, dtype=amp_dt)
    trainer = GANTrainer(model, dis, world.dims, cfg=TrainerConfig(),
                         perceptual=L.PerceptualLoss(dtype=amp_dt))
    state = trainer.init_state(jr.PRNGKey(0), gan_batch(*tiles[0]))
    return trainer, state, gan_batch, tiles


def main():
    step, params, tile_batch, tiles = build()
    tile_ks = build.tile_ks
    if MAX_TILES and MAX_TILES < len(tiles):
        tiles = tiles[:MAX_TILES]
        tile_ks = tile_ks[:MAX_TILES]
        _log(f'subset mode: {MAX_TILES} tiles')

    if bool(int(_env('BENCH_FULL', '0'))):
        trainer, state, gan_batch, tiles = build_full_gan_step()
        if MAX_TILES and MAX_TILES < len(tiles):
            tiles = tiles[:MAX_TILES]
            _log(f'subset mode: {MAX_TILES} tiles')
        batches = [gan_batch(y, x) for (y, x) in tiles]
        tile_ks = tile_ks[:len(batches)]
        # BENCH_FUSED=1: D+G as one executable (train_step_fused)
        # BENCH_SHARED=0: fall back to the two-forward train_step
        # (default is the single-forward train_step_shared — one G
        # render per iteration, vjp residuals reused; r5)
        if bool(int(_env('BENCH_FUSED', '0'))):
            step_fn = trainer.train_step_fused
        elif bool(int(_env('BENCH_SHARED', '1'))):
            step_fn = trainer.train_step_shared
        else:
            step_fn = trainer.train_step
        _log('BENCH_FULL: compiling D+G train step...')
        # host-fetch a scalar, NOT block_until_ready — the latter can
        # return early over the axon tunnel (CLAUDE.md timing note)
        for i in range(WARMUP_STEPS):
            # warm every compact_k program variant
            for ck in (sorted(set(tile_ks), key=str) if i == 0
                       else [tile_ks[0]]):
                state, m = step_fn(state, batches[0],
                                   jax.random.PRNGKey(i), compact_k=ck)
                float(m['gen/total'])
            _log(f'warmup {i} done')
        prof_dir = os.environ.get('BENCH_PROFILE', '')
        if prof_dir:
            with jax.profiler.trace(prof_dir):
                state, m = step_fn(state, batches[0],
                                   jax.random.PRNGKey(7),
                                   compact_k=tile_ks[0])
                float(m['gen/total'])
            _log(f'profile of one D+G step written to {prof_dir}')
        t0 = time.perf_counter()
        for _ in range(TIMED_REPS):
            for b, ck in zip(batches, tile_ks):
                state, m = step_fn(state, b, jax.random.PRNGKey(9),
                                   compact_k=ck)
        float(m['gen/total'])
        dt = time.perf_counter() - t0
        if MAX_TILES:
            rays = TILE_H * TILE_W * len(batches) * TIMED_REPS
        else:
            rays = FRAME_H * FRAME_W * TIMED_REPS
        print(json.dumps({
            'metric': f'rays_per_s_full_gan_step_{FRAME_H}x{FRAME_W}'
                      f'x{NUM_SAMPLES}{"_bf16amp" if AMP else ""}',
            'value': round(rays / dt, 1),
            'unit': 'rays/s/chip',
            'vs_baseline': 1.0,
        }))
        return
    batches = [tile_batch(y, x) for (y, x) in tiles]

    def _sync(grads):
        # host-fetch a scalar derived from a grad leaf, NOT
        # block_until_ready — the latter can return early over the
        # axon tunnel (CLAUDE.md timing note; same rule as BENCH_FULL)
        return float(jnp.sum(jax.tree_util.tree_leaves(grads)[0]))

    _log(f'{len(batches)} tiles; compiling grad step...')
    for i in range(WARMUP_STEPS):
        # warm every compact_k program variant
        for ck in sorted(set(tile_ks), key=str) if i == 0 else [tile_ks[0]]:
            g = step(params, batches[0], ck)
            _sync(g)
        _log(f'warmup {i} done')

    prof_dir = os.environ.get('BENCH_PROFILE', '')
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            g = step(params, batches[0], tile_ks[0])
            _sync(g)
        _log(f'profile of one tile written to {prof_dir}')

    t0 = time.perf_counter()
    for _ in range(TIMED_REPS):
        for b, ck in zip(batches, tile_ks):
            g = step(params, b, ck)
    _sync(g)
    dt = time.perf_counter() - t0
    _log(f'timed {TIMED_REPS} reps in {dt:.1f}s')

    if MAX_TILES:
        rays = TILE_H * TILE_W * len(batches) * TIMED_REPS
    else:
        rays = FRAME_H * FRAME_W * TIMED_REPS
    rays_per_s = rays / dt

    # roofline anchor (r5): XLA cost analysis of the compiled tile
    # executable -> achieved TFLOP/s and HBM GB/s vs v5e peaks
    # (197 TFLOP/s bf16 MXU, 819 GB/s HBM), turning the relative
    # "x over round-0" into an absolute utilization statement
    roof = {}
    try:
        ca = step.lower(params, batches[0],
                        tile_ks[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        tile_s = dt / (TIMED_REPS * len(batches))
        fl = float(ca.get('flops', 0.0))
        by = float(ca.get('bytes accessed', 0.0))
        roof = {
            'flops_per_tile': fl,
            'bytes_per_tile': by,
            'achieved_tflops_per_s': round(fl / tile_s / 1e12, 3),
            'achieved_hbm_gb_per_s': round(by / tile_s / 1e9, 1),
        }
        _log(f'roofline: {fl/1e9:.1f} GFLOP + {by/1e9:.2f} GB / tile '
             f'in {tile_s*1e3:.0f} ms -> '
             f"{roof['achieved_tflops_per_s']} TFLOP/s "
             f'({roof["achieved_tflops_per_s"]/197*100:.1f}% of bf16 peak), '
             f"{roof['achieved_hbm_gb_per_s']} GB/s "
             f'({roof["achieved_hbm_gb_per_s"]/819*100:.1f}% of HBM peak)')
    except Exception as e:          # cost_analysis is best-effort
        _log(f'cost analysis unavailable: {e!r}')

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'BENCH_BASELINE.json')
    if os.path.exists(bl_path):
        try:
            with open(bl_path) as fh:
                baseline = json.load(fh).get('value')
        except Exception:
            baseline = None
    vs = rays_per_s / baseline if baseline else 1.0

    extra = dict(roof)
    if bool(int(_env('BENCH_GOLDEN', '0'))):
        extra.update(_golden_check())

    print(json.dumps({
        'metric': f'rays_per_s_fwd_bwd_{FRAME_H}x{FRAME_W}'
                  f'x{NUM_SAMPLES}{"_bf16amp" if AMP else ""}',
        'value': round(rays_per_s, 1),
        'unit': 'rays/s/chip',
        'vs_baseline': round(vs, 3),
        **extra,
    }))


def _golden_check():
    """BENCH_GOLDEN=1: render the committed golden-frame config on
    THIS backend (the TPU when run over the tunnel) and diff against
    the CPU-generated fixtures — a backend-drift catcher; the CPU
    goldens in CI only pin logic (VERDICT r4 next-step 7). Returns
    JSON fields with the max abs image diff across all paths/poses."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tests'))
    import numpy as _np
    import test_golden as tg
    _log('BENCH_GOLDEN: rendering golden frames on this backend...')
    got = tg._render_all()
    ref = dict(_np.load(tg.FIXTURE))
    worst = 0.0
    for k, v in ref.items():
        if k.endswith('_depth'):
            continue
        d = float(_np.abs(got[k] - v).max())
        _log(f'golden {k}: max|diff| {d:.2e}')
        worst = max(worst, d)
    # tolerance: TPU convs/matmuls at default precision differ from
    # CPU at ~1e-2 scale on [-1,1] images; a real logic change shows
    # as O(0.1-1) structure
    ok = worst < 5e-2
    _log(f'BENCH_GOLDEN: max abs diff {worst:.3e} '
         f"({'PASS' if ok else 'FAIL'} at 5e-2)")
    return {'golden_max_abs_diff': round(worst, 6),
            'golden_pass': bool(ok)}


if __name__ == '__main__':
    main()

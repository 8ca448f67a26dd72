"""Inference CLI: seed -> terrain -> voxel world -> rendered fly-through.

Capability parity with `inference.py:35-83` in the reference: build the
generator, load a checkpoint, generate BEV maps for `--seed` (in-process
instead of the reference's `terrain_generator.py` subprocess,
`inference.py:75`), construct the voxel world with 16-deep fill
(`pcg_gen.py:124-128`), sample a style vector, and render the chosen
camera trajectory to PNG frames + mp4 via the tiled pipeline.

Usage:
    python -m scenedreamer_tpu.cli.inference --output_dir out \
        --seed 8888 --checkpoint ckpts/ --camera_mode 4
"""
import argparse
import os


def load_generator_params(checkpoint, model, world, cfg, key):
    """Restore g_ema (preferred) or g_params from an orbax checkpoint
    dir / path; fall back to fresh init when absent."""
    import jax
    from scenedreamer_tpu.data.synthetic import make_batch
    batch = make_batch(world, batch_size=1, height=20, width=20,
                       max_samples=cfg.num_blocks_early_stop,
                       pad=cfg.pad, include_gan_data=False)
    params = model.init({'params': key}, batch, world.dims, key,
                        random_style=True)
    if not checkpoint:
        print('[inference] no checkpoint given - using random init')
        return params
    if checkpoint.endswith(('.pt', '.pth')):
        # reference released checkpoint (scenedreamer_released.pt):
        # torch state dict -> flax params via the layout-tested
        # converter (utils/convert.py; the BASELINE parity-gate hook —
        # docs/PARITY.md "Environmentally-blocked gate")
        from scenedreamer_tpu.utils.convert import (
            convert_scenedreamer_generator, load_torch_checkpoint)
        ckpt = load_torch_checkpoint(checkpoint)
        sd = ckpt.get('net_G', ckpt) if isinstance(ckpt, dict) else ckpt
        print(f'[inference] converting torch checkpoint {checkpoint}')
        return convert_scenedreamer_generator(sd)
    import orbax.checkpoint as ocp
    from scenedreamer_tpu.train.trainer import latest_checkpoint
    path = checkpoint
    if os.path.isdir(checkpoint) and not os.path.exists(
            os.path.join(checkpoint, '_CHECKPOINT_METADATA')):
        resolved = latest_checkpoint(checkpoint)
        if resolved:
            path = resolved
    restored = ocp.PyTreeCheckpointer().restore(path)
    g = restored.get('g_ema') or restored.get('g_params') or restored
    return {'params': g}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--output_dir', required=True)
    p.add_argument('--checkpoint', default='')
    p.add_argument('--seed', type=int, default=8888)
    p.add_argument('--scene_size', type=int, default=2048)
    p.add_argument('--camera_mode', type=int, default=4)
    p.add_argument('--cam_maxstep', type=int, default=40)
    p.add_argument('--cam_ang', type=int, default=72)
    p.add_argument('--resolution', type=int, nargs=2, default=[540, 960])
    p.add_argument('--num_samples', type=int, default=40)
    p.add_argument('--num_blocks_early_stop', type=int, default=6)
    p.add_argument('--sample_depth', type=float, default=3.0)
    p.add_argument('--pad', type=int, default=30)
    p.add_argument('--tile_size', type=int, default=128)
    p.add_argument('--fps', type=int, default=10)
    p.add_argument('--style', default='',
                   help='style.npy from a previous render (reuse the '
                        'scene appearance instead of sampling from '
                        '--seed)')
    p.add_argument('--style2', default='',
                   help='second style: interpolate appearance from '
                        '--style/--seed to this across the trajectory '
                        "(a style.npy path, or 'seed:<int>')")
    p.add_argument('--no_split_refine', action='store_true',
                   help='disable the split-refine fast path (pointwise '
                        'field on non-overlapping tiles + one '
                        'full-frame RenderCNN); the padded-tile loop '
                        'of the reference is used instead')
    p.add_argument('--tiles_per_batch', type=int, default=1,
                   help='tiles per device dispatch (one compiled '
                        'shape; >1 amortizes per-dispatch RTT over '
                        'remote-device links)')
    p.add_argument('--mesh_tiles', action='store_true',
                   help='fan frame tiles out over all devices in one '
                        'dispatch (multi-chip inference)')
    p.add_argument('--save_depth', action='store_true',
                   help='also write depth + voxel-id frames '
                        '(reference inference_givenstyle_depth)')
    p.add_argument('--platform', default=None,
                   help="force a jax platform (e.g. 'cpu')")
    p.add_argument('--amp', action='store_true',
                   help='bf16 module compute (f32 params) — the '
                        'serving analog of the reference running its '
                        'oracle half-precision (trainers/gancraft.py:41)')
    a = p.parse_args(argv)

    if a.platform:
        from scenedreamer_tpu.cli.train import _force_platform
        _force_platform(a.platform)
    import jax
    import numpy as np
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()
    from scenedreamer_tpu.render.pipeline import render_trajectory
    from scenedreamer_tpu.scene.terrain import generate_terrain
    from scenedreamer_tpu.scene.voxel_world import build_voxel_world

    print(f'[inference] generating terrain (size={a.scene_size}, '
          f'seed={a.seed})')
    maps = generate_terrain(size=a.scene_size, seed=a.seed)
    world = build_voxel_world(maps.height_map, maps.semantic_map,
                              maps.tree_map, fill_depth=16, seed=a.seed)
    print(f'[inference] voxel world {world.dims}')

    import jax.numpy as jnp
    cfg = GeneratorConfig(num_samples=a.num_samples,
                          num_blocks_early_stop=a.num_blocks_early_stop,
                          sample_depth=a.sample_depth,
                          dtype=jnp.bfloat16 if a.amp else jnp.float32)
    model = SceneDreamerGenerator(cfg=cfg)
    key = jax.random.PRNGKey(a.seed)
    params = load_generator_params(a.checkpoint, model, world, cfg, key)

    def one_style(spec, seed):
        if spec.startswith('seed:'):
            return jax.random.normal(jax.random.PRNGKey(int(spec[5:])),
                                     (1, cfg.style_dims))
        if spec:
            # re-render a saved scene appearance (`inference_givenstyle`
            # persists style.npy, `scenedreamer.py:479-632`); a saved
            # interpolated run is [F, style_dims] — passed through
            return jnp.asarray(
                np.load(spec).reshape(-1, cfg.style_dims))
        return jax.random.normal(jax.random.PRNGKey(seed),
                                 (1, cfg.style_dims))

    style = one_style(a.style, a.seed)
    if a.style2:
        s2 = one_style(a.style2, a.seed + 1)
        t = np.linspace(0.0, 1.0, max(a.cam_maxstep, 2))[:, None]
        style = jnp.asarray((1.0 - t) * np.asarray(style[:1])
                            + t * np.asarray(s2[:1]))
    os.makedirs(a.output_dir, exist_ok=True)
    mesh = None
    if a.mesh_tiles:
        from scenedreamer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    render_trajectory(
        model, params, world, style, a.output_dir,
        camera_mode=a.camera_mode, cam_maxstep=a.cam_maxstep,
        cam_ang=a.cam_ang, num_samples=a.num_samples,
        num_blocks_early_stop=a.num_blocks_early_stop,
        sample_depth=a.sample_depth, pad=a.pad, tile_size=a.tile_size,
        resolution_hw=tuple(a.resolution), fps=a.fps, seed=a.seed,
        save_depth=a.save_depth, mesh=mesh,
        tiles_per_batch=a.tiles_per_batch,
        split_refine=False if a.no_split_refine else None)
    print(f'[inference] wrote {a.output_dir}/rgb_render(.mp4)')


if __name__ == '__main__':
    main()

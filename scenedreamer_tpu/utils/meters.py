"""Metric meters and experiment logging.

Capability parity with the reference observability layer
(`imaginaire/utils/meters.py:76-149` Meter with cross-rank mean
reduction + tensorboard flush + wandb mirroring,
`imaginaire/utils/logging.py:13-51` date-uid logdir). TPU-native:
cross-process reduction uses `multihost_utils.process_allgather` on the
buffered means at flush time (the reference used torch.distributed
allreduce per flush, `utils/meters.py:76-149`); sinks are tensorboard
when available (torch ships it), optional wandb (absent in this image —
gated on import), plus an always-on `metrics.jsonl`.
"""
import datetime
import json
import os
import time

import numpy as np


def make_logging_dir(logdir_root, config_name):
    """logs/<date>_<config> (`utils/logging.py:13-51`)."""
    date_uid = datetime.datetime.now().strftime('%Y_%m%d_%H%M_%S')
    logdir = os.path.join(logdir_root, f'{date_uid}_{config_name}')
    os.makedirs(logdir, exist_ok=True)
    return logdir


def _cross_process_mean(names, means):
    """Mean the per-process meter means across all jax processes.

    One allgather of a dense [n_meters] vector per flush (NaN marks a
    meter with no local values; nanmean reduces). Single-process is the
    identity — and so is the multi-device single-process test mesh.

    Contract (same as the reference's per-meter dist allreduce,
    `utils/meters.py:76-149`): every process must register the SAME
    meter-name set — rank-divergent meters would silently average
    unrelated scalars by index, so the name set is fingerprinted into
    the gathered vector and a mismatch raises instead."""
    import jax
    if jax.process_count() == 1:
        return means
    import zlib
    from jax.experimental import multihost_utils
    fp = float(zlib.crc32('\x00'.join(names).encode()))
    vec = np.asarray([fp] + [means.get(n, np.nan) for n in names],
                     np.float64)
    all_vecs = np.asarray(
        multihost_utils.process_allgather(vec))   # [P, 1 + n_meters]
    if not np.all(all_vecs[:, 0] == fp):
        raise RuntimeError(
            'meter name sets diverge across processes; register the '
            'same meters on every rank (rank-local metrics must be '
            'flushed through a separate writer)')
    with np.errstate(invalid='ignore'):
        red = np.nanmean(all_vecs[:, 1:], axis=0)
    # plain python floats: numpy scalars break json.dumps in the
    # jsonl sink (r5 multihost-test find)
    return {n: float(red[i]) for i, n in enumerate(names)
            if red[i] == red[i]}


class Meter:
    """Buffers scalars between flushes; means on flush
    (`utils/meters.py:76-149`)."""

    def __init__(self, name, writer):
        self.name = name
        self.writer = writer
        self.values = []

    def write(self, value):
        if value is not None:
            self.values.append(float(value))

    def local_mean(self):
        vals = [v for v in self.values
                if v == v and abs(v) != float('inf')]
        return sum(vals) / len(vals) if vals else None

    def flush(self, step):
        m = self.local_mean()
        if m is not None:
            self.writer.scalar(self.name, m, step)
        self.values.clear()


class MetricsWriter:
    """jsonl + optional tensorboard / wandb sinks with cross-process
    meter reduction on flush."""

    def __init__(self, logdir, use_tensorboard=True, use_wandb=False,
                 wandb_kwargs=None):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, 'metrics.jsonl'), 'a')
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None
        # wandb mirroring (`train.py:98-120`, `trainers/base.py:551`);
        # optional — the package is not in this image
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                run_id_path = os.path.join(logdir, 'wandb_id.txt')
                kwargs = dict(wandb_kwargs or {})
                if os.path.exists(run_id_path):
                    with open(run_id_path) as f:
                        kwargs.setdefault('id', f.read().strip())
                    kwargs.setdefault('resume', 'allow')
                self._wandb = wandb.init(dir=logdir, **kwargs)
                with open(run_id_path, 'w') as f:
                    f.write(self._wandb.id + '\n')
            except Exception:
                self._wandb = None
        self._meters = {}

    def meter(self, name):
        if name not in self._meters:
            self._meters[name] = Meter(name, self)
        return self._meters[name]

    def scalar(self, name, value, step):
        self._jsonl.write(json.dumps(
            {'t': time.time(), 'step': int(step), name: value}) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        if self._wandb is not None:
            self._wandb.log({name: value}, step=int(step))

    def image(self, name, img_uint8_hwc, step):
        if self._tb is not None:
            self._tb.add_image(name, img_uint8_hwc, step,
                               dataformats='HWC')
        if self._wandb is not None:
            import wandb
            self._wandb.log({name: wandb.Image(img_uint8_hwc)},
                            step=int(step))

    def flush_meters(self, step):
        """Cross-process mean (reference `utils/meters.py:76-149`
        all-reduce) then emit through the sinks."""
        names = sorted(self._meters)
        means = {}
        for n in names:
            m = self._meters[n].local_mean()
            if m is not None:
                means[n] = m
            self._meters[n].values.clear()
        for n, v in _cross_process_mean(names, means).items():
            self.scalar(n, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()

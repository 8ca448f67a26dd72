"""2-process CPU "multi-host" test (VERDICT r4 missing item 3).

Launches two subprocesses that rendezvous through
`parallel.mesh.init_distributed` (env:// style, the reference
`utils/distributed.py:12-18` + `train.py:52-55` path), each owning 2
virtual CPU devices, and exercises the real multi-host surfaces:
`global_batch_from_local`, shard_map pmean over 'data' across
processes, cross-process meter reduction, and the coordinated orbax
checkpoint save.
"""
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', '_multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port), str(tmp_path),
         REPO],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f'worker failed:\n{out}\n{err[-3000:]}'
        assert 'WORKER_OK' in out, out

    # cross-process meter reduction: both processes flushed the
    # GLOBAL mean (0 + 1) / 2 = 0.5
    for i in range(2):
        path = tmp_path / f'log{i}' / 'metrics.jsonl'
        rows = [json.loads(l) for l in open(path)]
        loss = [r['loss'] for r in rows if 'loss' in r]
        assert loss and abs(loss[-1] - 0.5) < 1e-6, rows

    # coordinated checkpoint: one checkpoint dir, pointer present
    assert (tmp_path / 'ckpt' / 'latest_checkpoint.txt').exists()

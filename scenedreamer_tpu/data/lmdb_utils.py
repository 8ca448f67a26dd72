"""LMDB construction and reading for paired datasets.

Capability parity with the reference LMDB layer
(`imaginaire/utils/lmdb.py:43-216` build_lmdb/create_metadata and
`scripts/build_lmdb.py`): each data type (images, seg_maps) gets its own
LMDB whose values are the RAW file bytes keyed by the file's relative
path, plus an `all_filenames.json` metadata list.

Host-side IO; gated on the `lmdb` package (falls back with a clear
error if absent so the folder backend remains usable).
"""
import json
import os


def _require_lmdb():
    try:
        import lmdb
        return lmdb
    except ImportError as e:  # pragma: no cover
        raise ImportError('lmdb package not available; use the folder '
                          'dataset backend instead') from e


def build_lmdb(file_paths, keys, output_path, map_size=None,
               write_frequency=1000):
    """Write raw file bytes into an LMDB (`utils/lmdb.py:56-74`)."""
    lmdb = _require_lmdb()
    if map_size is None:
        map_size = sum(os.path.getsize(p) for p in file_paths) * 2 + 10**8
    os.makedirs(output_path, exist_ok=True)
    env = lmdb.open(output_path, map_size=map_size)
    txn = env.begin(write=True)
    for i, (path, key) in enumerate(zip(file_paths, keys)):
        with open(path, 'rb') as f:
            txn.put(key.encode('ascii'), f.read())
        if (i + 1) % write_frequency == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    with open(os.path.join(output_path, 'all_filenames.json'), 'w') as f:
        json.dump(sorted(keys), f)


def build_paired_lmdbs(data_root, output_root,
                       data_types=('images', 'seg_maps')):
    """Folder tree {data_root}/{type}/... -> {output_root}/{type} LMDBs
    (`scripts/build_lmdb.py` flow). Only stems present in every type are
    kept (paired requirement, `utils/lmdb.py:132-216`)."""
    per_type = {}
    for t in data_types:
        root = os.path.join(data_root, t)
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root) for f in fs
            if not f.startswith('.'))
        per_type[t] = {
            os.path.splitext(os.path.relpath(p, root))[0]: p
            for p in files}
    common = sorted(set.intersection(*[set(v) for v in per_type.values()]))
    if not common:
        raise FileNotFoundError(f'no paired files under {data_root}')
    for t in data_types:
        paths = [per_type[t][stem] for stem in common]
        keys = [os.path.relpath(p, os.path.join(data_root, t))
                for p in paths]
        build_lmdb(paths, keys, os.path.join(output_root, t))
    return len(common)


class LMDBReader:
    """Read-only raw-bytes LMDB (`utils/lmdb.py:17-54` Dataset half)."""

    def __init__(self, path):
        lmdb = _require_lmdb()
        self.env = lmdb.open(
            path, max_readers=126, readonly=True, lock=False,
            readahead=False, meminit=False)
        meta = os.path.join(path, 'all_filenames.json')
        if os.path.exists(meta):
            with open(meta) as f:
                self.keys = json.load(f)
        else:
            with self.env.begin() as txn:
                self.keys = [k.decode('ascii')
                             for k, _ in txn.cursor()]

    def get(self, key):
        with self.env.begin(write=False) as txn:
            buf = txn.get(key.encode('ascii'))
        if buf is None:
            raise KeyError(key)
        return bytes(buf)

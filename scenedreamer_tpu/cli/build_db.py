"""LMDB dataset builder CLI.

Capability parity with `scripts/build_lmdb.py` + `imaginaire/utils/
lmdb.py:56-216`: folder tree {data_root}/{images,seg_maps}/... into
paired raw-bytes LMDBs keyed by relative path.

Usage:
    python -m scenedreamer_tpu.cli.build_db --data_root data/lhq_raw \
        --output_root data/lhq_lmdb/train
"""
import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data_root', required=True)
    p.add_argument('--output_root', required=True)
    p.add_argument('--data_types', nargs='+',
                   default=['images', 'seg_maps'])
    a = p.parse_args(argv)
    from scenedreamer_tpu.data.lmdb_utils import build_paired_lmdbs
    n = build_paired_lmdbs(a.data_root, a.output_root,
                           tuple(a.data_types))
    print(f'wrote {n} paired entries to {a.output_root}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Extract label-translation lookup tables from the reference CSV data files.

The reference (SceneDreamer) resolves minecraft-voxel / coco-stuff / reduced
label mappings at runtime from five CSV files
(`/root/reference/imaginaire/model_utils/gancraft/*.csv`, loaded by
`mc_lbl_reduction.py:9-79` and `mc_utils.py:163-274`). We bake the *derived*
integer LUT arrays into a single `.npz` (plus a JSON sidecar for the name
lists) so the runtime needs no CSV parsing and no reference checkout.

Run once (requires the reference checkout):
    python scripts/extract_label_luts.py \
        --csv-dir /root/reference/imaginaire/model_utils/gancraft \
        --out scenedreamer_tpu/assets/label_luts.npz
"""
import argparse
import csv
import json
import os

import numpy as np


def build_luts(csv_dir):
    # ---- Minecraft id -> (name, color, gaugan label) -------------------
    id2name, id2color, id2glbl = {}, {}, {}
    with open(os.path.join(csv_dir, 'id2name_gg.csv'), newline='') as f:
        for row in csv.reader(f):
            id2name[int(row[0])] = row[1]
            id2color[int(row[0])] = int(row[2])
            id2glbl[int(row[0])] = row[3]
    n_mc = len(id2name)

    # ---- GauGAN label -> color / coco index -----------------------------
    gg_labels = []
    glbl2color, glbl2cocoidx = {}, {}
    with open(os.path.join(csv_dir, 'gaugan_lbl2col.csv'), newline='') as f:
        cocoidx = 1  # 0 is "Others"
        for row in csv.reader(f):
            gg_labels.append(row[0])
            glbl2color[row[0]] = int(row[1].lstrip('#'), 16)
            glbl2cocoidx[row[0]] = cocoidx
            cocoidx += 1

    # mc id -> coco idx (0 when unmapped)
    mc2coco = np.zeros(n_mc, dtype=np.int32)
    mc2color = np.zeros(n_mc, dtype=np.uint32)
    mc2ggcolor = np.zeros(n_mc, dtype=np.uint32)
    for k in range(n_mc):
        v = id2glbl[k]
        mc2coco[k] = glbl2cocoidx[v] if v else 0
        mc2ggcolor[k] = glbl2color[v] if v else 0
        mc2color[k] = id2color[k]

    # ---- Reduced label set ----------------------------------------------
    reduced_lbls = []
    rdlbl2rdid = {}
    with open(os.path.join(csv_dir, 'reduced_coco_lbls.csv'), newline='') as f:
        for idx, row in enumerate(csv.reader(f)):
            rdlbl2rdid[row[0]] = idx
            reduced_lbls.append(row[0])
    assert reduced_lbls[0] == 'ignore'

    # mc id -> reduced id ('' -> ignore)
    mcid2rdlbl = {}
    with open(os.path.join(csv_dir, 'mc_reduction.csv'), newline='') as f:
        for row in csv.reader(f):
            mcid2rdlbl[int(row[0])] = row[3]
    mcid2rdid = np.zeros(len(mcid2rdlbl), dtype=np.int32)
    for mcid in range(len(mcid2rdlbl)):
        lbl = mcid2rdlbl[mcid] or 'ignore'
        mcid2rdid[mcid] = rdlbl2rdid[lbl]

    # gaugan (coco) id -> reduced id
    gglbl2ggid = {lbl: i for i, lbl in enumerate(gg_labels)}
    gglbl2rdid = {}
    with open(os.path.join(csv_dir, 'gaugan_reduction.csv'), newline='') as f:
        for row in csv.reader(f):
            gglbl2rdid[gglbl2ggid[row[0]]] = rdlbl2rdid[row[1]]
    ggid2rdid = np.array([gglbl2rdid[i] for i in range(len(gglbl2rdid))],
                         dtype=np.int32)

    return {
        'mc2coco': mc2coco,
        'mcid2rdid': mcid2rdid,
        'ggid2rdid': ggid2rdid,
        'mc2color': mc2color,
        'mc2ggcolor': mc2ggcolor,
    }, {
        'reduced_lbls': reduced_lbls,
        'gg_labels': gg_labels,
        'ignore_id': rdlbl2rdid['ignore'],
        'dirt_id': rdlbl2rdid['dirt'],
        'water_id': rdlbl2rdid['water'],
        'mc_names': [id2name[i] for i in range(n_mc)],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--csv-dir', required=True)
    p.add_argument('--out', required=True)
    args = p.parse_args()
    arrays, meta = build_luts(args.csv_dir)
    np.savez_compressed(args.out, **arrays)
    with open(os.path.splitext(args.out)[0] + '.json', 'w') as f:
        json.dump(meta, f)
    print('wrote', args.out, {k: v.shape for k, v in arrays.items()})
    print('meta:', {k: (v if not isinstance(v, list) else len(v))
                    for k, v in meta.items()})


if __name__ == '__main__':
    main()

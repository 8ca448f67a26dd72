"""Post-training campaign evaluation: for every checkpoint of a
`cli.train` run, render a fake set on the training camera distribution
(scripts/render_fake_set.py) and score FID/KID against a pseudo-GT
real set (`cli.evaluate`), emitting the table for docs/TRAINING_RUN.md.

Evidence contract of r3 VERDICT item 2: loss curves come from the
run's metrics.jsonl; this script adds FID/KID-vs-step + snapshot
images (`imaginaire/trainers/gancraft.py:158-251`, README.md:196-208).

Usage:
  python scripts/campaign_eval.py --run-dir /tmp/campaign/<run> \
      --real-dir /tmp/pgt --terrain-cache /tmp/assets/terrain_cache \
      --outdir /tmp/campaign_eval --num-images 64
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--run-dir', required=True)
    p.add_argument('--real-dir', required=True)
    p.add_argument('--terrain-cache', required=True)
    p.add_argument('--outdir', required=True)
    p.add_argument('--num-images', type=int, default=64)
    p.add_argument('--crop', type=int, default=256)
    p.add_argument('--config', default=None)
    p.add_argument('--image-size', type=int, default=256)
    p.add_argument('--platform', default=None)
    a = p.parse_args(argv)

    ckpt_dir = os.path.join(a.run_dir, 'checkpoints')
    steps = sorted(d for d in os.listdir(ckpt_dir)
                   if d.startswith('step_'))
    if not steps:
        raise SystemExit(f'no checkpoints under {ckpt_dir}')
    os.makedirs(a.outdir, exist_ok=True)
    rows = []
    plat = ['--platform', a.platform] if a.platform else []
    cfg = ['--config', a.config] if a.config else []
    for s in steps:
        step = int(s.split('_')[-1])
        fake_dir = os.path.join(a.outdir, f'fake_{step:06d}')
        if not os.path.exists(os.path.join(
                fake_dir, f'{a.num_images - 1:05d}.png')):
            subprocess.run(
                [sys.executable, 'scripts/render_fake_set.py',
                 '--checkpoint', os.path.join(ckpt_dir, s),
                 '--terrain-cache', a.terrain_cache,
                 '--outdir', fake_dir,
                 '--num-images', str(a.num_images),
                 '--crop', str(a.crop), '--seed', '123'] + cfg + plat,
                check=True, cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
        row = {'step': step}
        for ex in ('vgg19', 'pixel'):
            out = os.path.join(a.outdir, f'eval_{step:06d}_{ex}.json')
            subprocess.run(
                [sys.executable, '-m', 'scenedreamer_tpu.cli.evaluate',
                 '--real-dir', a.real_dir, '--fake-dir', fake_dir,
                 '--image-size', str(a.image_size),
                 '--extractor', ex, '--output', out] + plat,
                check=True, cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            with open(out) as f:
                r = json.load(f)
            row[f'fid_{ex}'] = r['fid']
            row[f'kid_{ex}'] = r['kid']
        rows.append(row)
        print(f'[campaign_eval] step {step}: {row}')
    table = os.path.join(a.outdir, 'fid_table.json')
    with open(table, 'w') as f:
        json.dump(rows, f, indent=1)
    print(f'[campaign_eval] wrote {table}')
    print('| step | FID (vgg-rel) | KID (vgg-rel) | FID (pixel) | '
          'KID (pixel) |')
    print('|---|---|---|---|---|')
    for r in rows:
        print(f'| {r["step"]} | {r["fid_vgg19"]:.4f} | '
              f'{r["kid_vgg19"]:.6f} | {r["fid_pixel"]:.4f} | '
              f'{r["kid_pixel"]:.6f} |')


if __name__ == '__main__':
    main()

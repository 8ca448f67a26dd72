"""Command-line entry points (reference `train.py` / `inference.py` /
`terrain_generator.py` / `scripts/*` — SURVEY.md §2.1):

  python -m scenedreamer_tpu.cli.terrain_gen   # BEV terrain maps
  python -m scenedreamer_tpu.cli.pcg_cache     # sparse voxel cache
  python -m scenedreamer_tpu.cli.build_db      # paired LMDB builder
  python -m scenedreamer_tpu.cli.train         # GAN training loop
  python -m scenedreamer_tpu.cli.inference     # trajectory rendering
"""

"""Label translation across minecraft-voxel / coco-stuff / reduced label sets.

Capability parity with the reference `MCLabelTranslator`
(`imaginaire/model_utils/gancraft/mc_utils.py:163-274`) and
`ReducedLabelMapper` (`mc_lbl_reduction.py:9-79`), but the derived integer
LUTs are baked into `assets/label_luts.npz` (see
scripts/extract_label_luts.py) and all translations are pure jnp gathers so
they can live inside jitted code.
"""
import functools
import json
import os

import numpy as np
import jax.numpy as jnp

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'assets')

NUM_MC_LABELS = 680
NUM_COCO_LABELS = 184  # coco-stuff labels used by the SPADE oracle
NUM_REDUCED_LABELS = 12


@functools.lru_cache(maxsize=1)
def _load():
    arrays = dict(np.load(os.path.join(_ASSET_DIR, 'label_luts.npz')))
    with open(os.path.join(_ASSET_DIR, 'label_luts.json')) as f:
        meta = json.load(f)
    return arrays, meta


class LabelTranslator:
    """Immutable LUT bundle. All translate methods accept jnp or np arrays."""

    def __init__(self):
        arrays, meta = _load()
        self.mc2coco_lut = jnp.asarray(arrays['mc2coco'], jnp.int32)
        self.mcid2rdid_lut = jnp.asarray(arrays['mcid2rdid'], jnp.int32)
        # index 182 (clamped "unknown") maps to ignore, as in the reference
        # (`mc_utils.py:225`: ggid2rdid + [0]).
        self.ggid2rdid_lut = jnp.asarray(
            np.concatenate([arrays['ggid2rdid'], [0]]), jnp.int32)
        self.mc2color_lut = np.asarray(arrays['mc2color'], np.uint32)
        self.reduced_lbls = meta['reduced_lbls']
        self.gg_labels = meta['gg_labels']
        self.ignore_id = int(meta['ignore_id'])
        self.dirt_id = int(meta['dirt_id'])
        self.water_id = int(meta['water_id'])
        self.num_reduced_lbls = len(self.reduced_lbls)

    # -- translations (gathers; safe under jit) ---------------------------
    def mc2coco(self, mc):
        return jnp.take(self.mc2coco_lut, mc.astype(jnp.int32), axis=0)

    def mc2reduced(self, mc, ign2dirt=False):
        red = jnp.take(self.mcid2rdid_lut, mc.astype(jnp.int32), axis=0)
        if ign2dirt:
            red = jnp.where(red == self.ignore_id, self.dirt_id, red)
        return red

    def coco2reduced(self, coco):
        coco = jnp.clip(coco.astype(jnp.int32), 0,
                        self.ggid2rdid_lut.shape[0] - 1)
        return jnp.take(self.ggid2rdid_lut, coco, axis=0)

    def gglbl2ggid(self, gglbl):
        return self.gg_labels.index(gglbl)

    def get_num_reduced_lbls(self):
        return self.num_reduced_lbls

    # -- visualization (host-side numpy) -----------------------------------
    def mc_color(self, img):
        """Minecraft default colors for a [H, W] int segmentation map."""
        rgb_packed = self.mc2color_lut[np.asarray(img)]
        dt = np.dtype(('u4', [('bytes', 'u1', 4)]))
        return rgb_packed.view(dt)['bytes'][..., :3]


@functools.lru_cache(maxsize=1)
def get_label_translator():
    return LabelTranslator()

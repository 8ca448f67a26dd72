"""Tiled trajectory rendering: scene -> camera path -> frames -> video.

Capability parity with the reference inference path
(`imaginaire/generators/scenedreamer.py:479-632` inference_givenstyle):
per-frame full-resolution ray-voxel intersection, a full-frame sky
average precomputed once per frame for consistent semi-transparent
regions, memory-bounded tile evaluation with CNN receptive-field
padding, center-crop stitching, PNG frames + mp4, and the side outputs
(semantic/height map visualizations, style vector).

TPU-native design:
  * ONE jitted tile renderer at a fixed [tile+pad]^2 shape — edge tiles
    are shifted back into range instead of shrunk, so XLA compiles a
    single executable for the whole frame (the reference re-runs
    variable-shaped tiles, which would retrace on TPU).
  * The full frame can alternatively be rendered in one jit when it
    fits HBM (`tile_size=None`), or sharded across a ('data', 'rays')
    mesh by the caller — tiles are independent work items.
  * Deterministic depth sampling (the reference sets
    coarse_deterministic_sampling=True for inference).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.ray_voxel import (camera_rays,
                                            ray_voxel_intersection)
from scenedreamer_tpu.scene.camera import EvalCameraController

# biome color LUT for the semantic-map visualization
# (`scenedreamer.py:534-546`)
BIOME_COLORS = np.array(
    [[255, 255, 178], [184, 200, 98], [188, 161, 53], [190, 255, 242],
     [106, 144, 38], [33, 77, 41], [86, 179, 106], [34, 61, 53],
     [35, 114, 94], [0, 0, 255], [0, 255, 0]], np.uint8)


def to_uint8(img):
    """[-1, 1] float -> uint8 RGB."""
    return np.clip((np.asarray(img) * 0.5 + 0.5) * 255, 0,
                   255).astype(np.uint8)


def write_png(path, img_uint8):
    import cv2
    cv2.imwrite(path, img_uint8[..., ::-1],
                [cv2.IMWRITE_PNG_COMPRESSION, 4])


class VideoWriter:
    """mp4 writer via OpenCV (the environment ships no ffmpeg CLI)."""

    def __init__(self, path, fps=10):
        self.path = path
        self.fps = fps
        self._w = None

    def append(self, img_uint8):
        import cv2
        if self._w is None:
            h, w = img_uint8.shape[:2]
            self._w = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*'mp4v'), self.fps,
                (w, h))
        self._w.write(np.ascontiguousarray(img_uint8[..., ::-1]))

    def close(self):
        if self._w is not None:
            self._w.release()


class TiledRenderer:
    """Renders frames of one world with fixed inference settings."""

    def __init__(self, model, params, world, num_samples=40,
                 num_blocks_early_stop=6, sample_depth=3.0, pad=30,
                 tile_size=128, resolution_hw=(540, 960), fov=26.0,
                 tiles_per_batch=1, mesh=None, sky_fast=True,
                 split_refine=None, field_tiles_per_batch=None):
        self.model = model
        self.params = params
        self.world = world
        self.num_samples = num_samples
        self.m = num_blocks_early_stop
        self.sample_depth = sample_depth
        self.pad = pad
        self.tile = tile_size
        self.tiles_per_batch = max(1, tiles_per_batch)
        # mesh mode: ALL tiles of a frame are stacked on the leading
        # axis, sharded across every mesh device, and rendered in ONE
        # dispatch — the parallel version of the reference's sequential
        # tile loop (`scenedreamer.py:600-628`); tiles are independent
        # so no communication is emitted
        self.mesh = mesh
        # pure-sky tiles (no hit intervals anywhere) skip the
        # hash-field + RenderMLP via render_pixels(sky_only=True) —
        # bit-exact for such tiles (their field weights are exactly
        # zero in the full path too). One [T]-bool fetch per frame
        # decides; applies to the serial single-tile dispatch path.
        self.sky_fast = sky_fast
        self.res = tuple(resolution_hw)
        self.cam_res = (self.res[0] + pad, self.res[1] + pad)
        self.fov = fov
        # split-refine: the per-ray field (DDA samples -> hash encode ->
        # RenderMLP -> compositing — the expensive, POINTWISE part) is
        # evaluated on NON-overlapping tiles and stitched on device;
        # the RenderCNN (the only cross-pixel stage, receptive-field
        # radius 4 << the pad//2 crop) then runs ONCE on the full
        # stitched feature map. The reference pays the field for every
        # padded pixel of every tile (`scenedreamer.py:600-628`,
        # (tile+pad)^2 / tile^2 = 1.52x at the 128/30 defaults); here
        # the pad exists only for the cheap CNN. Output equals the
        # full-frame (untiled) render bit-for-bit in the field and to
        # conv-rounding in the CNN (tested). Off in mesh mode (feature
        # assembly across devices not supported). Above ~1.4 MPx the
        # full-frame CNN activations would not fit HBM, so the CNN runs
        # in full-width row strips with an 8-row halo (>= its 4-row
        # receptive field): kept rows are either >= halo from the strip
        # window edge or at the true frame edge, so strip outputs equal
        # the full-frame CNN by the same argument as the padded tiles.
        if split_refine is None:
            split_refine = os.environ.get(
                'SCENEDREAMER_SPLIT_REFINE', '1') == '1'
        self.split_refine = split_refine and mesh is None
        # exact per-tile sky-ray compaction of the split-refine field
        # (render_pixels compact_k): the per-frame flags fetch also
        # carries per-tile hit-ray counts; counts bucket to quarter-
        # tile granularity (<=3 extra executables). Partially-sky
        # tiles then skip the field for their sky rays exactly.
        self.field_compact = os.environ.get(
            'SCENEDREAMER_FIELD_COMPACT', '1') == '1'
        self._refine_full = (self.cam_res[0] * self.cam_res[1]
                             <= int(os.environ.get(
                                 'SCENEDREAMER_REFINE_FULL_PX',
                                 '1400000')))
        # split-refine field dispatches grouped K per dispatch: each
        # remote dispatch costs ~RTT, so many-tile frames amortize it
        # K-fold; per-tile values are identical to K=1 (tested).
        if field_tiles_per_batch is None:
            field_tiles_per_batch = int(os.environ.get(
                'SCENEDREAMER_FIELD_TPB', '1'))
        self.field_tiles_per_batch = max(1, field_tiles_per_batch)
        self._strip_halo = 8
        self._strip_rows = max(8, min(
            int(os.environ.get('SCENEDREAMER_REFINE_STRIP', '256')),
            self.cam_res[0] - 2 * self._strip_halo))
        self.voxel_dev = jnp.asarray(world.voxel)
        self._compiled = {}

        hf = jnp.asarray(world.height_field.transpose(0, 2, 3, 1))
        sf = jnp.asarray(world.semantic_field.transpose(0, 2, 3, 1))

        def global_enc_fn(params):
            return self.model.apply(params, hf, sf,
                                    method=self.model.world_code)
        self.global_enc = jax.jit(global_enc_fn)(params)

        def style_fn(params, style):
            return self.model.apply(params, style,
                                    method=self.model.style_forward)
        self._style_fn = jax.jit(style_fn)

        def sky_avg_fn(params, raydirs, z):
            sky_c = self.model.apply(params, raydirs, z,
                                     method=self.model.sky_color)
            return jnp.mean(sky_c, axis=(1, 2), keepdims=True)
        self._sky_avg_fn = jax.jit(sky_avg_fn)

        def tile_fn(params, voxel_id, depth, hit, raydirs, cam_ori, z,
                    global_enc, sky_avg, key, sky_only=False):
            out = self.model.apply(
                params, key, voxel_id, depth, hit, raydirs, cam_ori, z,
                global_enc, self.world.dims,
                num_samples=self.num_samples,
                sample_depth_clip=self.sample_depth,
                deterministic=True, sky_avg=sky_avg, sky_only=sky_only,
                method=self.model.render_pixels)
            img, _ = self.model.apply(params, out['net_out'], z,
                                      method=self.model.refine)
            # expected ray depth (reference inference_givenstyle_depth,
            # `scenedreamer.py:636-851`): sum(w * t) / sum(w); sky -> inf
            w = out['weights'][..., 0]                      # [B,h,w,S]
            t = out['rand_depth'][..., 0]
            tw = jnp.sum(w, axis=-1)
            depth_exp = jnp.where(tw > 1e-6,
                                  jnp.sum(w * t, axis=-1)
                                  / jnp.maximum(tw, 1e-6), jnp.inf)
            p = self.pad
            sl = slice(p // 2, -(p // 2))
            return img[:, sl, sl, :], depth_exp[:, sl, sl]
        self._tile_fn = jax.jit(tile_fn, static_argnames=('sky_only',))
        self._tile_fn_py = tile_fn
        self._mesh_tile_fns = {}
        self._params_rep = None
        self._hit_flags_fn = None

        def field_fn(params, voxel_id, depth, hit, raydirs, cam_ori, z,
                     global_enc, sky_avg, key, sky_only=False,
                     compact_k=None):
            """Per-ray field ONLY (no CNN, no crop) for one tile."""
            out = self.model.apply(
                params, key, voxel_id, depth, hit, raydirs, cam_ori, z,
                global_enc, self.world.dims,
                num_samples=self.num_samples,
                sample_depth_clip=self.sample_depth,
                deterministic=True, sky_avg=sky_avg, sky_only=sky_only,
                compact_k=compact_k,
                method=self.model.render_pixels)
            w = out['weights'][..., 0]
            t = out['rand_depth'][..., 0]
            tw = jnp.sum(w, axis=-1)
            depth_exp = jnp.where(tw > 1e-6,
                                  jnp.sum(w * t, axis=-1)
                                  / jnp.maximum(tw, 1e-6), jnp.inf)
            return out['net_out'], depth_exp
        self._field_fn = jax.jit(field_fn,
                                 static_argnames=('sky_only',
                                                  'compact_k'))

        # K field tiles per dispatch (split-refine): slice K tiles,
        # broadcast the per-frame operands, run the field at batch K,
        # and place the results — ONE remote dispatch per group instead
        # of K (the ~30 ms-per-dispatch tunnel RTT dominates many-tile
        # frames; PERF.md headroom item 4). Tile values equal the
        # serial dispatches to f32 rounding (the hash encode is exact
        # under lax.map; the MLP matmuls may block differently at
        # batch K — measured <= 1 ULP, tested).
        def field_group_fn(params, vid, dep, hit, rd, cam_ori, z,
                           global_enc, sky_avg, ys, xs, key,
                           sky_only=False):
            k = ys.shape[0]
            sm = self.m
            s_ = self._field_tile

            def one(y, x):
                return (jax.lax.dynamic_slice(vid, (0, y, x, 0),
                                              (1, s_, s_, sm))[0],
                        jax.lax.dynamic_slice(dep, (0, y, x, 0, 0),
                                              (1, s_, s_, sm, 2))[0],
                        jax.lax.dynamic_slice(hit, (0, y, x, 0),
                                              (1, s_, s_, sm))[0],
                        jax.lax.dynamic_slice(rd, (0, y, x, 0),
                                              (1, s_, s_, 3))[0])
            tv, td, th, tr = jax.vmap(one)(ys, xs)
            bc = lambda a: jnp.broadcast_to(a, (k,) + a.shape[1:])
            return field_fn(params, tv, td, th, tr, bc(cam_ori),
                            bc(z),
                            jax.tree_util.tree_map(bc, global_enc),
                            bc(sky_avg), key, sky_only=sky_only)
        self._field_group_fn = jax.jit(field_group_fn,
                                       static_argnames=('sky_only',))

        def place_group_fn(full, tiles, ys, xs):
            """Accumulate a [K, s, s, C] tile stack into the stitched
            feature map (donated buffer, one dispatch per group)."""
            def body(i, f):
                t = jax.lax.dynamic_index_in_dim(tiles, i, 0)
                return jax.lax.dynamic_update_slice(
                    f, t, (0, ys[i], xs[i], 0))
            return jax.lax.fori_loop(0, tiles.shape[0], body, full)
        self._place_group_fn = jax.jit(place_group_fn,
                                       donate_argnums=(0,))

        def refine_fn(params, net_out, z):
            img, _ = self.model.apply(params, net_out, z,
                                      method=self.model.refine)
            p = self.pad
            sl = slice(p // 2, -(p // 2))
            return img[:, sl, sl, :]
        self._refine_fn = jax.jit(refine_fn)

        def refine_strip_fn(params, full, z, w0, keep_off):
            """RenderCNN on one full-width row strip of the stitched
            feature map (traced offsets -> ONE executable for every
            strip placement); returns the kept (halo-free) rows."""
            hw_win = self._strip_rows + 2 * self._strip_halo
            window = jax.lax.dynamic_slice(
                full, (0, w0, 0, 0),
                (1, hw_win, full.shape[2], full.shape[3]))
            img, _ = self.model.apply(params, window, z,
                                      method=self.model.refine)
            return jax.lax.dynamic_slice(
                img, (0, keep_off, 0, 0),
                (1, self._strip_rows, img.shape[2], 3))
        self._refine_strip_fn = jax.jit(refine_strip_fn)

        # one executable for every tile placement (traced offsets); the
        # donated full buffer makes the 40 updates in-place on device
        self._place_fn = jax.jit(
            lambda full, t, y, x: jax.lax.dynamic_update_slice(
                full, t, (0, y, x, 0)),
            donate_argnums=(0,))
        self._field_flags_fn = None
        self._slice_fn = None
        self._field_tile = (self._field_tile_size()
                            if self.split_refine else None)

    def style_z(self, style):
        """Raw 128-d style -> intermediate style."""
        return self._style_fn(self.params, style)

    def _mesh_tile_fn(self, sky_only):
        """shard_map'd padded-tile program for mesh mode: the tile
        batch axis is sharded over every mesh device and each device
        runs the EXACT serial tile program on its shard. This is the
        load-bearing detail: the hash encode evaluates batch>1 with
        `lax.map` over the batch (models/generator.py field_features —
        vmap measured 5x slower), and a lax.map over a SHARDED axis
        serializes the whole dispatch; under shard_map the per-device
        batch is small (1 at tiles==devices) so every device takes the
        fast direct path concurrently. Per-tile values are those of
        the serial loop (same per-tile program)."""
        if sky_only not in self._mesh_tile_fns:
            try:
                from jax import shard_map
            except ImportError:      # older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            sh = P(tuple(self.mesh.axis_names))
            rep = P()

            def body(params, vid, dep, hit, rd, ori, z, genc, sky,
                     key):
                return self._tile_fn_py(params, vid, dep, hit, rd,
                                        ori, z, genc, sky, key,
                                        sky_only=sky_only)
            f = shard_map(
                body, mesh=self.mesh,
                in_specs=(rep, sh, sh, sh, sh, sh, sh, sh, sh, rep),
                out_specs=(sh, sh))
            self._mesh_tile_fns[sky_only] = jax.jit(f)
        return self._mesh_tile_fns[sky_only]

    def _dispatch_tiles_mesh(self, coords_full, tile_in, vid, dep,
                             hit, raydirs, cam_ori, z, sky_avg, key,
                             sky_only):
        """Stack tile crops, shard them over the mesh, run the
        shard_map'd tile program (see `_mesh_tile_fn`)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))
        rep = NamedSharding(self.mesh, P())
        # keyed on identity of self.params so a live params swap
        # invalidates the replicated copy (ADVICE r4)
        if self._params_rep is None or self._params_rep[0] is not self.params:
            self._params_rep = (self.params,
                                jax.device_put(self.params, rep))
        b = len(coords_full)

        def stack(arr):
            return jax.device_put(jnp.concatenate(
                [arr[:, y0:y0 + tile_in, x0:x0 + tile_in]
                 for (y0, x0) in coords_full], axis=0), sh)

        def bcast(arr):
            return jax.device_put(
                jnp.broadcast_to(arr, (b,) + arr.shape[1:]), sh)

        return self._mesh_tile_fn(sky_only)(
            self._params_rep[1], stack(vid), stack(dep), stack(hit),
            stack(raydirs), bcast(cam_ori), bcast(z),
            jax.tree_util.tree_map(bcast, self.global_enc),
            bcast(sky_avg), jax.device_put(key, rep))

    def _tile_hit_flags(self, coords, tile_in, hit):
        """Per-tile any-hit flags: ONE [T]-bool D2H fetch per frame
        routes pure-sky tiles to the field-skipping executable."""
        # the jitted closure bakes in the tile grid — key the cache on
        # (coords, tile_in) so a changed grid retraces (ADVICE r4)
        cache_key = (tuple(coords), tile_in)
        if self._hit_flags_fn is None or self._hit_flags_fn[0] != cache_key:
            cs = list(coords)

            def hit_flags(hm):
                return jnp.stack(
                    [jnp.any(hm[0, y0:y0 + tile_in, x0:x0 + tile_in])
                     for (y0, x0) in cs])
            self._hit_flags_fn = (cache_key, jax.jit(hit_flags))
        flags = np.asarray(self._hit_flags_fn[1](hit))
        self._last_hit_flags = flags
        return flags

    @staticmethod
    def _grid_coords(extent, s):
        """Starts of non-overlapping s-tiles covering [0, extent); the
        last tile is shifted back into range (the small overlap
        recomputes bit-identical values — the field is pointwise)."""
        cs = list(range(0, extent - s + 1, s))
        if not cs or cs[-1] + s < extent:
            cs.append(extent - s)
        return cs

    def _field_tile_size(self):
        """Field tile side minimizing total evaluated pixels over the
        cam_res cover (edge tiles shift back, so an ill-fitting side
        wastes overlap; e.g. 144 covers 570x990 in 28 tiles / 3% waste
        vs 40 tiles / 16% for 128)."""
        h, w = self.cam_res
        best, best_px = None, None
        for s in range(96, min(257, min(h, w) + 1), 16):
            n = (len(self._grid_coords(h, s))
                 * len(self._grid_coords(w, s)))
            px = n * s * s
            if best_px is None or px < best_px:
                best, best_px = s, px
        return best or min(h, w)

    def _frame_split(self, vid, dep, hit, raydirs, cam_ori, z, sky_avg,
                     key, return_aux):
        """Split-refine frame: pointwise field on non-overlapping
        tiles -> device-side feature assembly -> ONE full-frame
        RenderCNN (see __init__'s split_refine note)."""
        h, w = self.cam_res
        s = self._field_tile
        m = self.m
        coords = [(y0, x0) for y0 in self._grid_coords(h, s)
                  for x0 in self._grid_coords(w, s)]
        if self._slice_fn is None:
            def slice_all(vid, dep, hit, rd, y, x):
                return (jax.lax.dynamic_slice(vid, (0, y, x, 0),
                                              (1, s, s, m)),
                        jax.lax.dynamic_slice(dep, (0, y, x, 0, 0),
                                              (1, s, s, m, 2)),
                        jax.lax.dynamic_slice(hit, (0, y, x, 0),
                                              (1, s, s, m)),
                        jax.lax.dynamic_slice(rd, (0, y, x, 0),
                                              (1, s, s, 3)))
            self._slice_fn = jax.jit(slice_all)
        flags = counts = None
        if self.sky_fast or self.field_compact:
            if self._field_flags_fn is None:
                cs = list(coords)

                def field_stats(hm):
                    # per-tile count of rays with ANY hit: one [T]
                    # int32 fetch carries both the sky flags
                    # (count > 0) and the compaction buckets
                    return jnp.stack(
                        [jnp.sum(jnp.any(hm[0, y0:y0 + s, x0:x0 + s],
                                         axis=-1).astype(jnp.int32))
                         for (y0, x0) in cs])
                self._field_flags_fn = jax.jit(field_stats)
            # ONE [T]-int fetch routes pure-sky tiles to the
            # field-skipping executable (bit-exact, see render_pixels)
            # and buckets partially-sky tiles for exact compaction
            counts = np.asarray(self._field_flags_fn(hit))
            flags = counts > 0 if self.sky_fast else None
            self._last_hit_flags = flags
        tpb = self.field_tiles_per_batch
        if tpb > 1:
            # K tiles per dispatch (~T/K dispatches; per-tile values
            # equal K=1 to f32 rounding, see __init__). Groups are per
            # sky flag; short groups repeat the last tile (re-placing
            # a tile writes the same values, so padding is harmless).
            if flags is not None:
                parts = [([cc for cc, f in zip(coords, flags) if f],
                          False),
                         ([cc for cc, f in zip(coords, flags)
                           if not f], True)]
            else:
                parts = [(list(coords), False)]
            full = None
            depth_parts = []
            for g_coords, g_sky in parts:
                for i0 in range(0, len(g_coords), tpb):
                    grp = g_coords[i0:i0 + tpb]
                    grp_full = grp + [grp[-1]] * (tpb - len(grp))
                    ys = jnp.asarray([g[0] for g in grp_full],
                                     jnp.int32)
                    xs = jnp.asarray([g[1] for g in grp_full],
                                     jnp.int32)
                    nt, dt = self._field_group_fn(
                        self.params, vid, dep, hit, raydirs, cam_ori,
                        z, self.global_enc, sky_avg, ys, xs, key,
                        sky_only=g_sky)
                    if full is None:
                        full = jnp.zeros((1, h, w, nt.shape[-1]),
                                         nt.dtype)
                    full = self._place_group_fn(full, nt, ys, xs)
                    depth_parts.append((grp, dt))
        else:
            tiles = []
            gran = max(1, (s * s) // 4)     # quarter-tile buckets
            for i, (y0, x0) in enumerate(coords):
                sky_only = bool(flags is not None and not flags[i])
                ck = None
                if (self.field_compact and counts is not None
                        and not sky_only):
                    k = -(-int(counts[i]) // gran) * gran
                    ck = k if k < s * s else None
                tv, td, th, tr = self._slice_fn(vid, dep, hit, raydirs,
                                                jnp.int32(y0),
                                                jnp.int32(x0))
                nt, dt = self._field_fn(self.params, tv, td, th, tr,
                                        cam_ori, z, self.global_enc,
                                        sky_avg, key, sky_only=sky_only,
                                        compact_k=ck)
                tiles.append((y0, x0, nt, dt))
            c = tiles[0][2].shape[-1]
            full = jnp.zeros((1, h, w, c), tiles[0][2].dtype)
            for y0, x0, nt, _ in tiles:
                full = self._place_fn(full, nt, jnp.int32(y0),
                                      jnp.int32(x0))
            depth_parts = [([(y0, x0)], dt) for y0, x0, _, dt in tiles]
        if self._refine_full:
            img = self._refine_fn(self.params, full, z)
            strips = None
        else:
            # giant frames: the CNN runs in halo'd row strips (see
            # __init__'s split_refine note); the kept rows equal the
            # full-frame CNN to conv rounding
            img = None
            st = self._strip_rows
            halo = self._strip_halo
            hw_win = st + 2 * halo
            strips = []
            for y0 in self._grid_coords(h, st):
                w0 = min(max(y0 - halo, 0), h - hw_win)
                strips.append((y0, self._refine_strip_fn(
                    self.params, full, z, jnp.int32(w0),
                    jnp.int32(y0 - w0))))
        aux_vid = vid if return_aux else None

        def materialize_split():
            out_d = np.zeros((h, w), np.float32)
            for grp, dt in depth_parts:
                d_np = np.asarray(dt)       # one fetch per group
                for i, (y0, x0) in enumerate(grp):
                    out_d[y0:y0 + s, x0:x0 + s] = d_np[i]
            p0 = self.pad // 2
            out_d = out_d[p0:p0 + self.res[0], p0:p0 + self.res[1]]
            if strips is None:
                out = np.asarray(img[0])
            else:
                buf = np.zeros((h, w, 3), np.float32)
                for y0, s_img in strips:
                    buf[y0:y0 + self._strip_rows] = np.asarray(s_img[0])
                out = buf[p0:p0 + self.res[0], p0:p0 + self.res[1]]
            return self._finish(out, out_d, aux_vid, return_aux)
        return materialize_split

    def export_tile(self, z, path=None, platforms=None, batch=None):
        """AOT-serialize the per-tile render program (`jax.export`).

        Serving artifact: a versioned StableHLO blob of the jitted tile
        function at this renderer's fixed shapes — a production server
        deserializes and calls it with NO retrace/recompile and NO
        model code on the serving host (the reference has no analog;
        its tile loop re-runs eager torch per request). `z` is an
        example intermediate style (`style_z` output) fixing the style
        shape. `batch` = leading tile-batch dim; defaults to this
        renderer's live dispatch batch (`tiles_per_batch` when tiled,
        1 full-frame) — pass the padded tile count explicitly when
        serving the mesh-mode layout. Returns the serialized bytes;
        also written to `path` when given. `platforms` e.g. ('tpu',)
        or ('tpu', 'cpu').
        """
        from jax import export as jexport
        t = (self.tile + self.pad) if self.tile else None
        tiled = t and t < max(self.cam_res)
        h, w = (t, t) if tiled else self.cam_res
        b = batch or (self.tiles_per_batch if tiled else 1)

        def sds(x, dtype=None):
            x = jnp.asarray(x) if not hasattr(x, 'shape') else x
            return jax.ShapeDtypeStruct(x.shape, dtype or x.dtype)

        params_sds = jax.tree_util.tree_map(sds, self.params)
        raydirs_sds = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
        # sky_avg dtype follows the model's compute dtype — derive it
        # from the live producer instead of assuming f32
        sky_sds = jax.eval_shape(
            self._sky_avg_fn, params_sds,
            jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32), sds(z))
        args = (
            params_sds,
            jax.ShapeDtypeStruct((b, h, w, self.m), jnp.int32),    # vid
            jax.ShapeDtypeStruct((b, h, w, self.m, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w, self.m), jnp.bool_),    # hit
            raydirs_sds,
            jax.ShapeDtypeStruct((b, 3), jnp.float32),        # cam_ori
            jax.ShapeDtypeStruct((b,) + tuple(jnp.shape(z))[1:],
                                 jnp.asarray(z).dtype),
            jax.tree_util.tree_map(
                lambda s: jax.ShapeDtypeStruct((b,) + s.shape[1:],
                                               s.dtype),
                jax.tree_util.tree_map(sds, self.global_enc)),
            jax.ShapeDtypeStruct((b,) + sky_sds.shape[1:],
                                 sky_sds.dtype),
            sds(jax.random.PRNGKey(0)),
        )
        exp = jexport.export(self._tile_fn,
                             platforms=platforms)(*args)
        blob = exp.serialize()
        if path:
            with open(path, 'wb') as f:
                f.write(blob)
        return blob

    @staticmethod
    def load_exported(blob_or_path):
        """Deserialize an `export_tile` artifact -> callable with the
        tile function's signature."""
        from jax import export as jexport
        blob = blob_or_path
        if isinstance(blob, (str, os.PathLike)):
            with open(blob, 'rb') as f:
                blob = f.read()
        return jexport.deserialize(blob).call

    def frame(self, cam_pose, z, key=None, return_aux=False):
        """Render one frame. cam_pose = (ori, dir, up, f_ratio) in world
        coordinates (EvalCameraController convention). With
        `return_aux`, also returns {'depth', 'first_voxel_id'}
        (reference inference_givenstyle_depth,
        `scenedreamer.py:636-851`)."""
        return self.frame_async(cam_pose, z, key=key,
                                return_aux=return_aux)()

    def frame_async(self, cam_pose, z, key=None, return_aux=False):
        """Dispatch ALL device work for one frame; returns a zero-arg
        materializer producing `frame`'s result. The trajectory loop
        dispatches frame i+1 before materializing frame i, overlapping
        the D2H transfer + host stitching/PNG/mp4 encode with the next
        frame's device queue (jax dispatch is async)."""
        key = jax.random.PRNGKey(0) if key is None else key
        ori, cdir, up, f_ratio = cam_pose
        h, w = self.cam_res
        # view must not depend on the padding (`scenedreamer.py:579`)
        cam_f = f_ratio * (self.res[1] - 1)
        cam_c = ((h - 1) / 2.0, (w - 1) / 2.0)
        raydirs = camera_rays(jnp.asarray(cdir, jnp.float32),
                              jnp.asarray(up, jnp.float32), cam_f, cam_c,
                              (h, w))
        n_rays = h * w
        vid, dep, hit = ray_voxel_intersection(
            self.voxel_dev, jnp.asarray(ori, jnp.float32),
            raydirs.reshape(-1, 3), self.m,
            # giant frames over giant grids: chunk-dispatch the DDA so
            # no single program runs for minutes (see ray_voxel.py)
            chunk='auto')
        vid = vid.reshape(1, h, w, self.m)
        dep = dep.reshape(1, h, w, self.m, 2)
        hit = hit.reshape(1, h, w, self.m)
        raydirs = raydirs.reshape(1, h, w, 3)
        cam_ori = jnp.asarray(ori, jnp.float32)[None]

        sky_avg = self._sky_avg_fn(self.params, raydirs, z)

        tile_in = self.tile + self.pad if self.tile else None
        if tile_in is None or (tile_in >= h and tile_in >= w):
            img, dexp = self._tile_fn(self.params, vid, dep, hit,
                                      raydirs, cam_ori, z,
                                      self.global_enc, sky_avg, key)
            # don't pin the big aux tensors on device across the
            # depth-1 frame pipeline unless they're actually returned
            aux = (dexp, vid) if return_aux else None

            def materialize_full():
                if aux is not None:
                    dexp_a, vid_a = aux
                    return np.asarray(img[0]), {
                        'depth': np.asarray(dexp_a[0]),
                        'first_voxel_id': np.asarray(
                            vid_a[0, self.pad // 2:h - self.pad
                                  + self.pad // 2,
                                  self.pad // 2:w - self.pad
                                  + self.pad // 2, 0]),
                    }
                return np.asarray(img[0])
            return materialize_full

        if self.split_refine:
            return self._frame_split(vid, dep, hit, raydirs, cam_ori,
                                     z, sky_avg, key, return_aux)

        coords = []
        for y0 in range(0, self.res[0], self.tile):
            for x0 in range(0, self.res[1], self.tile):
                coords.append((min(y0, h - tile_in),
                               min(x0, w - tile_in)))
        if self.mesh is not None:
            # ALL tiles dispatched sharded over `self.mesh` — the
            # parallel version of the reference's sequential tile loop
            # (`scenedreamer.py:600-628`). Pure-sky tiles ride the
            # field-skipping executable here too (the serial path's
            # bit-exactness argument is per-tile, so it transfers);
            # each group is padded to a device multiple, but the padded
            # duplicates are dropped ON DEVICE so the D2H fetch carries
            # only real tiles (remote-link D2H is the scarce resource).
            n_dev = int(np.prod([self.mesh.shape[a]
                                 for a in self.mesh.axis_names]))
            groups = [(coords, False)]
            if self.sky_fast:
                flags = self._tile_hit_flags(coords, tile_in, hit)
                hit_c = [c for c, f in zip(coords, flags) if f]
                sky_c = [c for c, f in zip(coords, flags) if not f]
                groups = ([(hit_c, False)] if hit_c else []) \
                    + ([(sky_c, True)] if sky_c else [])
            pending = []
            for g_coords, g_sky in groups:
                g_full = g_coords + [g_coords[-1]] * ((-len(g_coords))
                                                      % n_dev)
                imgs, dexps = self._dispatch_tiles_mesh(
                    g_full, tile_in, vid, dep, hit, raydirs, cam_ori,
                    z, sky_avg, key, sky_only=g_sky)
                n_real = len(g_coords)
                pending.append((g_coords,
                                (imgs[:n_real], dexps[:n_real])))
        else:
            # optionally batch tiles per dispatch (padding keeps ONE
            # compiled shape). Measured on v5e the default of 1 is
            # fastest (batched tiles blew up the gather transients);
            # >1 remains useful over high-RTT remote-device links.
            # Dispatch ALL groups before any host transfer — jax
            # dispatch is async, so device work overlaps the
            # per-group RTT.
            tb = self.tiles_per_batch
            flags = None
            if self.sky_fast and tb == 1:
                # ONE [T]-bool fetch decides every tile's dispatch
                flags = self._tile_hit_flags(coords, tile_in, hit)
            pending = []
            for s in range(0, len(coords), tb):
                group = coords[s:s + tb]
                group_full = group + [group[-1]] * (tb - len(group))
                sky_only = bool(flags is not None and not flags[s])
                pending.append((group, self._dispatch_tiles(
                    group_full, tile_in, vid, dep, hit, raydirs,
                    cam_ori, z, sky_avg, key, sky_only=sky_only)))

        # _finish only reads vid for the aux voxel-id map: don't pin
        # the [1,h,w,M] int32 frame on device across the frame pipeline
        aux_vid = vid if return_aux else None

        def materialize_tiled():
            out = np.zeros((self.res[0], self.res[1], 3), np.float32)
            out_d = np.zeros((self.res[0], self.res[1]), np.float32)
            for group, (imgs, dexps) in pending:
                self._stitch(out, out_d, np.asarray(imgs),
                             np.asarray(dexps), group)
            return self._finish(out, out_d, aux_vid, return_aux)
        return materialize_tiled

    def _dispatch_tiles(self, coords_full, tile_in, vid, dep, hit,
                        raydirs, cam_ori, z, sky_avg, key,
                        place=None, place_params=None, sky_only=False):
        """Stack the tile crops into one batch and run _tile_fn;
        `place`/`place_params` optionally shard the operands."""
        ident = lambda a: a
        place = place or ident
        place_params = place_params or ident
        b = len(coords_full)

        def stack(arr):
            return place(jnp.concatenate(
                [arr[:, y0:y0 + tile_in, x0:x0 + tile_in]
                 for (y0, x0) in coords_full], axis=0))

        def bcast(arr):
            return place(jnp.broadcast_to(arr, (b,) + arr.shape[1:]))

        # device arrays, NOT host: the tile loop defers the D2H
        # transfer so successive dispatches overlap on-device
        return self._tile_fn(
            place_params(self.params), stack(vid), stack(dep),
            stack(hit), stack(raydirs), bcast(cam_ori), bcast(z),
            bcast(self.global_enc), bcast(sky_avg), key,
            sky_only=sky_only)

    def _stitch(self, out, out_d, imgs, dexps, coords):
        for i, (y0, x0) in enumerate(coords):
            out[y0:y0 + self.tile, x0:x0 + self.tile] = imgs[i]
            out_d[y0:y0 + self.tile, x0:x0 + self.tile] = dexps[i]

    def _finish(self, out, out_d, vid, return_aux):
        if return_aux:
            p0 = self.pad // 2
            return out, {
                'depth': out_d,
                'first_voxel_id': np.asarray(
                    vid[0, p0:p0 + self.res[0], p0:p0 + self.res[1],
                        0]),
            }
        return out


def render_trajectory(model, params, world, style, output_dir,
                      camera_mode=0, cam_maxstep=10, cam_ang=72,
                      num_samples=40, num_blocks_early_stop=6,
                      sample_depth=3.0, pad=30, tile_size=128,
                      resolution_hw=(540, 960), fps=10, seed=1,
                      write_frames=True, save_depth=False, mesh=None,
                      tiles_per_batch=1, split_refine=None):
    """Full inference: camera trajectory -> rgb_render/*.png + .mp4
    (`scenedreamer.py:479-632`). Returns the list of rendered frames."""
    output_dir = os.path.join(output_dir, 'rgb_render')
    os.makedirs(output_dir, exist_ok=True)

    renderer = TiledRenderer(model, params, world,
                             num_samples=num_samples,
                             num_blocks_early_stop=num_blocks_early_stop,
                             sample_depth=sample_depth, pad=pad,
                             tile_size=tile_size,
                             resolution_hw=resolution_hw, mesh=mesh,
                             tiles_per_batch=tiles_per_batch,
                             split_refine=split_refine)

    # side outputs (`scenedreamer.py:563-565`)
    sem = np.argmax(world.semantic_field[0], axis=0)
    write_png(os.path.join(output_dir, 'semantic_map.png'),
              BIOME_COLORS[sem])
    hm = world.height_field[0, 0]
    write_png(os.path.join(output_dir, 'height_map.png'),
              np.repeat((np.clip(hm, 0, 1) * 255).astype(np.uint8)
                        [..., None], 3, -1))
    np.save(os.path.join(output_dir, 'style.npy'), np.asarray(style))

    # style interpolation: a [F, style_dims] style renders frame i
    # with its own appearance (paper-demo capability; the reference's
    # inference uses one fixed z, `scenedreamer.py:479`)
    style_arr = np.asarray(style)
    per_frame_z = None
    if style_arr.ndim == 2 and style_arr.shape[0] > 1:
        per_frame_z = [renderer.style_z(jnp.asarray(style_arr[i:i + 1]))
                       for i in range(style_arr.shape[0])]
        z = per_frame_z[0]
    else:
        z = renderer.style_z(style.reshape(1, -1))
    ctl = EvalCameraController(
        world, maxstep=cam_maxstep, pattern=camera_mode, cam_ang=cam_ang,
        smooth_decay_multiplier=150.0 / cam_maxstep)

    video = VideoWriter(output_dir + '.mp4', fps=fps)
    frames = []

    def emit(i, result):
        if save_depth:
            img, aux = result
        else:
            img = result
        rgb = to_uint8(img)
        if write_frames:
            write_png(os.path.join(output_dir, f'{i:05d}.png'), rgb)
        if save_depth:
            # depth colormap + first-hit voxel-id shading
            # (`scenedreamer.py:636-851`)
            from scenedreamer_tpu.scene.labels import get_label_translator
            from scenedreamer_tpu.utils.visualization import colormap
            d = aux['depth'].copy()
            d[~np.isfinite(d)] = np.nan
            dvis = (colormap(d) * 255).astype(np.uint8)
            write_png(os.path.join(output_dir, f'{i:05d}_depth.png'),
                      dvis)
            vid_vis = get_label_translator().mc_color(
                aux['first_voxel_id'])
            write_png(os.path.join(output_dir, f'{i:05d}_voxel.png'),
                      np.ascontiguousarray(vid_vis))
        video.append(rgb)
        frames.append(rgb)

    # depth-1 frame pipeline: frame i+1's device work is dispatched
    # before frame i's D2H/stitch/PNG/mp4 — host output overlaps the
    # next frame's device queue (the reference renders strictly
    # serially, `scenedreamer.py:573-631`)
    prev = None
    for i, pose in enumerate(ctl):
        zi = per_frame_z[min(i, len(per_frame_z) - 1)] \
            if per_frame_z else z
        mat = renderer.frame_async(pose, zi,
                                   key=jax.random.PRNGKey(seed + i),
                                   return_aux=save_depth)
        if prev is not None:
            emit(prev[0], prev[1]())
        prev = (i, mat)
    if prev is not None:
        emit(prev[0], prev[1]())
    video.close()
    return frames

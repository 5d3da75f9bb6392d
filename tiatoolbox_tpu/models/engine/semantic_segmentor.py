"""Semantic segmentation engine with streaming probability-map merge.

Reference: ``models/engine/semantic_segmentor.py`` — per-batch patch
probabilities are accumulated into a whole-slide canvas with a count
map for overlap normalization (merge_horizontal/merge_vertical
:1186-1536), spilling to zarr under memory pressure.

TPU-first shape: the model forward (+softmax+resize+crop) is one fused
device program per batch; only compact probability patches cross to the
host, which scatters them into a (RAM or zarr-backed) canvas chosen by
``create_smart_array``. Overlapping strides average by construction.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tiatoolbox_tpu.models.dataset import WSIPatchDataset
from tiatoolbox_tpu.models.engine.engine_abc import EngineABC, _progress
from tiatoolbox_tpu.models.engine.io_config import IOSegmentorConfig
from tiatoolbox_tpu.parallel import BatchLoader
from tiatoolbox_tpu.utils.zarrlite import create_smart_array


class SemanticSegmentorRunParams(dict):
    """``SemanticSegmentor.run`` keyword arguments: EngineABCRunParams
    plus memory_threshold (RAM fraction before zarr spill)."""


class SemanticSegmentor(EngineABC):
    """WSI semantic segmentation with tiled stitching.

    Run parameters add ``output_resolution`` handling via the
    IOSegmentorConfig (patch_output_shape, save_resolution).
    """

    def __init__(
        self,
        model,
        weights=None,
        batch_size: int = 8,
        num_loader_workers: int = 8,
        device: str | None = None,
        *,
        verbose: bool = True,
    ) -> None:
        super().__init__(
            model=model,
            weights=weights,
            batch_size=batch_size,
            num_loader_workers=num_loader_workers,
            device=device,
            verbose=verbose,
        )
        self.cache_dir: Path | None = None
        self.memory_threshold = 0.5  # fraction of free RAM before zarr spill
        # Wire dtype for fetching the device-stitched canvas to host:
        # "float32" (exact) or "float16" (half the device→host bytes;
        # ≤6e-4 probability quantization, well under stitch-seam noise).
        self.canvas_wire_dtype = "float32"
        # Region-once wire transfer: "auto" ships decoded slide BANDS
        # once and patchifies on device when the grid is regular and the
        # device canvas is in use (overlapping strides stop paying the
        # link (patch/stride)^2 times). True forces, False disables.
        self.region_feed = "auto"
        # Band wire format: "rgb" ships raw uint8 (3 B/px, exact);
        # "yuv420" packs full-range BT.601 4:2:0 planes (1.5 B/px —
        # half the wire bytes; ≤2 LSB round-trip error, unpacked on
        # device; see ops/colorconv.py). Wire is the dominant segmentor
        # stage on tunneled links, so the bench runs yuv420.
        self.band_wire = "rgb"
        # Per-stage wall seconds of the last WSI inference (decode /
        # wire / dispatch-wall / fetch ...), for benches and tuning.
        self.last_stage_summary: dict | None = None

    _RUN_PARAMS = (
        *EngineABC._RUN_PARAMS, "memory_threshold", "canvas_wire_dtype",
        "region_feed", "band_wire",
    )

    # -- data -------------------------------------------------------------------

    def get_dataloader(
        self,
        images,
        masks=None,
        labels=None,
        ioconfig=None,
        *,
        patch_mode: bool = True,
    ) -> BatchLoader:
        if patch_mode:
            return super().get_dataloader(
                images, masks, labels, ioconfig, patch_mode=True
            )
        ioconfig = ioconfig or self._ioconfig
        resolution_dict = ioconfig.highest_input_resolution
        patch_in_wh = tuple(int(v) for v in np.array(ioconfig.patch_input_shape)[::-1])
        patch_out = getattr(ioconfig, "patch_output_shape", None)
        patch_out_wh = (
            tuple(int(v) for v in np.array(patch_out)[::-1]) if patch_out is not None else None
        )
        stride = ioconfig.stride_shape
        stride_wh = tuple(int(v) for v in np.array(stride)[::-1])
        dataset = WSIPatchDataset(
            img_path=images,
            mode="wsi",
            mask_path=masks,
            patch_input_shape=patch_in_wh,
            stride_shape=stride_wh,
            resolution=resolution_dict["resolution"],
            units=resolution_dict["units"],
            min_mask_ratio=self.min_mask_ratio,
            preproc_func=self.model.preproc_func,
            patch_output_shape=patch_out_wh,
            auto_get_mask=self.auto_get_mask,
            wsireader_kwargs=self.wsireader_kwargs,
        )
        return BatchLoader(
            dataset,
            batch_size=self.batch_size,
            num_workers=self.num_loader_workers,
        )

    # -- inference + merge ---------------------------------------------------------

    def infer_wsi(self, dataloader: BatchLoader) -> dict:
        """Run the device program over the grid and stitch the canvas."""
        dataset: WSIPatchDataset = dataloader.dataset
        ioconfig = self._ioconfig

        # Canvas geometry: slide dims at the (single) output resolution.
        out_res = (
            ioconfig.output_resolutions[0]
            if ioconfig.output_resolutions
            else ioconfig.highest_input_resolution
        )
        canvas_wh = dataset.reader.slide_dimensions(
            out_res["resolution"], out_res["units"]
        )
        # scale output coords (at input-read resolution) onto the canvas
        read_wh = np.array(
            dataset.reader.slide_dimensions(dataset.resolution, dataset.units),
            dtype=float,
        )
        coord_scale = np.array(canvas_wh, dtype=float) / read_wh

        # ONE single-sample probe learns the model's output patch shape
        # and channel count (each probe costs a decode + a device
        # round-trip — the eligibility check and both stitch paths
        # reuse this result). Cached per (module, input patch shape):
        # output GEOMETRY cannot change under a weight swap, and the
        # probe round-trip costs ~0.1 s per run on tunneled links.
        probe = self._probe_output(dataset)
        n_channels = int(probe.shape[-1])

        # Device-resident stitching when the canvas comfortably fits HBM
        # and the grid is uniform (one scatter program, no host copies
        # of probability patches).
        if self._can_use_device_canvas(
            dataset, canvas_wh, n_channels, coord_scale, probe=probe
        ):
            plan = self._region_feed_plan(dataset)
            if plan is not None:
                return self._infer_wsi_device_canvas_region(
                    dataloader, canvas_wh, n_channels, coord_scale,
                    probe=probe, plan=plan,
                )
            return self._infer_wsi_device_canvas(
                dataloader, canvas_wh, n_channels, coord_scale, probe=probe
            )

        canvas = create_smart_array(
            (canvas_wh[1], canvas_wh[0], n_channels),
            np.float32,
            save_dir=self.cache_dir,
            memory_fraction=self.memory_threshold,
            name="canvas",
        )
        count = create_smart_array(
            (canvas_wh[1], canvas_wh[0], 1),
            np.float32,
            save_dir=self.cache_dir,
            memory_fraction=self.memory_threshold,
            name="count",
        )

        outputs_arr = dataset.outputs
        # Full (unclipped) cell size in canvas space: edge cells only
        # ever shrink, so the max over the grid is the interior size.
        # Edge patches resize to THIS size (when the model's output
        # scale differs) and are then cropped — never squashed into the
        # clipped extent.
        all_sizes = np.round(
            (outputs_arr[:, 2:] - outputs_arr[:, :2]).astype(float)
            * np.asarray(coord_scale)
        ).astype(int)
        full_w = int(all_sizes[:, 0].max())
        full_h = int(all_sizes[:, 1].max())
        # Staged host→HBM copies overlap the forwards; the fetch dtype
        # follows canvas_wire_dtype (f16 halves device→host bytes, the
        # binding term for probability maps on slow links).
        f16_wire = str(self.canvas_wire_dtype) in ("float16", "f16", "fp16")
        batch_iter = dataloader.iter_staged(
            self.model.stage_batch, int(getattr(self, "transfer_threads", 2))
        )
        for batch in _progress(
            batch_iter, verbose=self.verbose, desc="infer-wsi",
            total=len(dataloader),
        ):
            probs_dev = self.model.infer_batch_device(
                self.model, batch["image"], self.device
            )
            if f16_wire:
                import jax.numpy as jnp

                probs = np.asarray(probs_dev.astype(jnp.float16)).astype(
                    np.float32
                )
            else:
                probs = np.asarray(probs_dev, dtype=np.float32)
            n_valid = batch["n_valid"]
            indices = batch["indices"][:n_valid]
            for i, ds_idx in enumerate(indices):
                out_coords = outputs_arr[ds_idx].astype(float)
                x0, y0, x1, y1 = (
                    out_coords * np.tile(coord_scale, 2)
                ).round().astype(int)
                patch = probs[i]
                ph, pw = patch.shape[:2]
                if (y1 - y0, x1 - x0) != (ph, pw) and (y1 - y0) > 0 and (x1 - x0) > 0:
                    if (ph, pw) != (full_h, full_w):
                        # model output scale differs from the canvas
                        # grid: resize to the FULL cell size first
                        from tiatoolbox_tpu.utils.transforms import imresize

                        patch = imresize(patch, output_size=(full_w, full_h))
                        if patch.ndim == 2:
                            patch = patch[:, :, None]
                    # boundary-clipped cells are then CROPPED (reference
                    # merge semantics; matches the device-canvas path)
                    patch = patch[: y1 - y0, : x1 - x0]
                    ph, pw = patch.shape[:2]
                # clip to canvas
                cx1, cy1 = min(x1, canvas_wh[0]), min(y1, canvas_wh[1])
                if cx1 <= x0 or cy1 <= y0:
                    continue
                patch = patch[: cy1 - y0, : cx1 - x0]
                canvas[y0:cy1, x0:cx1] = canvas[y0:cy1, x0:cx1] + patch
                count[y0:cy1, x0:cx1] = count[y0:cy1, x0:cx1] + 1.0

        # Normalize in row blocks (bounded memory).
        block = 2048
        h = canvas.shape[0]
        for y0 in range(0, h, block):
            y1 = min(y0 + block, h)
            c = np.asarray(canvas[y0:y1])
            n = np.asarray(count[y0:y1])
            canvas[y0:y1] = c / np.maximum(n, 1.0)

        self.last_stage_summary = {"path": "host-canvas"}
        return {"probabilities": canvas}

    def _probe_output(self, dataset):
        """Single-sample model output (shape/channel probe), cached per
        (module, input patch shape) — geometry is weight-independent."""
        key = (
            id(getattr(self.model, "module", self.model)),
            tuple(np.asarray(dataset.patch_input_shape).tolist()),
        )
        cache = getattr(self, "_probe_cache", None)
        if cache is None:
            cache = self._probe_cache = {}
        if key not in cache:
            out = self.model.infer_batch(
                self.model, dataset[0]["image"][None], self.device
            )
            if isinstance(out, (tuple, list)):
                cache[key] = tuple(np.asarray(o) for o in out)
            else:
                cache[key] = np.asarray(out)
        return cache[key]

    # device-canvas threshold: canvas + count must stay well under HBM
    DEVICE_CANVAS_MAX_PIXELS = 3000 * 3000  # fallback when HBM stats absent

    def _device_canvas_budget_bytes(self) -> int:
        """HBM budget for the device canvas: 25% of free HBM when the
        runtime exposes memory stats, else a conservative constant."""
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            free = stats["bytes_limit"] - stats["bytes_in_use"]
            return int(free * 0.25)
        except (AttributeError, KeyError, TypeError, IndexError, RuntimeError):
            return self.DEVICE_CANVAS_MAX_PIXELS * 16

    def _can_use_device_canvas(
        self, dataset, canvas_wh, n_channels: int, coord_scale, probe=None
    ) -> bool:
        if getattr(self.model, "mesh", None) is not None:
            return False  # dp runs keep host stitching for now
        n_pixels = int(canvas_wh[0]) * int(canvas_wh[1])
        if n_pixels * (n_channels + 1) * 4 > self._device_canvas_budget_bytes():
            return False
        # uniform grid: every INTERIOR output cell must equal the
        # model's output patch size in canvas space (no per-patch
        # resize). Edge cells clipped by the slide boundary are fine —
        # the scatter targets a padded canvas that is cropped (on
        # device) before the fetch, so the out-of-slide remainder of an
        # edge patch never reaches the host.
        if probe is None:
            sample = dataset[0]["image"]
            probe = self.model.infer_batch(self.model, sample[None], self.device)
        probe = np.asarray(probe)
        ph, pw = probe.shape[1:3]
        cells = dataset.outputs.astype(float) * np.tile(coord_scale, 2)
        sizes = np.round(cells[:, 2:] - cells[:, :2]).astype(int)
        full = (sizes[:, 0] == pw) & (sizes[:, 1] == ph)
        touches_edge = (
            np.round(cells[:, 2]).astype(int) >= int(canvas_wh[0])
        ) | (np.round(cells[:, 3]).astype(int) >= int(canvas_wh[1]))
        clipped_ok = (sizes[:, 0] <= pw) & (sizes[:, 1] <= ph) & touches_edge
        # every cell is either full-size or clipped against the boundary
        return bool(np.all(full | clipped_ok))

    def _region_feed_plan(self, dataset):
        """BandPlan for region-once wire transfer, or None when the
        per-patch feed must be used (mask-filtered grids, per-patch
        preproc hooks, irregular grids, or stride >= patch)."""
        if self.region_feed is False or str(self.region_feed) == "False":
            return None
        from tiatoolbox_tpu.models.models_abc import ModelABC
        from tiatoolbox_tpu.ops.region import BandPlan

        if len(dataset.inputs) != len(getattr(dataset, "full_inputs", ())):
            return None  # masked grids have holes; band indexing breaks
        preproc = getattr(dataset, "preproc_func", None)
        if preproc is not None and preproc is not ModelABC.preproc:
            return None  # per-patch host preproc can't run on-device
        inputs = np.asarray(dataset.inputs)
        min_bands = 6
        if str(getattr(self, "band_wire", "rgb")) == "auto":
            # Band count rides the link regime: each band pays one
            # per-transfer latency (3-50 ms measured, relay-state
            # dependent), so a band's payload should dwarf it —
            # bandwidth-starved links still want depth for decode/put
            # pipelining (capped at 6).
            from tiatoolbox_tpu.parallel.pipeline import probe_link

            p = probe_link()
            ext = inputs[:, 2:].max(axis=0) - inputs[:, :2].min(axis=0)
            total_bytes = float(ext[0]) * float(ext[1]) * 3
            lat_bytes = 4 * p["latency_s"] * p["bw_mb_per_sec"] * 1e6
            min_bands = int(np.clip(total_bytes / max(lat_bytes, 1.0), 1, 6))
        return BandPlan.build(
            inputs,
            patch_wh=dataset.patch_input_shape,
            stride_wh=dataset.stride_shape,
            min_bands=min_bands,
        )

    def _iter_band_batches(self, dataset, plan, timer, batch_size: int):
        """Yield ``(ds_indices, device_patches, n_valid, band_index)``
        per batch from a once-shipped band feed.

        Host threads decode+stage band i+1/i+2 while the device works
        on band i (deque window of 3); each unique slide row crosses
        the link once (plus a (patch-stride)-row halo per band seam).
        Shared by the semantic and multitask device-canvas paths so
        prefetch depth / timer attribution changes stay in one place.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        import jax

        from tiatoolbox_tpu.ops.region import extract_patches

        wire = str(getattr(self, "band_wire", "rgb"))
        if wire == "auto":
            # yuv420 trades ~10 ms/MPix of host pack CPU for half the
            # wire bytes: a win only when the link is the binding term.
            # cv2 packs rgb at ~100 MB/s on one core, so the crossover
            # sits near packrate/2; probe the live link and pick.
            from tiatoolbox_tpu.parallel.pipeline import probe_link_mb_per_sec

            wire = "yuv420" if probe_link_mb_per_sec() < 80.0 else "rgb"
        self._resolved_band_wire = wire
        use_yuv = wire == "yuv420"
        if use_yuv:
            from tiatoolbox_tpu.ops.colorconv import (
                rgb_image_to_yuv420,
                unpack_yuv420_band,
            )

        def read_and_stage(band):
            with timer.stage("decode", items=band.band_w * band.band_h):
                img = dataset.reader.read_rect(
                    location=(band.read_x, band.read_y),
                    size=(band.band_w, band.band_h),
                    resolution=dataset.resolution,
                    units=dataset.units,
                    coord_space="resolution",
                )
            if use_yuv:
                # pack on the staging thread (cv2 releases the GIL),
                # halving the band's wire bytes; unpacked on device
                with timer.stage("pack", items=img.nbytes):
                    img = rgb_image_to_yuv420(img)
            with timer.stage("wire", items=img.nbytes):
                # async on purpose: the put's ready-event enqueues
                # BEHIND all queued executions on the relay's single
                # stream, so awaiting it here would lock staging to the
                # compute cadence; in-flight volume is bounded by the
                # staging window (~3 bands). The stage records submit
                # time only — the transfer itself rides under compute.
                dev = jax.device_put(np.ascontiguousarray(img))
            return dev

        bands = plan.bands
        patch_hw = (plan.patch_h, plan.patch_w)
        inflight: deque = deque()
        bi = 0
        progress_iter = iter(_progress(
            range(len(bands)), verbose=self.verbose, desc="infer-wsi(bands)",
            total=len(bands),
        ))
        # band staging parallelism follows the engine's transfer_threads
        # (bands are small buffers — per-put dispatch overhead dominates
        # at 2 streams; measured 21.9 MB/s vs ~40 at 4 streams)
        n_stage = max(2, int(getattr(self, "transfer_threads", 2)))
        window = n_stage + 1
        with ThreadPoolExecutor(n_stage) as pool:
            band_i = 0
            while bi < len(bands) or inflight:
                while bi < len(bands) and len(inflight) < window:
                    inflight.append(
                        (bands[bi], pool.submit(read_and_stage, bands[bi]))
                    )
                    bi += 1
                band, fut = inflight.popleft()
                dev = fut.result()
                if use_yuv:
                    dev = unpack_yuv420_band(dev, (band.band_h, band.band_w))
                n = len(band.ds_indices)
                for c0 in range(0, n, batch_size):
                    idx = band.ds_indices[c0 : c0 + batch_size]
                    n_valid = len(idx)
                    starts = np.zeros((batch_size, 2), np.int32)
                    starts[:n_valid] = band.starts_local[c0 : c0 + batch_size]
                    patches = extract_patches(dev, starts, patch_hw)
                    yield idx, patches, n_valid, band_i
                del dev
                band_i += 1
                next(progress_iter, None)

    def _make_normalized_block_fn(
        self, canvas, w: int, out_dtype=None, transform=None
    ):
        """``(y0, block_h) -> device rows`` of the count-normalized,
        width-cropped canvas, optionally mapped through a (traceable)
        pointwise ``transform`` and cast; one jit program per block_h
        (at most two: body + tail)."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        programs: dict = {}

        def block_fn(y0: int, block_h: int):
            prog = programs.get(block_h)
            if prog is None:
                @jax.jit
                def prog(c, n, y):
                    cs = lax.dynamic_slice(
                        c, (y, 0, 0), (block_h, c.shape[1], c.shape[2])
                    )
                    ns = lax.dynamic_slice(
                        n, (y, 0, 0), (block_h, n.shape[1], 1)
                    )
                    out = (cs / jnp.maximum(ns, 1.0))[:, :w]
                    if transform is not None:
                        out = transform(out)
                    if out_dtype is not None:
                        out = out.astype(out_dtype)
                    return out

                programs[block_h] = prog
            return prog(canvas.canvas, canvas.count, np.int32(y0))

        return block_fn

    def _infer_wsi_device_canvas_region(
        self, dataloader: BatchLoader, canvas_wh, n_channels: int, coord_scale,
        probe, plan,
    ) -> dict:
        """Device-canvas stitch fed by once-shipped slide bands.

        Up-transfers (bands) and the down-transfer (canvas) strictly
        phase-separate. Measured on the tunneled v5e: a device→host
        fetch in flight blocks host→device puts ENTIRELY (0 MB/s), so
        the r4 mid-loop "hidden" row-block drain never overlapped
        anything (``bytes_hidden: 0`` in every capture) while paying a
        per-block transfer latency (3-50 ms each, relay-state
        dependent). The canvas now leaves in ONE fused
        normalize+crop+cast program and ONE fetch.
        """
        import time as _time

        import jax.numpy as jnp

        from tiatoolbox_tpu.ops.canvas import DeviceCanvas
        from tiatoolbox_tpu.utils.profiling import StageTimer

        dataset = dataloader.dataset
        outputs_arr = dataset.outputs
        probe = np.asarray(probe)
        ph_out, pw_out = probe.shape[1:3]
        starts_canvas = np.round(
            outputs_arr[:, :2].astype(float) * coord_scale
        ).astype(np.int32)
        pad_h = max(int(canvas_wh[1]), int(starts_canvas[:, 1].max()) + ph_out)
        pad_w = max(int(canvas_wh[0]), int(starts_canvas[:, 0].max()) + pw_out)
        canvas = DeviceCanvas((pad_h, pad_w), n_channels)
        timer = StageTimer()

        h, w = int(canvas_wh[1]), int(canvas_wh[0])
        f16 = str(self.canvas_wire_dtype) in ("float16", "f16", "fp16")

        batch_size = self.batch_size
        t_loop = _time.perf_counter()
        bands = plan.bands
        for idx, patches, n_valid, _band_i in self._iter_band_batches(
            dataset, plan, timer, batch_size
        ):
            probs = self.model.infer_batch_device(
                self.model, patches, self.device
            )
            positions = np.zeros((batch_size, 2), np.int32)
            positions[:n_valid] = starts_canvas[idx][:, [1, 0]]
            valid = np.arange(batch_size) < n_valid
            canvas.add(probs, positions, valid)
        timer.add("dispatch-wall", _time.perf_counter() - t_loop)

        with timer.stage("fetch", items=h * w * n_channels):
            block_fn = self._make_normalized_block_fn(
                canvas, w, jnp.float16 if f16 else jnp.float32
            )
            fetched = np.asarray(block_fn(0, h)).astype(
                np.float32, copy=False
            )
        summary = timer.summary()
        summary["path"] = "device-canvas+region-feed"
        summary["wire_pixels"] = plan.wire_pixels
        summary["n_bands"] = len(bands)
        summary["band_wire"] = getattr(
            self, "_resolved_band_wire", self.band_wire
        )
        self.last_stage_summary = summary
        return {"probabilities": fetched}

    def _fetch_canvas(self, canvas, h: int, w: int) -> np.ndarray:
        """Normalize on device, crop, and fetch with concurrent row-chunk
        copies (the single-stream device→host drain is the binding term
        for whole-canvas fetches on tunneled links)."""
        from tiatoolbox_tpu.parallel.pipeline import fetch_chunked

        if str(self.canvas_wire_dtype) in ("float16", "f16", "fp16"):
            import jax.numpy as jnp

            dev = canvas.normalized(jnp.float16)[:h, :w]
            return fetch_chunked(dev, dtype=np.float32)
        return fetch_chunked(canvas.normalized()[:h, :w])

    def _fetch_canvas_async(self, canvas, h: int, w: int):
        """Background-drain variant of ``_fetch_canvas``: returns the
        (still-filling) host buffer plus its row watermark so callers
        can overlap host post-processing with the device→host drain."""
        from tiatoolbox_tpu.parallel.pipeline import fetch_chunked_async

        if str(self.canvas_wire_dtype) in ("float16", "f16", "fp16"):
            import jax.numpy as jnp

            dev = canvas.normalized(jnp.float16)[:h, :w]
            return fetch_chunked_async(dev, dtype=np.float32)
        return fetch_chunked_async(canvas.normalized()[:h, :w])

    def _infer_wsi_device_canvas(
        self, dataloader: BatchLoader, canvas_wh, n_channels: int, coord_scale,
        probe=None,
    ) -> dict:
        """Stitch on device: scatter-accumulate each batch in HBM."""
        from tiatoolbox_tpu.ops.canvas import DeviceCanvas

        dataset = dataloader.dataset
        outputs_arr = dataset.outputs
        # Padded canvas: edge patches scatter past the slide boundary;
        # the pad region is cropped ON DEVICE before the fetch.
        if probe is None:
            probe = self.model.infer_batch(
                self.model, dataset[0]["image"][None], self.device
            )
        probe = np.asarray(probe)
        ph, pw = probe.shape[1:3]
        starts = np.round(
            outputs_arr[:, :2].astype(float) * coord_scale
        ).astype(int)
        pad_h = max(int(canvas_wh[1]), int(starts[:, 1].max()) + ph)
        pad_w = max(int(canvas_wh[0]), int(starts[:, 0].max()) + pw)
        canvas = DeviceCanvas((pad_h, pad_w), n_channels)
        import time as _time

        from tiatoolbox_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        t_loop = _time.perf_counter()
        # staged feed: concurrent host→HBM copies overlap the scatters
        batch_iter = dataloader.iter_staged(
            self.model.stage_batch, int(getattr(self, "transfer_threads", 2))
        )
        wire_pixels = 0
        for batch in _progress(
            batch_iter, verbose=self.verbose, desc="infer-wsi",
            total=len(dataloader),
        ):
            probs = self.model.infer_batch_device(
                self.model, batch["image"], self.device
            )
            n_valid = batch["n_valid"]
            batch_size = batch["image"].shape[0]
            wire_pixels += int(np.prod(batch["image"].shape[:3]))
            indices = np.asarray(batch["indices"])[:n_valid]
            coords = outputs_arr[indices].astype(float) * np.tile(coord_scale, 2)
            # pad to the fixed batch shape (tail batches carry padding)
            positions = np.zeros((batch_size, 2), np.int32)
            positions[:n_valid] = np.round(coords[:, [1, 0]]).astype(np.int32)
            valid = np.arange(batch_size) < n_valid
            canvas.add(probs, positions, valid)
        timer.add("decode+wire+dispatch-wall", _time.perf_counter() - t_loop)
        h, w = int(canvas_wh[1]), int(canvas_wh[0])
        with timer.stage("fetch", items=h * w * n_channels):
            fetched = self._fetch_canvas(canvas, h, w)
        summary = timer.summary()
        summary["path"] = "device-canvas"
        summary["wire_pixels"] = wire_pixels
        self.last_stage_summary = summary
        return {"probabilities": fetched}

    # -- postproc/save ----------------------------------------------------------------

    def post_process_wsi(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        probs = raw_predictions["probabilities"]
        # argmax in row blocks to bound memory for zarr-backed canvases
        h = probs.shape[0]
        block = 2048
        preds = np.empty((h, probs.shape[1]), dtype=np.uint8)
        for y0 in range(0, h, block):
            y1 = min(y0 + block, h)
            preds[y0:y1] = np.argmax(np.asarray(probs[y0:y1]), axis=-1)
        out = dict(raw_predictions)
        out["predictions"] = preds
        return out

    def save_predictions(
        self,
        processed_predictions: dict,
        output_type: str,
        save_dir=None,
        output_file: str | None = None,
        **kwargs,
    ):
        if output_type.lower() in ("ome-tiff", "ome_tiff"):
            from tiatoolbox_tpu.utils.misc import (
                write_probability_heatmap_as_ome_tiff,
            )

            out_path = Path(save_dir) / (output_file or "heatmap.ome.tiff")
            probs = np.asarray(processed_predictions["probabilities"])
            heat = probs[..., 1] if probs.ndim == 3 and probs.shape[-1] > 1 else probs
            return write_probability_heatmap_as_ome_tiff(out_path, heat)
        if output_type.lower() == "annotationstore":
            from tiatoolbox_tpu.utils.store_conversion import (
                dict_to_store_semantic_segmentor,
            )

            out_path = Path(save_dir) / (output_file or "output.db")
            return dict_to_store_semantic_segmentor(
                processed_predictions,
                scale_factor=kwargs.get("scale_factor", (1.0, 1.0)),
                class_dict=self.class_dict,
                save_path=out_path,
            )
        if output_type.lower() == "zarr":
            from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

            out_path = Path(save_dir) / (output_file or "output.zarr")
            group = ZarrGroup.create(out_path)
            for key, value in processed_predictions.items():
                from tiatoolbox_tpu.utils.zarrlite import ZarrArray

                if isinstance(value, ZarrArray):
                    # move/copy block-wise
                    dest = group.create_array(
                        key, shape=value.shape, dtype=value.dtype
                    )
                    blk = value.chunks[0]
                    for y0 in range(0, value.shape[0], blk):
                        y1 = min(y0 + blk, value.shape[0])
                        dest[y0:y1] = value[y0:y1]
                else:
                    group.from_array(key, np.asarray(value))
            return out_path
        return processed_predictions

    def _run_wsi_mode(self, output_type: str, save_dir, **kwargs):
        if save_dir is not None:
            self.cache_dir = Path(save_dir) / "cache"
            self.cache_dir.mkdir(parents=True, exist_ok=True)
        try:
            return super()._run_wsi_mode(output_type, save_dir, **kwargs)
        finally:
            if self.cache_dir is not None:
                import shutil

                shutil.rmtree(self.cache_dir, ignore_errors=True)
                self.cache_dir = None

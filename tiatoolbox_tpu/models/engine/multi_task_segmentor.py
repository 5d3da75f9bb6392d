"""Multi-head (instance) segmentation engine.

Reference: ``models/engine/multi_task_segmentor.py`` (3.8k LoC). The
HoVer-Net-family forward runs as one fused device program per batch;
per-head probability canvases are stitched like the semantic engine;
instance post-processing (watershed + contours, host-side) runs either
on the full merged maps (small WSIs) or tile-by-tile using the
reference's 4-pass scheme (``_get_tile_info`` :1362-1553 and
``_process_instance_predictions`` :2833-3040): grid tiles, vertical
and horizontal boundary strips, and cross-section tiles, each with
per-side removal flags so every instance is owned by exactly one pass.
"""

from __future__ import annotations

import uuid
from pathlib import Path

import numpy as np

from tiatoolbox_tpu import logger
from tiatoolbox_tpu.models.engine.engine_abc import _progress
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor
from tiatoolbox_tpu.parallel import BatchLoader
from tiatoolbox_tpu.utils.zarrlite import create_smart_array


class MultiTaskSegmentorRunParams(dict):
    """``MultiTaskSegmentor.run`` keyword arguments: semantic-segmentor
    params plus return_predictions (per-task dense outputs)."""


class MultiTaskSegmentor(SemanticSegmentor):
    """Engine for multi-head models producing instance segmentations.

    The model's ``infer_batch`` must return a tuple of per-head maps
    (e.g. HoVerNet: np, hv[, tp]) and its ``postproc`` must map merged
    head maps → instance results.
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
        # tile-mode postproc geometry (reference tile_shape/margin)
        self.tile_shape = (2048, 2048)
        self.margin = 128
        self.full_postproc_limit = 4096 * 4096  # px; above → tile mode
        # reference MultiTaskSegmentorRunParams: also return the
        # stitched per-task dense maps
        self.return_predictions = False

    _RUN_PARAMS = (
        *SemanticSegmentor._RUN_PARAMS, "return_predictions",
        "drain_during_loop",
    )

    # -- inference + merge -----------------------------------------------------------

    def infer_wsi(self, dataloader: BatchLoader) -> dict:
        self._pending_fetch = None  # drop any stale async-drain handle
        dataset = dataloader.dataset
        ioconfig = self._ioconfig
        out_res = (
            ioconfig.output_resolutions[0]
            if ioconfig.output_resolutions
            else ioconfig.highest_input_resolution
        )
        canvas_wh = dataset.reader.slide_dimensions(
            out_res["resolution"], out_res["units"]
        )
        read_wh = np.array(
            dataset.reader.slide_dimensions(dataset.resolution, dataset.units),
            dtype=float,
        )
        coord_scale = np.array(canvas_wh, dtype=float) / read_wh

        # Probe head count/channels with one patch (cached per module +
        # patch shape — see SemanticSegmentor._probe_output).
        probe = self._probe_output(dataset)
        if not isinstance(probe, (tuple, list)):
            probe = (probe,)
        n_heads = len(probe)
        head_channels = [int(np.asarray(p).shape[-1]) for p in probe]

        # Device-resident multi-head stitching: every head shares the
        # model's output patch geometry, so all heads stack into ONE
        # C=sum(channels) HBM canvas, scattered per batch and fetched
        # once at the end (instead of per-batch per-head host copies).
        if self._can_use_multihead_device_canvas(
            dataset, canvas_wh, head_channels, coord_scale, probe
        ):
            return self._infer_wsi_device_canvas_multihead(
                dataloader, canvas_wh, head_channels, coord_scale, probe
            )

        canvases = [
            create_smart_array(
                (canvas_wh[1], canvas_wh[0], c),
                np.float32,
                save_dir=self.cache_dir,
                memory_fraction=self.memory_threshold,
                name=f"head{i}",
            )
            for i, c in enumerate(head_channels)
        ]
        count = create_smart_array(
            (canvas_wh[1], canvas_wh[0], 1),
            np.float32,
            save_dir=self.cache_dir,
            memory_fraction=self.memory_threshold,
            name="count",
        )

        outputs_arr = dataset.outputs
        import time as _time

        from tiatoolbox_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        t_loop = _time.perf_counter()
        # Staged host→HBM copies overlap the forwards; device outputs
        # are fetched per batch at the canvas wire dtype (f16 halves
        # the head-map bytes on slow links; exact for tp argmax values).
        f16_wire = str(self.canvas_wire_dtype) in ("float16", "f16", "fp16")

        def _fetch(h):
            import jax

            if f16_wire and isinstance(h, jax.Array):
                import jax.numpy as jnp

                return np.asarray(h.astype(jnp.float16)).astype(np.float32)
            return np.asarray(h, np.float32)

        batch_iter = dataloader.iter_staged(
            self.model.stage_batch, int(getattr(self, "transfer_threads", 2))
        )
        for batch in _progress(
            batch_iter, verbose=self.verbose, desc="infer-wsi",
            total=len(dataloader),
        ):
            heads = self.model.infer_batch_device(
                self.model, batch["image"], self.device
            )
            if not isinstance(heads, (tuple, list)):
                heads = (heads,)
            heads = [_fetch(h) for h in heads]
            n_valid = batch["n_valid"]
            indices = batch["indices"][:n_valid]
            # model output patch size may differ from grid cell
            out_hw = heads[0].shape[1:3]
            for i, ds_idx in enumerate(indices):
                oc = outputs_arr[ds_idx].astype(float)
                # centre the model output in the output grid cell
                cell_w = oc[2] - oc[0]
                cell_h = oc[3] - oc[1]
                off_x = (cell_w - out_hw[1]) / 2
                off_y = (cell_h - out_hw[0]) / 2
                x0 = int(round((oc[0] + off_x) * coord_scale[0]))
                y0 = int(round((oc[1] + off_y) * coord_scale[1]))
                x1 = x0 + out_hw[1]
                y1 = y0 + out_hw[0]
                sx0, sy0 = max(0, -x0), max(0, -y0)
                cx1, cy1 = min(x1, canvas_wh[0]), min(y1, canvas_wh[1])
                cx0, cy0 = max(x0, 0), max(y0, 0)
                if cx1 <= cx0 or cy1 <= cy0:
                    continue
                for h_idx, head in enumerate(heads):
                    patch = head[i][
                        sy0 : sy0 + (cy1 - cy0), sx0 : sx0 + (cx1 - cx0)
                    ]
                    canvases[h_idx][cy0:cy1, cx0:cx1] = (
                        canvases[h_idx][cy0:cy1, cx0:cx1] + patch
                    )
                count[cy0:cy1, cx0:cx1] = count[cy0:cy1, cx0:cx1] + 1.0

        timer.add(
            "feed+forward+fetch+stitch", _time.perf_counter() - t_loop
        )
        with timer.stage("normalize"):
            block = 2048
            h = count.shape[0]
            for y0 in range(0, h, block):
                y1 = min(y0 + block, h)
                n = np.maximum(np.asarray(count[y0:y1]), 1.0)
                for canvas in canvases:
                    canvas[y0:y1] = np.asarray(canvas[y0:y1]) / n

        self.last_stage_summary = timer.summary()
        self.last_stage_summary["path"] = "multitask-host-stitch"
        return {"head_maps": canvases, "canvas_wh": canvas_wh}

    # -- device-resident multi-head stitching ------------------------------------------

    def _multihead_positions(self, dataset, probe, coord_scale) -> np.ndarray:
        """Canvas-space (y, x) scatter positions: model output centred in
        each output grid cell (host-merge parity)."""
        out_hw = np.asarray(probe[0]).shape[1:3]
        oc = dataset.outputs.astype(float)
        off_x = (oc[:, 2] - oc[:, 0] - out_hw[1]) / 2
        off_y = (oc[:, 3] - oc[:, 1] - out_hw[0]) / 2
        x0 = np.round((oc[:, 0] + off_x) * coord_scale[0]).astype(np.int32)
        y0 = np.round((oc[:, 1] + off_y) * coord_scale[1]).astype(np.int32)
        return np.stack([y0, x0], axis=-1)

    def _can_use_multihead_device_canvas(
        self, dataset, canvas_wh, head_channels, coord_scale, probe
    ) -> bool:
        if getattr(self.model, "mesh", None) is not None:
            return False
        shapes = {np.asarray(p).shape[1:3] for p in probe}
        if len(shapes) != 1:
            return False  # heads at different scales: host merge
        total_ch = sum(head_channels) + 1
        n_pixels = int(canvas_wh[0]) * int(canvas_wh[1])
        if n_pixels * total_ch * 4 > self._device_canvas_budget_bytes():
            return False
        positions = self._multihead_positions(dataset, probe, coord_scale)
        return bool(positions.min() >= 0)

    def _infer_wsi_device_canvas_multihead(
        self, dataloader: BatchLoader, canvas_wh, head_channels, coord_scale,
        probe,
    ) -> dict:
        import time as _time

        import jax.numpy as jnp

        from tiatoolbox_tpu.ops.canvas import DeviceCanvas
        from tiatoolbox_tpu.utils.profiling import StageTimer

        dataset = dataloader.dataset
        probe0 = np.asarray(probe[0])
        ph, pw = probe0.shape[1:3]
        positions_all = self._multihead_positions(dataset, probe, coord_scale)
        pad_h = max(int(canvas_wh[1]), int(positions_all[:, 0].max()) + ph)
        pad_w = max(int(canvas_wh[0]), int(positions_all[:, 1].max()) + pw)
        n_channels = sum(head_channels)
        canvas = DeviceCanvas((pad_h, pad_w), n_channels)
        timer = StageTimer()

        def run_batch(images, indices, n_valid, batch_size):
            heads = self.model.infer_batch_device(self.model, images, self.device)
            if not isinstance(heads, (tuple, list)):
                heads = (heads,)
            stacked = jnp.concatenate(heads, axis=-1)
            positions = np.zeros((batch_size, 2), np.int32)
            positions[:n_valid] = positions_all[indices[:n_valid]]
            valid = np.arange(batch_size) < n_valid
            canvas.add(stacked, positions, valid)

        plan = self._region_feed_plan(dataset)
        h, w = int(canvas_wh[1]), int(canvas_wh[0])

        # Banded narrow fetch (VERDICT r4 item 4): the model's pointwise
        # postproc inputs (HoVerNet: fg/tp as uint8) drain per row-block
        # WHILE later bands are scattered; only the global-minmax energy
        # channel crosses the link after the loop. Engages under the
        # same conditions as the device-energy transform below.
        from tiatoolbox_tpu.parallel.pipeline import BlockDrain

        spec = None
        block_tf = getattr(self.model, "block_fetch_transform", None)
        final_tf = getattr(self.model, "final_fetch_transform", None)
        spec_fn = getattr(self.model, "banded_fetch_spec", None)
        if (
            plan is not None
            and block_tf is not None
            and final_tf is not None
            and spec_fn is not None
            and h * w <= self.full_postproc_limit
            and not getattr(self, "return_predictions", False)
            and getattr(self.model, "_postproc_func", None) is None
        ):
            spec = spec_fn(head_channels)
        drain = None
        if spec is not None:
            # ONE whole-canvas block: mid-loop row-block drains never
            # overlapped anything on the tunneled relay (a device→host
            # fetch in flight blocks host→device puts entirely —
            # measured 0 MB/s — so ``bytes_hidden`` was 0 in every
            # capture) while each extra block paid a 3-50 ms transfer
            # latency. Post-loop, the u8 block dispatches BEFORE the
            # energy fetch so host labeling starts while energy streams.
            n_u8, n_final = spec["n_u8"], spec["n_final"]
            drain = BlockDrain(
                self._make_normalized_block_fn(
                    canvas, w,
                    transform=lambda rows: block_tf(rows, head_channels),
                ),
                n_rows=h,
                out_shape=(h, w, n_u8),
                out_dtype=np.uint8,
                block_h=h,
            )

        t_loop = _time.perf_counter()
        if plan is not None:
            for idx, patches, n_valid, _band_i in self._iter_band_batches(
                dataset, plan, timer, self.batch_size
            ):
                run_batch(patches, idx, n_valid, self.batch_size)
            path_name = "multitask-device-canvas+region-feed"
            wire_pixels = plan.wire_pixels
        else:
            batch_iter = dataloader.iter_staged(
                self.model.stage_batch,
                int(getattr(self, "transfer_threads", 2)),
            )
            wire_pixels = 0
            for batch in _progress(
                batch_iter, verbose=self.verbose, desc="infer-wsi",
                total=len(dataloader),
            ):
                wire_pixels += int(np.prod(batch["image"].shape[:3]))
                run_batch(
                    batch["image"],
                    np.asarray(batch["indices"]),
                    batch["n_valid"],
                    batch["image"].shape[0],
                )
            path_name = "multitask-device-canvas"
        timer.add("dispatch-wall", _time.perf_counter() - t_loop)

        from tiatoolbox_tpu.parallel.pipeline import LazyRowsView

        if drain is not None:
            # u8 blocks first (postproc's label work needs fg before it
            # touches energy — hovernet.py ``_proc_np_energy`` ordering),
            # then the energy channel; both drain concurrently and the
            # host label overlaps the energy fetch.
            from tiatoolbox_tpu.parallel.pipeline import fetch_chunked_async

            drain.flush()
            fin = final_tf(canvas.normalized()[:h, :w], head_channels)
            if str(self.canvas_wire_dtype) in ("float16", "f16", "fp16"):
                fin = fin.astype(jnp.float16)
            ebuf, ewm = fetch_chunked_async(fin, dtype=np.float32)
            u8_view = LazyRowsView(drain.buf, drain.watermark, slice(0, 1))
            if spec.get("packed_tp"):
                u8_view.packed_tp = True  # model unpacks fg/tp bits
            head_maps = [
                u8_view,
                LazyRowsView(ebuf, ewm, slice(0, 1)),
            ]
            if n_u8 == 2:
                head_maps.append(
                    LazyRowsView(drain.buf, drain.watermark, slice(1, 2))
                )
            summary = timer.summary()
            summary["path"] = path_name + "+banded-u8+device-energy"
            summary["wire_pixels"] = wire_pixels
            summary["band_wire"] = getattr(
                self, "_resolved_band_wire", self.band_wire
            )
            summary["fetch-banded"] = {"items": h * w * n_u8}
            self.last_stage_summary = summary
            self._pending_fetch = (ewm, h * w * n_final)
            return {"head_maps": head_maps, "canvas_wh": canvas_wh}

        # Device-side postproc front-end (e.g. HoVerNet's Sobel energy,
        # ``ops/hv_energy.py``): when the model offers a canvas
        # transform AND postproc will run on the full canvas (tile mode
        # normalizes per tile — the transform's global minmax would
        # change results) AND the caller doesn't want the raw head maps,
        # run it in HBM and fetch the (smaller) transformed stack.
        fetch_channels = head_channels
        transform = getattr(self.model, "transform_canvas_for_postproc", None)
        use_transform = (
            transform is not None
            and h * w <= self.full_postproc_limit
            and not getattr(self, "return_predictions", False)
            # a user-supplied postproc_func expects the RAW head maps
            and getattr(self.model, "_postproc_func", None) is None
        )
        dev_final = None
        if use_transform:
            transformed = transform(canvas.normalized()[:h, :w], head_channels)
            if transformed is not None:
                dev_final, fetch_channels = transformed
                path_name += "+device-energy"
        # Async drain: post_process_wsi's tile loop gates on the row
        # watermark, so watershed/instance extraction (host CPU) runs
        # WHILE the canvas crosses the link instead of after it.
        from tiatoolbox_tpu.parallel.pipeline import LazyRowsView

        if dev_final is not None:
            from tiatoolbox_tpu.parallel.pipeline import fetch_chunked_async

            if str(self.canvas_wire_dtype) in ("float16", "f16", "fp16"):
                dev_final = dev_final.astype(jnp.float16)
                buf, watermark = fetch_chunked_async(
                    dev_final, dtype=np.float32
                )
            else:
                buf, watermark = fetch_chunked_async(dev_final)
        else:
            buf, watermark = self._fetch_canvas_async(canvas, h, w)
        head_maps = []
        c0 = 0
        for c in fetch_channels:
            head_maps.append(LazyRowsView(buf, watermark, slice(c0, c0 + c)))
            c0 += c
        summary = timer.summary()
        summary["path"] = path_name
        summary["wire_pixels"] = wire_pixels
        summary["band_wire"] = getattr(
            self, "_resolved_band_wire", self.band_wire
        )
        self.last_stage_summary = summary
        self._pending_fetch = (watermark, h * w * sum(fetch_channels))
        return {"head_maps": head_maps, "canvas_wh": canvas_wh}

    # -- instance post-processing ---------------------------------------------------------

    def post_process_patches(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        """Per-patch instance extraction (reference patch-mode path).

        ``probabilities`` holds one array per model head; each patch's
        head maps run through the model's ``postproc_func``.
        """
        heads = raw_predictions["probabilities"]
        if not isinstance(heads, (tuple, list)):
            heads = [heads]
        n_patches = len(heads[0])
        instances = []
        for i in range(n_patches):
            maps = [np.asarray(h[i]) for h in heads]
            results = self.model.postproc_func(maps)
            instances.append(self._results_to_instance_dict(results, offset=(0, 0)))
        raw_predictions["instances"] = instances
        return raw_predictions

    def post_process_wsi(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        import time as _time

        head_maps = raw_predictions["head_maps"]
        canvas_wh = raw_predictions["canvas_wh"]
        n_pixels = canvas_wh[0] * canvas_wh[1]
        semantic: dict = {}
        if hasattr(self.model, "last_postproc_seconds"):
            self.model.last_postproc_seconds = None  # reset accumulation
        t0 = _time.perf_counter()
        if n_pixels <= self.full_postproc_limit:
            if (
                getattr(self.model, "postproc_accepts_views", False)
                and getattr(self.model, "_postproc_func", None) is None
            ):
                # pass still-draining views through: the model's
                # postproc materializes them in label-before-energy
                # order, overlapping host work with the canvas drain
                maps = list(head_maps)
            else:
                maps = [np.asarray(m) for m in head_maps]
            results = self.model.postproc_func(maps)
            instances = self._results_to_instance_dict(results, offset=(0, 0))
            for task in results:
                if task.get("seg_type") == "semantic" and "predictions" in task:
                    semantic[task["task_type"]] = np.asarray(task["predictions"])
        else:
            instances, semantic = self._process_tile_mode(head_maps, canvas_wh)
        pending = getattr(self, "_pending_fetch", None)
        if pending is not None:
            watermark, items = pending
            self._pending_fetch = None
            watermark.wait_all()  # postproc consumed every row already
            if self.last_stage_summary is not None:
                self.last_stage_summary["fetch"] = {
                    "seconds": round(watermark.drain_seconds or 0.0, 4),
                    "items": items,
                    "overlapped_with_postproc": True,
                }
        if self.last_stage_summary is not None:
            self.last_stage_summary["instance-postproc"] = {
                "seconds": round(_time.perf_counter() - t0, 4)
            }
            sub = getattr(self.model, "last_postproc_seconds", None)
            if sub:
                for name, secs in sub.items():
                    self.last_stage_summary[name] = {"seconds": round(secs, 4)}
        out = {"instances": instances, "canvas_wh": canvas_wh}
        if semantic:
            out["semantic_predictions"] = semantic
        if getattr(self, "return_predictions", False):
            # reference MultiTaskSegmentorRunParams.return_predictions:
            # include the stitched per-task dense maps in the output
            out["predictions"] = [np.asarray(m) for m in head_maps]
        return out

    # -- reference 4-pass tile scheme --------------------------------------------------

    @staticmethod
    def _boxes_intersect(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
        """Inclusive box-vs-box intersection (shapely STRtree.query semantics)."""
        if len(boxes) == 0:
            return np.zeros(0, dtype=bool)
        return (
            (boxes[:, 0] <= query[2])
            & (boxes[:, 2] >= query[0])
            & (boxes[:, 1] <= query[3])
            & (boxes[:, 3] >= query[1])
        )

    @staticmethod
    def _boxes_contained(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
        """Boxes fully within query (shared edges allowed)."""
        if len(boxes) == 0:
            return np.zeros(0, dtype=bool)
        return (
            (boxes[:, 0] >= query[0])
            & (boxes[:, 1] >= query[1])
            & (boxes[:, 2] <= query[2])
            & (boxes[:, 3] <= query[3])
        )

    def _get_tile_info(self, image_shape) -> list:
        """Four tile sets + per-side removal flags (reference :1362-1553).

        Returns [[boxes, flags], ...] for (0) grid tiles, (1) vertical
        boundary strips, (2) horizontal boundary strips, (3)
        cross-section tiles. ``flags`` columns are [top, bottom, left,
        right]; 1 = instances in that side's margin are removed (owned
        by a later pass), unset on WSI-boundary sides.
        """
        from tiatoolbox_tpu.tools.patchextraction import PatchExtractor

        margin = self.margin
        w, h = int(image_shape[0]), int(image_shape[1])
        tile_shape = np.array(self.tile_shape, dtype=np.int32)
        boxes = PatchExtractor.get_coordinates(
            image_shape=(w, h),
            patch_input_shape=tuple(tile_shape),
            stride_shape=tuple(tile_shape),
        ).astype(np.int64)

        if w <= tile_shape[0] and h <= tile_shape[1]:
            return [[boxes, np.zeros((boxes.shape[0], 4), dtype=np.int32)]]

        edge_lines = (
            np.array([0, 0, w, 0]),  # top
            np.array([0, h, w, h]),  # bottom
            np.array([0, 0, 0, h]),  # left
            np.array([w, 0, w, h]),  # right
        )

        def unset_boundary(tile_boxes: np.ndarray, flags: np.ndarray) -> np.ndarray:
            for idx, line in enumerate(edge_lines):
                flags[self._boxes_intersect(tile_boxes, line), idx] = 0
            return flags

        flag = unset_boundary(boxes, np.ones((boxes.shape[0], 4), np.int32))
        info = [[boxes, flag]]

        # vertical strips around removed right edges: top/bottom flagged
        sel = np.nonzero(flag[:, 3])[0]
        v_boxes = np.stack(
            [
                boxes[sel, 2] - margin,
                boxes[sel, 1],
                boxes[sel, 2] + margin,
                boxes[sel, 3],
            ],
            axis=-1,
        )
        v_flag = np.zeros((v_boxes.shape[0], 4), np.int32)
        v_flag[:, [0, 1]] = 1
        info.append([v_boxes, unset_boundary(v_boxes, v_flag)])

        # horizontal strips around removed bottom edges: left/right flagged
        sel = np.nonzero(flag[:, 1])[0]
        h_boxes = np.stack(
            [
                boxes[sel, 0],
                boxes[sel, 3] - margin,
                boxes[sel, 2],
                boxes[sel, 3] + margin,
            ],
            axis=-1,
        )
        h_flag = np.zeros((h_boxes.shape[0], 4), np.int32)
        h_flag[:, [2, 3]] = 1
        info.append([h_boxes, unset_boundary(h_boxes, h_flag)])

        # cross-sections at removed bottom-right corners: all sides flagged
        sel = np.nonzero(flag[:, 1] * flag[:, 3])[0]
        x_boxes = np.stack(
            [
                boxes[sel, 2] - 2 * margin,
                boxes[sel, 3] - 2 * margin,
                boxes[sel, 2] + 2 * margin,
                boxes[sel, 3] + 2 * margin,
            ],
            axis=-1,
        )
        info.append([x_boxes, np.ones((x_boxes.shape[0], 4), np.int32)])
        return info

    def _select_tile_removals(
        self,
        inst_boxes: np.ndarray,
        tile_wh,
        tile_flag,
        tile_mode: int,
    ) -> np.ndarray:
        """Instance indices to drop within one tile (reference :2952-3013).

        Modes 0/3: drop instances fully contained in a flagged margin.
        Modes 1/2: drop instances intersecting flagged margins or
        touching unflagged tile boundaries.
        """
        width, height = tile_wh
        margin = self.margin
        boundary_lines = (
            np.array([0, 0, width, 1]),
            np.array([0, height - 1, width, height]),
            np.array([0, 0, 1, height]),
            np.array([width - 1, 0, width, height]),
        )
        margin_boxes = (
            np.array([0, 0, width, margin]),
            np.array([0, height - margin, width, height]),
            np.array([0, 0, margin, height]),
            np.array([width - margin, 0, width, height]),
        )
        removal = np.zeros(len(inst_boxes), dtype=bool)
        if tile_mode in (0, 3):
            for idx in range(4):
                if tile_flag[idx] or tile_mode == 3:
                    removal |= self._boxes_contained(inst_boxes, margin_boxes[idx])
        else:
            for idx in range(4):
                query = margin_boxes[idx] if tile_flag[idx] else boundary_lines[idx]
                removal |= self._boxes_intersect(inst_boxes, query)
        return removal

    def _margin_lines(self, tile_box) -> list:
        """Inset margin-line boxes in WSI space (reference :3014-3028)."""
        x0, y0, x1, y1 = (int(v) for v in tile_box)
        width, height = x1 - x0, y1 - y0
        m = self.margin
        lines = [
            [m, m, width - m, m],
            [m, height - m, width - m, height - m],
            [m, m, m, height - m],
            [width - m, m, width - m, height - m],
        ]
        return [np.array(line) + np.array([x0, y0, x0, y0]) for line in lines]

    def _process_tile_mode(self, head_maps, canvas_wh) -> dict:
        """Reference 4-pass tile postproc with margin-flag dedup.

        Pass 0 processes grid tiles dropping flagged-margin instances;
        passes 1/2 own the vertical/horizontal boundary bands; pass 3
        owns the cross-sections and additionally evicts previously
        accumulated instances cut by its margin lines
        (``_process_instance_predictions`` :2833-3040).
        """
        import os
        from concurrent.futures import ThreadPoolExecutor

        w, h = int(canvas_wh[0]), int(canvas_wh[1])
        instances: dict = {}
        semantic: dict = {}
        tile_sets = self._get_tile_info((w, h))

        def compute_tile(job):
            """Per-tile slice + postproc + instance extraction (pure;
            runs on worker threads — cv2/scipy/the native watershed all
            release the GIL, so tiles post-process in parallel, the
            TPU-native analogue of the reference's threaded dask batches
            ``multi_task_segmentor.py:1181-1222``)."""
            tile_box, tile_flag = job
            # slice clipped to the canvas; removal geometry uses the
            # NOMINAL bounds (reference :1256-1258 tile_shape =
            # tile_br - tile_tl from the unclipped tile info).
            nx0, ny0 = int(tile_box[0]), int(tile_box[1])
            nx1, ny1 = int(tile_box[2]), int(tile_box[3])
            x0, y0 = max(nx0, 0), max(ny0, 0)
            x1, y1 = min(nx1, w), min(ny1, h)
            if x1 <= x0 or y1 <= y0:
                return None
            maps = [np.asarray(m[y0:y1, x0:x1]) for m in head_maps]
            results = self.model.postproc_func(maps)
            tile_instances = self._results_to_instance_dict(
                results, offset=(x0 - nx0, y0 - ny0)
            )
            return (tile_flag, (nx0, ny0, nx1, ny1), (x0, y0, x1, y1),
                    results, tile_instances)

        n_workers = max(1, min(8, (os.cpu_count() or 2) - 1))
        with ThreadPoolExecutor(n_workers) as pool:
            for tile_mode, (boxes, flags) in enumerate(tile_sets):
                jobs = list(zip(boxes, flags))
                # bounded in-flight window so at most ~2*n_workers tile
                # results are resident (reference sizes its delayed
                # batches by free RAM, :2739)
                window = 2 * n_workers
                for b0 in range(0, len(jobs), window):
                    chunk = jobs[b0 : b0 + window]
                    for computed in pool.map(compute_tile, chunk):
                        if computed is None:
                            continue
                        (tile_flag, (nx0, ny0, nx1, ny1),
                         (x0, y0, x1, y1), results, tile_instances) = computed
                        self._merge_tile_results(
                            instances, semantic, results, tile_instances,
                            tile_flag, tile_mode,
                            (nx0, ny0, nx1, ny1), (x0, y0, x1, y1), (w, h),
                        )
        return instances, semantic

    def _merge_tile_results(  # noqa: PLR0913
        self, instances, semantic, results, tile_instances,
        tile_flag, tile_mode, nominal, clipped, canvas_wh,
    ) -> None:
        """Serial (ordered) merge of one tile's postproc results."""
        nx0, ny0, nx1, ny1 = nominal
        x0, y0, x1, y1 = clipped
        w, h = canvas_wh
        if tile_mode == 0:
            # grid tiles exactly cover the canvas: write semantic-task
            # predictions into full-size canvases (reference
            # _update_tile_based_predictions_array)
            for task in results:
                if (
                    task.get("seg_type") != "semantic"
                    or "predictions" not in task
                ):
                    continue
                name = task["task_type"]
                if name not in semantic:
                    semantic[name] = create_smart_array(
                        (h, w),
                        np.asarray(task["predictions"]).dtype,
                        save_dir=self.cache_dir,
                        memory_fraction=self.memory_threshold,
                        name=f"semantic_{name}",
                    )
                semantic[name][y0:y1, x0:x1] = np.asarray(
                    task["predictions"]
                )[: y1 - y0, : x1 - x0]
        if not tile_instances:
            return
        keys = list(tile_instances)
        inst_boxes = np.array(
            [np.asarray(tile_instances[k]["box"], float) for k in keys]
        )
        removal = self._select_tile_removals(
            inst_boxes, (nx1 - nx0, ny1 - ny0), tile_flag, tile_mode
        )
        if tile_mode == 3:
            # evict accumulated instances cut by this tile's margin lines
            acc_keys = list(instances)
            if acc_keys:
                acc_boxes = np.array(
                    [np.asarray(instances[k]["box"], float) for k in acc_keys]
                )
                evict = np.zeros(len(acc_keys), dtype=bool)
                for line in self._margin_lines((nx0, ny0, nx1, ny1)):
                    evict |= self._boxes_intersect(acc_boxes, line)
                for k in np.asarray(acc_keys)[evict]:
                    instances.pop(k, None)
        offset = np.array([nx0, ny0])
        for k, keep in zip(keys, ~removal):
            if not keep:
                continue
            info = tile_instances[k]
            info["box"] = np.asarray(info["box"]) + np.tile(offset, 2)
            info["centroid"] = np.asarray(info["centroid"]) + offset
            info["contours"] = np.asarray(info["contours"]) + offset
            instances[k] = info

    @staticmethod
    def _results_to_instance_dict(results, offset=(0, 0)) -> dict:
        """Model postproc output → {uuid: instance info} in WSI coords."""
        instances = {}
        offset = np.asarray(offset)
        for task in results:
            info_dict = task.get("info_dict", {})
            boxes = info_dict.get("box", [])
            n = len(boxes)
            for i in range(n):
                info = {
                    "box": np.asarray(boxes[i]) + np.tile(offset, 2),
                    "centroid": np.asarray(info_dict["centroid"][i]) + offset,
                    "contours": np.asarray(info_dict["contours"][i]) + offset,
                    "prob": info_dict["prob"][i],
                    "type": info_dict["type"][i],
                    "task_type": task.get("task_type"),
                }
                instances[str(uuid.uuid4())] = info
        return instances

    # -- saving -------------------------------------------------------------------------

    def save_predictions(
        self,
        processed_predictions: dict,
        output_type: str,
        save_dir=None,
        output_file: str | None = None,
        **kwargs,
    ):
        instances = processed_predictions.get("instances", {})
        if output_type.lower() == "dict":
            return processed_predictions
        if isinstance(instances, list):  # patch mode: per-patch dicts
            msg = (
                "Patch-mode multi-task outputs support output_type='dict'; "
                "merge or save per-patch instance dicts downstream."
            )
            raise ValueError(msg)
        if output_type.lower() == "annotationstore":
            from tiatoolbox_tpu.utils.store_conversion import (
                dict_to_store_instance_segmentor,
            )

            out_path = Path(save_dir) / (output_file or "output.db")
            class_dict = None
            if getattr(self.model, "nuc_type_dict", None):
                class_dict = self.model.nuc_type_dict
            return dict_to_store_instance_segmentor(
                instances,
                scale_factor=kwargs.get("scale_factor", (1.0, 1.0)),
                class_dict=class_dict or self.class_dict,
                save_path=out_path,
            )
        if output_type.lower() == "qupath":
            from tiatoolbox_tpu.utils.store_conversion import (
                dict_to_store_instance_segmentor,
                store_to_qupath_json,
            )

            store = dict_to_store_instance_segmentor(
                instances, scale_factor=kwargs.get("scale_factor", (1.0, 1.0))
            )
            out_path = Path(save_dir) / (output_file or "output.json")
            return store_to_qupath_json(store, out_path)
        if output_type.lower() == "zarr":
            import json as _json

            from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

            out_path = Path(save_dir) / (output_file or "output.zarr")
            group = ZarrGroup.create(out_path)
            serializable = {
                key: {
                    "box": np.asarray(info["box"]).tolist(),
                    "centroid": np.asarray(info["centroid"]).tolist(),
                    "contours": np.asarray(info["contours"]).tolist(),
                    "prob": info["prob"],
                    "type": (
                        int(info["type"]) if info["type"] is not None else None
                    ),
                }
                for key, info in instances.items()
            }
            group.attrs = {"instances": _json.loads(_json.dumps(serializable))}
            return out_path
        msg = f"Unsupported output_type: {output_type}"
        raise ValueError(msg)


class NucleusInstanceSegmentor(MultiTaskSegmentor):
    """Deprecated alias of MultiTaskSegmentor (reference keeps both)."""

    def __init__(self, *args, **kwargs) -> None:
        logger.warning(
            "NucleusInstanceSegmentor is deprecated; use MultiTaskSegmentor.",
        )
        super().__init__(*args, **kwargs)

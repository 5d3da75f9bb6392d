"""Overlay helpers and the annotation renderer.

Reference: ``tiatoolbox/utils/visualization.py`` (overlay_prediction_
mask :103, overlay_probability_map :314, overlay_prediction_contours
:478, AnnotationRenderer :878-1182).
"""

from __future__ import annotations

import colorsys

import cv2
import numpy as np

from tiatoolbox_tpu.annotation.geometry import LineString, Point, Polygon, _Multi


def random_colors(num_colors: int, *, bright: bool = True) -> np.ndarray:
    """Generate visually distinct RGB colors in [0, 1]."""
    brightness = 1.0 if bright else 0.7
    hsv = [(i / num_colors, 1, brightness) for i in range(num_colors)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    rng = np.random.default_rng(0)
    order = rng.permutation(num_colors)
    return np.array(colors)[order]


def overlay_prediction_mask(
    img: np.ndarray,
    prediction: np.ndarray,
    alpha: float = 0.35,
    label_info: dict | None = None,
    min_val: float = 0.0,
    *,
    return_ax: bool = False,  # noqa: ARG001 - API parity, matplotlib optional
) -> np.ndarray:
    """Overlay a class-prediction mask on an RGB image."""
    img = np.asarray(img)
    prediction = np.asarray(prediction)
    if img.shape[:2] != prediction.shape[:2]:
        msg = "Mismatch shape between img and prediction."
        raise ValueError(msg)
    if img.dtype != np.uint8:
        img = np.clip(img * 255 if img.max() <= 1 else img, 0, 255).astype(np.uint8)
    predicted_classes = sorted(np.unique(prediction).tolist())
    if label_info is None:
        colors = (random_colors(len(predicted_classes)) * 255).astype(np.uint8)
        label_info = {
            c: (str(c), tuple(colors[i])) for i, c in enumerate(predicted_classes)
        }
    overlay = img.copy().astype(float)
    rgb = img.copy()
    for class_value, (_, color) in label_info.items():
        sel = prediction == class_value
        if class_value <= min_val:
            continue
        rgb[sel] = color
    overlay = (1 - alpha) * overlay + alpha * rgb.astype(float)
    return np.clip(overlay, 0, 255).astype(np.uint8)


def colourise_image(img: np.ndarray, cmap: str = "viridis") -> np.ndarray:
    """Colour-map a single-channel image to RGB; pass RGB through.

    Reference ``utils/visualization.py:73`` (matplotlib cmap applied
    to a [0, 1]-scaled single-channel image; uint8 RGB returned).
    """
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] >= 3:
        return img
    from matplotlib import colormaps

    chan = np.squeeze(img).astype(np.float32)
    rng = chan.max() - chan.min()
    if rng > 0:
        chan = (chan - chan.min()) / rng
    rgba = colormaps[cmap](chan)
    return (rgba[..., :3] * 255).astype(np.uint8)


def overlay_probability_map(
    img: np.ndarray,
    prediction: np.ndarray,
    alpha: float = 0.35,
    colour_map: int = cv2.COLORMAP_JET,
    min_val: float = 0.0,
    *,
    return_ax: bool = False,  # noqa: ARG001
) -> np.ndarray:
    """Overlay a [0,1] probability heatmap on an RGB image."""
    prediction = np.asarray(prediction, dtype=np.float32)
    if prediction.max() > 1 + 1e-6 or prediction.min() < 0:
        msg = "Probability map values must be within [0, 1]."
        raise ValueError(msg)
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255 if img.max() <= 1 else img, 0, 255).astype(np.uint8)
    heat = cv2.applyColorMap((prediction * 255).astype(np.uint8), colour_map)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    sel = prediction >= min_val
    out = img.copy().astype(float)
    out[sel] = (1 - alpha) * out[sel] + alpha * heat[sel].astype(float)
    return np.clip(out, 0, 255).astype(np.uint8)


def overlay_prediction_contours(
    canvas: np.ndarray,
    inst_dict: dict,
    type_colours: dict | None = None,
    line_thickness: int = 2,
    *,
    draw_dot: bool = False,
) -> np.ndarray:
    """Draw instance contours (and centroids) on an image."""
    overlay = np.copy(canvas)
    for info in inst_dict.values():
        contour = np.asarray(info["contours"], dtype=np.int32)
        inst_type = info.get("type")
        if type_colours is not None and inst_type in type_colours:
            colour = type_colours[inst_type][1]
        else:
            colour = (255, 255, 0)
        cv2.drawContours(
            overlay, [contour.reshape(-1, 1, 2)], -1, tuple(int(c) for c in colour),
            line_thickness,
        )
        if draw_dot:
            centroid = np.asarray(info["centroid"], dtype=int)
            cv2.circle(overlay, tuple(centroid), 3, (255, 0, 0), -1)
    return overlay


def plot_graph(
    canvas: np.ndarray,
    nodes: np.ndarray,
    edges: np.ndarray,
    node_colors=(255, 0, 0),
    node_size: int = 5,
    edge_colors=(0, 0, 0),
    edge_size: int = 5,
) -> np.ndarray:
    """Draw a graph (nodes [N,2], edges [M,2]) onto an image."""
    if isinstance(node_colors, tuple):
        node_colors = [node_colors] * len(nodes)
    if isinstance(edge_colors, tuple):
        edge_colors = [edge_colors] * len(edges)
    nodes = np.asarray(nodes, int)
    for (src, dst), color in zip(np.asarray(edges, int), edge_colors):
        cv2.line(
            canvas, tuple(nodes[src][::-1]), tuple(nodes[dst][::-1]), color, edge_size
        )
    for node, color in zip(nodes, node_colors):
        cv2.circle(canvas, tuple(node[::-1]), node_size, color, -1)
    return canvas


class AnnotationRenderer:
    """Rasterize AnnotationStore contents to RGBA tiles.

    Args:
        score_prop: Property used to colour annotations.
        mapper: dict value→RGBA, "categorical", or callable.
        where: Filter predicate passed to store queries.
        thickness: Outline thickness (-1 = filled).
        edge_thickness: Border thickness when filled.
        zoomed_out_strat: "decimate" or "scale" when zoomed far out.
        max_scale: Above this scale annotations render decimated.
    """

    def __init__(
        self,
        score_prop: str | None = None,
        mapper=None,
        where=None,
        score_fn=None,
        max_scale: int = 8,
        thickness: int = -1,
        edge_thickness: int = 1,
        zoomed_out_strat: str = "decimate",
        *,
        blur_radius: int = 0,
        secondary_cmap: dict | None = None,
    ) -> None:
        self.score_prop = score_prop
        self.secondary_cmap = secondary_cmap
        self.where = where
        self.score_fn = score_fn or (lambda x: x)
        self.max_scale = max_scale
        self.thickness = thickness
        self.edge_thickness = edge_thickness
        self.zoomed_out_strat = zoomed_out_strat
        self.blur_radius = blur_radius
        self.score_range: tuple[float, float] | None = None
        self._categorical_colors: dict = {}
        if mapper is None:
            mapper = "categorical"
        self.mapper = mapper

    def get_color(self, properties: dict) -> tuple[int, int, int, int]:
        """RGBA color for an annotation from its properties.

        When ``secondary_cmap`` is set (``{"type": t, "score_prop": p,
        "mapper": m}``), annotations whose ``type`` equals ``t`` are
        colored by property ``p`` through mapper ``m`` instead of the
        primary mapper (reference utils/visualization.py:727-845).
        """
        sec = self.secondary_cmap
        if (
            sec is not None
            and properties.get("type") == sec.get("type")
            and sec.get("score_prop") in properties
        ):
            rgba = self._apply_mapper(
                sec.get("mapper"), properties[sec["score_prop"]]
            )
            if rgba is not None:
                return rgba
        value = properties.get(self.score_prop) if self.score_prop else None
        if callable(self.mapper):
            rgba = self.mapper(value)
            return tuple(int(255 * c) for c in rgba)
        if isinstance(self.mapper, dict):
            rgba = self.mapper.get(value, (0, 1, 0, 1))
            return tuple(int(255 * c) for c in rgba)
        if (
            isinstance(self.mapper, str)
            and self.mapper != "categorical"
            and isinstance(value, (int, float))
        ):
            # continuous matplotlib colormap over score_range
            import matplotlib

            cmap = matplotlib.colormaps[self.mapper]
            score = self.score_fn(value)
            lo, hi = self.score_range or (0.0, 1.0)
            rgba = cmap((score - lo) / max(hi - lo, 1e-9))
            return tuple(int(255 * c) for c in rgba)
        # categorical
        key = value if value is not None else properties.get("type", "default")
        if key not in self._categorical_colors:
            idx = len(self._categorical_colors)
            palette = random_colors(32)
            color = palette[idx % 32]
            self._categorical_colors[key] = (
                int(color[0] * 255),
                int(color[1] * 255),
                int(color[2] * 255),
                255,
            )
        return self._categorical_colors[key]

    @staticmethod
    def _apply_mapper(mapper, value) -> tuple[int, int, int, int] | None:
        """Apply a callable/dict/matplotlib-name mapper to a raw value."""
        if callable(mapper):
            rgba = mapper(value)
            return tuple(int(255 * c) for c in rgba)
        if isinstance(mapper, dict):
            rgba = mapper.get(value)
            return None if rgba is None else tuple(int(255 * c) for c in rgba)
        if isinstance(mapper, str) and isinstance(value, (int, float)):
            import matplotlib

            rgba = matplotlib.colormaps[mapper](float(value))
            return tuple(int(255 * c) for c in rgba)
        return None

    def render_annotations(
        self,
        store,
        bounds,
        scale: float = 1.0,
        output_size: int = 256,
        res: int = 1,  # noqa: ARG002 - API parity
    ) -> np.ndarray:
        """Render store annotations within bounds to an RGBA tile."""
        x0, y0, x1, y1 = bounds
        canvas = np.zeros((output_size, output_size, 4), np.uint8)
        min_area = (
            0.0005 * (x1 - x0) * (y1 - y0) if scale > self.max_scale else None
        )
        results = store.query(bounds, where=self.where, min_area=min_area)
        sf = output_size / max(x1 - x0, 1e-9)
        for ann in results.values():
            color = self.get_color(ann.properties)
            self._draw_geometry(canvas, ann.geometry, (x0, y0), sf, color)
        if self.blur_radius > 0:
            canvas = cv2.blur(canvas, (self.blur_radius, self.blur_radius))
        return canvas

    def _draw_geometry(self, canvas, geom, origin, sf, color) -> None:
        if isinstance(geom, _Multi):
            for g in geom.geoms:
                self._draw_geometry(canvas, g, origin, sf, color)
            return
        ox, oy = origin
        if isinstance(geom, Point):
            center = (int((geom.x - ox) * sf), int((geom.y - oy) * sf))
            cv2.circle(canvas, center, max(int(4 * sf), 1), color, -1)
            return
        if isinstance(geom, LineString):
            pts = ((geom.coords_array - [ox, oy]) * sf).astype(np.int32)
            cv2.polylines(canvas, [pts.reshape(-1, 1, 2)], False, color, 2)
            return
        if isinstance(geom, Polygon):
            shell = ((geom.shell - [ox, oy]) * sf).astype(np.int32)
            if self.thickness == -1:
                cv2.fillPoly(canvas, [shell.reshape(-1, 1, 2)], color)
                for hole in geom.holes:
                    hole_pts = ((hole - [ox, oy]) * sf).astype(np.int32)
                    cv2.fillPoly(canvas, [hole_pts.reshape(-1, 1, 2)], (0, 0, 0, 0))
                if self.edge_thickness > 0:
                    cv2.polylines(
                        canvas,
                        [shell.reshape(-1, 1, 2)],
                        True,
                        (0, 0, 0, 255),
                        self.edge_thickness,
                    )
            else:
                cv2.polylines(
                    canvas, [shell.reshape(-1, 1, 2)], True, color, self.thickness
                )

"""Overlay helpers + AnnotationRenderer suite.

Scenario set modeled on the reference's ``tests/test_utils.py``
visualization sections and ``test_annotation_tilerendering.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import LineString, Point, Polygon
from tiatoolbox_tpu.annotation.storage import Annotation, DictionaryStore
from tiatoolbox_tpu.utils.visualization import (
    AnnotationRenderer,
    overlay_prediction_contours,
    overlay_prediction_mask,
    overlay_probability_map,
    plot_graph,
    random_colors,
)


class TestOverlays:
    def test_random_colors_shape_range(self) -> None:
        colors = random_colors(12)
        assert colors.shape == (12, 3)
        assert colors.min() >= 0 and colors.max() <= 1

    def test_random_colors_deterministic(self) -> None:
        assert np.array_equal(random_colors(8), random_colors(8))

    def test_mask_overlay_changes_pixels(self) -> None:
        img = np.full((32, 32, 3), 200, np.uint8)
        pred = np.zeros((32, 32), np.int32)
        pred[8:16, 8:16] = 1
        out = overlay_prediction_mask(img, pred, alpha=0.5)
        assert out.shape == img.shape
        assert not np.array_equal(out[10, 10], img[10, 10])
        # class 0 (== min_val) stays un-tinted
        assert np.array_equal(out[0, 0], img[0, 0])

    def test_mask_overlay_label_info_color(self) -> None:
        img = np.zeros((16, 16, 3), np.uint8)
        pred = np.ones((16, 16), np.int32)
        out = overlay_prediction_mask(
            img, pred, alpha=1.0, label_info={1: ("t", (255, 0, 0))}
        )
        assert out[8, 8, 0] == 255
        assert out[8, 8, 1] == 0

    def test_mask_overlay_shape_mismatch_raises(self) -> None:
        with pytest.raises(ValueError, match="[Mm]ismatch"):
            overlay_prediction_mask(
                np.zeros((8, 8, 3), np.uint8), np.zeros((4, 4), np.int32)
            )

    def test_mask_overlay_float_image(self) -> None:
        img = np.full((8, 8, 3), 0.5, np.float32)
        pred = np.zeros((8, 8), np.int32)
        out = overlay_prediction_mask(img, pred)
        assert out.dtype == np.uint8
        assert abs(int(out[0, 0, 0]) - 127) <= 1

    def test_probability_overlay(self) -> None:
        img = np.full((16, 16, 3), 100, np.uint8)
        prob = np.zeros((16, 16), np.float32)
        prob[4:8, 4:8] = 1.0
        out = overlay_probability_map(img, prob, alpha=1.0, min_val=0.5)
        assert not np.array_equal(out[5, 5], img[5, 5])
        assert np.array_equal(out[0, 0], img[0, 0])  # below min_val untouched

    def test_probability_overlay_out_of_range_raises(self) -> None:
        with pytest.raises(ValueError, match="0, 1"):
            overlay_probability_map(
                np.zeros((8, 8, 3), np.uint8), np.full((8, 8), 2.0, np.float32)
            )

    def test_contour_overlay(self) -> None:
        canvas = np.zeros((64, 64, 3), np.uint8)
        inst = {
            "a": {
                "contours": [[8, 8], [40, 8], [40, 40], [8, 40]],
                "centroid": [24, 24],
                "type": 1,
            }
        }
        out = overlay_prediction_contours(
            canvas, inst, type_colours={1: ("x", (0, 255, 0))}, draw_dot=True
        )
        assert out[8, 20, 1] == 255  # contour in green
        assert out[24, 24, 0] == 255  # centroid dot in red

    def test_contour_overlay_default_color(self) -> None:
        canvas = np.zeros((32, 32, 3), np.uint8)
        inst = {"a": {"contours": [[4, 4], [20, 4], [20, 20]], "centroid": [12, 10]}}
        out = overlay_prediction_contours(canvas, inst)
        assert out[..., 0].max() == 255  # default yellow (255,255,0)
        assert out[..., 2].max() == 0

    def test_plot_graph(self) -> None:
        canvas = np.full((64, 64, 3), 255, np.uint8)
        nodes = np.array([[10, 10], [50, 50]])  # row, col
        edges = np.array([[0, 1]])
        out = plot_graph(canvas, nodes, edges, node_colors=(255, 0, 0), node_size=3,
                         edge_colors=(0, 0, 255), edge_size=1)
        assert tuple(out[10, 10]) == (255, 0, 0)
        assert tuple(out[30, 30]) == (0, 0, 255)  # edge midpoint


@pytest.fixture()
def store():
    s = DictionaryStore()
    s.append(
        Annotation(
            Polygon([(10, 10), (120, 10), (120, 120), (10, 120)]),
            {"type": "tumour", "prob": 0.9},
        ),
        key="big",
    )
    s.append(
        Annotation(Point(200, 200).buffer(3), {"type": "cell", "prob": 0.2}),
        key="tiny",
    )
    s.append(
        Annotation(LineString([(0, 250), (255, 250)]), {"type": "vessel"}),
        key="line",
    )
    return s


class TestAnnotationRenderer:
    def test_render_filled_polygon(self, store) -> None:
        r = AnnotationRenderer()
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=1.0)
        assert tile.shape == (256, 256, 4)
        assert tile[64, 64, 3] == 255  # inside the square: opaque
        assert tile[240, 10, 3] == 0  # empty corner

    def test_render_outline_only(self, store) -> None:
        r = AnnotationRenderer(thickness=2)
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=1.0)
        assert tile[64, 64, 3] == 0  # interior not filled
        assert tile[:, :, 3].sum() > 0  # but outlines drawn

    def test_where_filter(self, store) -> None:
        r = AnnotationRenderer(where='props["type"] == "cell"')
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=1.0)
        assert tile[64, 64, 3] == 0  # tumour square filtered out
        assert tile[200, 200, 3] == 255  # cell point kept

    def test_linestring_rendered(self, store) -> None:
        r = AnnotationRenderer(where='props["type"] == "vessel"')
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=1.0)
        assert tile[250, 128, 3] > 0

    def test_dict_mapper(self, store) -> None:
        r = AnnotationRenderer(
            score_prop="type", mapper={"tumour": (1, 0, 0, 1)}
        )
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=1.0)
        assert tile[64, 64, 0] == 255
        assert tile[64, 64, 1] == 0

    def test_callable_mapper(self) -> None:
        r = AnnotationRenderer(score_prop="prob", mapper=lambda v: (v, 0, 0, 1))
        color = r.get_color({"prob": 0.5})
        assert color == (127, 0, 0, 255)

    def test_continuous_cmap(self) -> None:
        r = AnnotationRenderer(score_prop="prob", mapper="viridis")
        r.score_range = (0.0, 1.0)
        lo = r.get_color({"prob": 0.0})
        hi = r.get_color({"prob": 1.0})
        assert lo != hi
        assert all(0 <= c <= 255 for c in lo + hi)

    def test_categorical_stable(self) -> None:
        r = AnnotationRenderer()
        c1 = r.get_color({"type": "a"})
        c2 = r.get_color({"type": "b"})
        assert c1 != c2
        assert r.get_color({"type": "a"}) == c1

    def test_zoomed_out_decimates_small(self, store) -> None:
        r = AnnotationRenderer(max_scale=4)
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=8.0)
        # the 3px-buffer point is below the min-area cut; square remains
        assert tile[64, 64, 3] == 255
        assert tile[200, 200, 3] == 0

    def test_blur_radius(self, store) -> None:
        r = AnnotationRenderer(blur_radius=5)
        tile = r.render_annotations(store, (0, 0, 256, 256), scale=1.0)
        # blur bleeds alpha past the hard square edge
        edge_alpha = tile[9, 64, 3]
        assert 0 < edge_alpha < 255

    def test_scaled_window(self, store) -> None:
        r = AnnotationRenderer()
        tile = r.render_annotations(store, (0, 0, 512, 512), scale=2.0,
                                    output_size=256)
        # square [10,120] in slide space maps to [5,60] in tile space
        assert tile[30, 30, 3] == 255
        assert tile[240, 240, 3] == 0  # slide (480,480): empty

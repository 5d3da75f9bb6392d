"""Serve a slide + annotation overlay in the browser viewer
(reference: tiatoolbox visualize / bokeh app)."""

import numpy as np

from tiatoolbox_tpu.annotation.geometry import Point
from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore
from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.visualization.tileserver import TileServer

slide = "/tmp/example_viz_slide.tiff"
make_synthetic_slide(slide, size=(2048, 1536), mpp=0.5, objective_power=20)
store = SQLiteStore("/tmp/example_viz_store.db")
store.clear()
rng = np.random.default_rng(1)
for x, y in rng.uniform(100, 1900, (200, 2)):
    store.append(Annotation(Point(x, y).buffer(10),
                            {"type": "cell", "prob": float(rng.uniform())}))
store.commit()

server = TileServer(layers={"slide": slide})
server.add_layer("overlay", store)
httpd, port = server.run_in_thread()
print(f"viewer: http://127.0.0.1:{port}/viewer")
print("  - load overlay: /tmp/example_viz_store.db")
print("  - filter, recolor by prob, open the stats pane")
print("  - 'segment box': drag a rectangle to run the registry's")
print("    nucleus instance segmentor on it (needs a cached checkpoint;")
print("    see scripts/make_bench_checkpoints.py for a local one)")
print("  - 'SAM points' + 'run SAM': prompt segmentation (SAM weights)")
print("  - 'load graph': overlay SlideGraph nodes/edges from .json/.npz,")
print("    then colour nodes by any feat_* property")
httpd.shutdown()  # remove this line to keep serving

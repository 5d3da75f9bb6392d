"""SlideGraph construction + TILs-style neighbourhood query
(reference: slide-graph notebook + the nquery TILs example in
``annotation/storage.py`` docs)."""

import numpy as np

from tiatoolbox_tpu.annotation.geometry import Point
from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore
from tiatoolbox_tpu.tools.graph import SlideGraphConstructor

rng = np.random.default_rng(3)

# --- SlideGraph over patch features -------------------------------------
# two spatially-separated phenotype clusters of patch embeddings
n = 200
points = np.vstack(
    [rng.normal((2000, 2000), 400, (n, 2)), rng.normal((6000, 6000), 400, (n, 2))]
)
features = np.vstack(
    [rng.normal(0.0, 0.1, (n, 16)), rng.normal(1.0, 0.1, (n, 16))]
)
graph = SlideGraphConstructor.build(points, features)
print(
    f"graph: {len(graph['coordinates'])} nodes, "
    f"{graph['edge_index'].shape[1]} edges"
)

# --- TILs-style proximity analysis --------------------------------------
# tumour cells (class 1) and lymphocytes (class 0); which tumour cells
# have a lymphocyte within 32 units?
store = SQLiteStore(":memory:")
for xy in rng.uniform(0, 1000, (300, 2)):
    store.append(Annotation(Point(*xy).buffer(4), {"class": 1}))
for xy in rng.uniform(0, 1000, (300, 2)):
    store.append(Annotation(Point(*xy).buffer(3), {"class": 0}))

tils = store.nquery(
    where='props["class"] == 1',      # tumour cells
    n_where='props["class"] == 0',    # lymphocytes
    distance=32.0,
    mode="boxpoint-boxpoint",
)
n_neighbours = sum(len(v) for v in tils.values())
print(
    f"{len(tils)}/300 tumour cells have >=1 lymphocyte within 32 units "
    f"({n_neighbours} pairs)"
)

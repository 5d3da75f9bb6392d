"""Mini-UMAP: structural checks (no umap-learn to compare against)."""

from __future__ import annotations

import numpy as np

from tiatoolbox_tpu.tools.umap_lite import UMAP, _find_ab_params


def _three_clusters(n_per: int = 40, seed: int = 0) -> tuple:
    rng = np.random.default_rng(seed)
    centers = np.array([[0.0] * 10, [8.0] * 10, [-8.0, 8.0] * 5])
    x = np.concatenate(
        [c + rng.normal(0, 0.5, (n_per, 10)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), n_per)
    return x, labels


def test_ab_params_match_published_defaults() -> None:
    a, b = _find_ab_params(spread=1.0, min_dist=0.1)
    # umap-learn's fitted values for the default curve
    assert abs(a - 1.577) < 0.05
    assert abs(b - 0.895) < 0.05


def test_separates_clusters() -> None:
    x, labels = _three_clusters()
    emb = UMAP(n_components=2, n_epochs=120, random_state=0).fit_transform(x)
    assert emb.shape == (120, 2)
    centroids = np.stack([emb[labels == k].mean(0) for k in range(3)])
    intra = max(
        np.linalg.norm(emb[labels == k] - centroids[k], axis=1).mean()
        for k in range(3)
    )
    inter = min(
        np.linalg.norm(centroids[i] - centroids[j])
        for i in range(3)
        for j in range(i + 1, 3)
    )
    assert inter > 2 * intra, (inter, intra)


def test_preserves_knn_structure() -> None:
    """Embedding neighbours should overlap input-space neighbours."""
    from sklearn.neighbors import NearestNeighbors

    x, _ = _three_clusters(n_per=30, seed=1)
    emb = UMAP(n_components=2, n_epochs=100, random_state=0).fit_transform(x)
    k = 10
    nn_in = NearestNeighbors(n_neighbors=k + 1).fit(x).kneighbors(x)[1][:, 1:]
    nn_out = NearestNeighbors(n_neighbors=k + 1).fit(emb).kneighbors(emb)[1][:, 1:]
    overlap = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(nn_in, nn_out)]
    )
    assert overlap >= 0.35, overlap


def test_tiny_inputs() -> None:
    assert UMAP(n_components=3).fit_transform(np.zeros((2, 5))).shape == (2, 3)
    out = UMAP(n_components=2, n_epochs=20).fit_transform(
        np.random.default_rng(0).random((8, 4))
    )
    assert np.isfinite(out).all()


def test_graph_visualise_uses_umap() -> None:
    import matplotlib

    matplotlib.use("Agg")
    from tiatoolbox_tpu.tools.graph import SlideGraphConstructor

    rng = np.random.default_rng(0)
    points = rng.uniform(0, 4000, (300, 2))
    feats = np.concatenate(
        [k + rng.random((100, 16)) for k in range(3)]
    )
    graph = SlideGraphConstructor.build(points, feats)
    colors = SlideGraphConstructor._umap_reducer(
        {"x": graph["x"], "coordinates": graph["coordinates"]}
    )
    assert colors.shape == (len(graph["x"]), 3)
    assert colors.min() >= 0 and colors.max() <= 1

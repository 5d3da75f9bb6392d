"""Extended PatchPredictor scenarios (reference
``tests/engines/test_patch_predictor.py`` behaviours).

Uses a small random-init CNN on 64x64 patches so every scenario runs in
seconds on the CPU backend.
"""

from __future__ import annotations

import sqlite3

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor
from tiatoolbox_tpu.utils.zarrlite import open_zarr


@pytest.fixture(scope="module")
def patches():
    return np.stack([synthetic_he_patch((64, 64), seed=s) for s in range(6)])


@pytest.fixture(scope="module")
def predictor():
    model = CNNModel("resnet18", num_classes=3)
    model.init(input_shape=(1, 64, 64, 3))
    return PatchPredictor(model, batch_size=4, num_loader_workers=0, verbose=False)


class TestPatchModeOutputs:
    def test_labels_returned(self, predictor, patches) -> None:
        labels = [0, 1, 2, 0, 1, 2]
        out = predictor.run(
            patches, labels=labels, patch_mode=True, return_labels=True
        )
        assert np.array_equal(out["labels"], labels)

    def test_labels_absent_by_default(self, predictor, patches) -> None:
        out = predictor.run(patches, patch_mode=True)
        assert "labels" not in out

    def test_probabilities_normalized(self, predictor, patches) -> None:
        out = predictor.run(patches, patch_mode=True)
        assert out["probabilities"].shape == (6, 3)
        assert np.allclose(out["probabilities"].sum(axis=1), 1.0, atol=1e-4)
        assert np.array_equal(
            out["predictions"], out["probabilities"].argmax(axis=1)
        )

    def test_batch_size_invariance(self, predictor, patches) -> None:
        out1 = predictor.run(patches, patch_mode=True, batch_size=1)
        out4 = predictor.run(patches, patch_mode=True, batch_size=4)
        assert np.allclose(
            out1["probabilities"], out4["probabilities"], atol=1e-4
        )

    def test_list_of_paths_input(self, predictor, patches, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import imwrite

        paths = []
        for i, patch in enumerate(patches[:3]):
            p = tmp_path / f"p{i}.png"
            imwrite(p, patch)
            paths.append(p)
        out = predictor.run(paths, patch_mode=True)
        assert out["probabilities"].shape == (3, 3)
        direct = predictor.run(patches[:3], patch_mode=True)
        assert np.allclose(
            out["probabilities"], direct["probabilities"], atol=1e-4
        )


class TestSavedOutputs:
    def test_zarr_output(self, predictor, patches, tmp_path) -> None:
        save_dir = tmp_path / "out"
        path = predictor.run(
            patches, patch_mode=True, output_type="zarr", save_dir=save_dir
        )
        assert str(path).endswith("output.zarr")
        group = open_zarr(path)
        probs = np.asarray(group["probabilities"])
        assert probs.shape == (6, 3)
        assert np.asarray(group["predictions"]).shape == (6,)

    def test_zarr_without_save_dir_raises(self, predictor, patches) -> None:
        with pytest.raises(ValueError, match="save_dir"):
            predictor.run(patches, patch_mode=True, output_type="zarr")

    def test_unsupported_output_type_raises(
        self, predictor, patches, tmp_path
    ) -> None:
        with pytest.raises(ValueError, match="[Uu]nsupported|output_type"):
            predictor.run(
                patches,
                patch_mode=True,
                output_type="parquet",
                save_dir=tmp_path / "x",
            )

    def test_existing_save_dir_requires_overwrite(
        self, predictor, patches, tmp_path
    ) -> None:
        save_dir = tmp_path / "dup"
        predictor.run(
            patches, patch_mode=True, output_type="zarr", save_dir=save_dir
        )
        with pytest.raises(OSError, match="overwrite"):
            predictor.run(
                patches, patch_mode=True, output_type="zarr", save_dir=save_dir
            )
        # overwrite=True succeeds
        predictor.run(
            patches,
            patch_mode=True,
            output_type="zarr",
            save_dir=save_dir,
            overwrite=True,
        )

    def test_annotationstore_output(self, predictor, patches, tmp_path) -> None:
        save_dir = tmp_path / "db"
        path = predictor.run(
            patches,
            patch_mode=True,
            output_type="annotationstore",
            save_dir=save_dir,
        )
        assert str(path).endswith(".db")
        con = sqlite3.connect(path)
        (n,) = con.execute("SELECT COUNT(*) FROM annotations").fetchone()
        con.close()
        assert n == 6

    def test_annotationstore_extents_with_yuv_wire(
        self, patches, tmp_path
    ) -> None:
        """Patch extents must come from the true patch shape, not the
        yuv420-packed plane array ([B, H*3/2, W])."""
        model = CNNModel("resnet18", num_classes=3)
        model.init(input_shape=(1, 64, 64, 3))
        model.wire_format = "yuv420"
        predictor = PatchPredictor(
            model, batch_size=4, num_loader_workers=0, verbose=False
        )
        path = predictor.run(
            patches,
            patch_mode=True,
            output_type="annotationstore",
            save_dir=tmp_path / "yuv",
        )
        con = sqlite3.connect(path)
        rows = con.execute(
            "SELECT max_x - min_x, max_y - min_y FROM rtree"
        ).fetchall()
        con.close()
        assert rows
        for w, h in rows:
            assert round(w) == 64
            assert round(h) == 64  # was 96 when read from packed planes

    def test_qupath_output(self, predictor, patches, tmp_path) -> None:
        import json

        save_dir = tmp_path / "qp"
        path = predictor.run(
            patches, patch_mode=True, output_type="qupath", save_dir=save_dir
        )
        data = json.loads(open(path).read())
        features = data["features"] if isinstance(data, dict) else data
        assert len(features) == 6


class TestModelHandling:
    def test_invalid_model_type_raises(self) -> None:
        with pytest.raises(TypeError, match="registry name|ModelABC"):
            PatchPredictor(42)

    def test_uninitialized_model_auto_inits(self, patches) -> None:
        model = CNNModel("resnet18", num_classes=2)
        predictor = PatchPredictor(
            model, batch_size=4, num_loader_workers=0, verbose=False
        )
        out = predictor.run(patches, patch_mode=True)
        assert out["probabilities"].shape == (6, 2)

    def test_preproc_hook_applied(self, patches) -> None:
        model = CNNModel("resnet18", num_classes=3)
        model.init(input_shape=(1, 64, 64, 3))
        predictor = PatchPredictor(
            model, batch_size=4, num_loader_workers=0, verbose=False
        )
        base = predictor.run(patches, patch_mode=True)["probabilities"]
        model.preproc_func = lambda img: np.zeros_like(img)
        zeroed = predictor.run(patches, patch_mode=True)["probabilities"]
        # zeroed inputs: all patches produce the identical distribution
        assert np.allclose(zeroed, zeroed[0], atol=1e-5)
        assert not np.allclose(base, zeroed, atol=1e-3)

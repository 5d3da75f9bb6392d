"""NGFF v0.4 metadata dataclasses (reference
``tests/test_meta_ngff_dataclasses.py`` behaviours + round-trip with
a real synthetic NGFF store)."""

from __future__ import annotations

from tiatoolbox_tpu.wsicore.metadata.ngff import (
    Axis,
    Channel,
    CoordinateTransform,
    Creator,
    Dataset,
    Multiscales,
    Omero,
    RDefs,
    Window,
    Zattrs,
)


class TestDefaults:
    def test_zattrs_defaults(self) -> None:
        z = Zattrs()
        assert isinstance(z._creator, Creator)
        assert z._ARRAY_DIMENSIONS == ["y", "x", "c"]
        ms = z.multiscales[0]
        assert ms.version == "0.4"
        assert [a.name for a in ms.axes] == ["y", "x", "c"]
        assert ms.datasets[0].path == "0"
        assert isinstance(
            ms.datasets[0].coordinateTransformations[0], CoordinateTransform
        )

    def test_multiscales_iter(self) -> None:
        axes, datasets, version = Multiscales()
        assert version == "0.4"
        assert all(isinstance(a, Axis) for a in axes)
        assert all(isinstance(d, Dataset) for d in datasets)

    def test_omero_default_channels_rgb(self) -> None:
        omero = Omero()
        assert [c.color for c in omero.channels] == [
            "FF0000", "00FF00", "0000FF",
        ]
        assert isinstance(omero.channels[0].window, Window)
        assert isinstance(omero.rdefs, RDefs)


class TestCodec:
    def test_tolerates_sparse_third_party_attrs(self) -> None:
        """Axes without "type" (a SHOULD pre-0.4), vendor extension
        keys, and partial omero blocks parse with defaults instead of
        raising."""
        attrs = {
            "multiscales": [
                {
                    "axes": [
                        {"name": "y", "vendorkey": 1},
                        {"name": "x"},
                        {"name": "c"},
                        {"name": "t"},
                    ],
                    "datasets": [{"path": "0"}],
                }
            ],
            "omero": {"channels": [{"color": "00FF00", "extension": True}]},
        }
        z = Zattrs.from_dict(attrs)
        ms = z.multiscales[0]
        assert [a.type for a in ms.axes] == [
            "space", "space", "channel", "time",
        ]
        assert z.omero.channels[0].color == "00FF00"
        assert isinstance(z.omero.channels[0].window, Window)

    def test_roundtrip(self) -> None:
        z = Zattrs(
            multiscales=[
                Multiscales(
                    axes=[
                        Axis("y", "space", "micrometer"),
                        Axis("x", "space", "micrometer"),
                        Axis("c", "channel", None),
                    ],
                    datasets=[
                        Dataset(
                            path="0",
                            coordinateTransformations=[
                                CoordinateTransform("scale", [0.5, 0.5, 1.0])
                            ],
                        ),
                        Dataset(
                            path="1",
                            coordinateTransformations=[
                                CoordinateTransform("scale", [1.0, 1.0, 1.0])
                            ],
                        ),
                    ],
                )
            ]
        )
        back = Zattrs.from_dict(z.to_dict())
        assert back.multiscales[0].datasets[1].path == "1"
        assert back.multiscales[0].datasets[0].coordinateTransformations[
            0
        ].scale == [0.5, 0.5, 1.0]
        assert back.to_dict() == z.to_dict()

    def test_generates_a_store_ngffreader_opens(self, tmp_path) -> None:
        """Zattrs written by the dataclasses parses through the real
        NGFFWSIReader (generation use — the reference's primary one)."""
        import numpy as np

        from tiatoolbox_tpu.data.synth import synthetic_he_patch
        from tiatoolbox_tpu.utils.zarrlite import ZarrGroup
        from tiatoolbox_tpu.wsicore.wsireader import NGFFWSIReader, WSIReader

        img = synthetic_he_patch((256, 192), seed=11)
        root = tmp_path / "slide.zarr"
        grp = ZarrGroup.create(root)
        grp.from_array("0", img)
        z = Zattrs(
            multiscales=[
                Multiscales(
                    datasets=[
                        Dataset(
                            path="0",
                            coordinateTransformations=[
                                CoordinateTransform("scale", [0.25, 0.25, 1.0])
                            ],
                        )
                    ]
                )
            ]
        )
        grp.attrs = z.to_dict()
        reader = WSIReader.open(root)
        assert isinstance(reader, NGFFWSIReader)
        np.testing.assert_allclose(reader.info.mpp, (0.25, 0.25))
        region = reader.read_rect((0, 0), (64, 64), 0, "level")
        np.testing.assert_array_equal(region, img[:64, :64])
        # and the written attrs parse back into equal typed objects
        back = Zattrs.from_dict(ZarrGroup(root).attrs)
        assert back.to_dict() == z.to_dict()

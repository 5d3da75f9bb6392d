"""Numerical parity against the actual reference implementation.

Imports the reference package from /root/reference with absent native
deps stubbed (``ref_compat``); compares outputs of the algorithms whose
parity is a north-star requirement (BASELINE.json): stain
normalization (pixel-identical Macenko) and patch-grid math.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

if not Path("/root/reference/tiatoolbox").exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

import ref_compat

ref_compat.install()

from tiatoolbox_tpu.data.synth import synthetic_he_patch  # noqa: E402


@pytest.fixture(scope="module")
def target() -> np.ndarray:
    return synthetic_he_patch((224, 224), seed=1)

@pytest.fixture(scope="module")
def source() -> np.ndarray:
    return synthetic_he_patch((224, 224), seed=42)


@pytest.mark.parametrize("method", ["ruifrok", "macenko", "reinhard", "vahadane"])
def test_stainnorm_pixel_identical(method, target, source) -> None:
    """Host stain normalization is bit-identical to the reference."""
    from tiatoolbox.tools.stainnorm import get_normalizer as ref_get_normalizer

    from tiatoolbox_tpu.tools.stainnorm import get_normalizer

    ref = ref_get_normalizer(method)
    ref.fit(target.copy())
    ours = get_normalizer(method)
    ours.fit(target.copy())
    ref_out = ref.transform(source.copy())
    our_out = ours.transform(source.copy())
    assert np.array_equal(ref_out, our_out)


def test_device_macenko_within_one(target, source) -> None:
    """Device (fused f32) Macenko is within +-1 of the reference."""
    from tiatoolbox.tools.stainnorm import get_normalizer as ref_get_normalizer

    from tiatoolbox_tpu.tools.stainnorm import get_normalizer

    ref = ref_get_normalizer("macenko")
    ref.fit(target.copy())
    ours = get_normalizer("macenko")
    ours.fit(target.copy())
    consts = ours.prepare_tile_transform(source)
    device_out = np.asarray(ours.transform_tiles(source[None], consts))[0]
    ref_out = ref.transform(source.copy())
    diff = np.abs(device_out.astype(int) - ref_out.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.9


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(
            image_shape=(1000, 800),
            patch_input_shape=(224, 224),
            stride_shape=(150, 150),
        ),
        dict(
            patch_output_shape=(164, 164),
            image_shape=(2000, 1500),
            patch_input_shape=(256, 256),
            stride_shape=(164, 164),
        ),
        dict(
            image_shape=(513, 511),
            patch_input_shape=(64, 64),
            stride_shape=(32, 48),
            input_within_bound=True,
        ),
    ],
)
def test_patch_grid_exact(kwargs) -> None:
    """get_coordinates integer math matches the reference exactly."""
    from tiatoolbox.tools.patchextraction import PatchExtractor as RefPE

    from tiatoolbox_tpu.tools.patchextraction import PatchExtractor as OurPE

    ref_out = RefPE.get_coordinates(**kwargs)
    our_out = OurPE.get_coordinates(**kwargs)
    if isinstance(ref_out, tuple):
        for a, b in zip(ref_out, our_out):
            assert np.array_equal(a, b)
    else:
        assert np.array_equal(ref_out, our_out)


def test_transforms_parity(source) -> None:
    """rgb2od / od2rgb / luminosity mask match the reference."""
    from tiatoolbox.utils import misc as ref_misc
    from tiatoolbox.utils import transforms as ref_transforms

    from tiatoolbox_tpu.utils import misc, transforms

    assert np.allclose(
        ref_transforms.rgb2od(source.copy()), transforms.rgb2od(source.copy())
    )
    od = transforms.rgb2od(source.copy())
    assert np.array_equal(ref_transforms.od2rgb(od), transforms.od2rgb(od))
    assert np.array_equal(
        ref_misc.get_luminosity_tissue_mask(source.copy(), 0.8),
        misc.get_luminosity_tissue_mask(source.copy(), 0.8),
    )


def test_io_config_parity() -> None:
    """scale_to_highest / to_baseline match the reference."""
    from tiatoolbox.models.engine.io_config import (
        IOSegmentorConfig as RefIOSeg,
    )

    from tiatoolbox_tpu.models.engine.io_config import IOSegmentorConfig

    kwargs = dict(
        input_resolutions=[{"units": "mpp", "resolution": 0.5}],
        output_resolutions=[{"units": "mpp", "resolution": 1.0}],
        patch_input_shape=(256, 256),
        save_resolution={"units": "mpp", "resolution": 2.0},
    )
    ref_cfg = RefIOSeg(**kwargs).to_baseline()
    our_cfg = IOSegmentorConfig(**kwargs).to_baseline()
    assert [r["resolution"] for r in ref_cfg.input_resolutions] == [
        r["resolution"] for r in our_cfg.input_resolutions
    ]
    assert [r["resolution"] for r in ref_cfg.output_resolutions] == [
        r["resolution"] for r in our_cfg.output_resolutions
    ]


READ_IMG = np.random.default_rng(0).integers(0, 255, (100, 120, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(bounds=(10, 10, 50, 50)),
        dict(bounds=(-10, -5, 30, 40)),
        dict(bounds=(90, 80, 130, 140)),
        dict(bounds=(-10, -10, 130, 140), pad_mode="reflect"),
        dict(bounds=(5, 5, 50, 50), padding=3),
        dict(bounds=(-5, -5, 20, 20), pad_mode="none"),
    ],
)
def test_safe_padded_read_parity(kwargs) -> None:
    from tiatoolbox.utils import image as ref_image

    from tiatoolbox_tpu.utils import image as our_image

    assert np.array_equal(
        ref_image.safe_padded_read(READ_IMG, **kwargs),
        our_image.safe_padded_read(READ_IMG, **kwargs),
    )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(bounds=(10, 10, 50, 50), output_size=(40, 40)),
        dict(bounds=(10.5, 9.3, 50.7, 48.2), output_size=(40, 40)),
        dict(bounds=(0, 0, 30, 30), output_size=(60, 60)),
        dict(bounds=(-5, -5, 20, 20), output_size=(25, 25)),
        dict(bounds=(10, 10, 50, 50), output_size=(40, 40), padding=2),
        dict(bounds=(10, 10, 50, 50), output_size=(20, 20), interpolation="area"),
    ],
)
def test_sub_pixel_read_parity(kwargs) -> None:
    from tiatoolbox.utils import image as ref_image

    from tiatoolbox_tpu.utils import image as our_image

    assert np.array_equal(
        ref_image.sub_pixel_read(READ_IMG, pad_at_baseline=False, **kwargs),
        our_image.sub_pixel_read(READ_IMG, pad_at_baseline=False, **kwargs),
    )


def test_wsimeta_parity() -> None:
    from tiatoolbox.wsicore.wsimeta import WSIMeta as RefMeta

    from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta as OurMeta

    kwargs = dict(
        slide_dimensions=(2048, 1536),
        axes="YXS",
        level_dimensions=[(2048, 1536), (1024, 768), (512, 384)],
        level_downsamples=[1, 2, 4],
        mpp=(0.5, 0.5),
        objective_power=20,
        raw={},
    )
    ref_meta = RefMeta(**kwargs)
    our_meta = OurMeta(**kwargs)
    for units, res in [("mpp", 0.5), ("power", 10), ("baseline", 0.25), ("level", 1)]:
        ref_scales = ref_meta.relative_level_scales(res, units)
        our_scales = our_meta.relative_level_scales(res, units)
        assert all(np.allclose(a, b) for a, b in zip(ref_scales, our_scales))


def _randomize_bn(torch_model) -> None:
    import torch

    with torch.no_grad():
        for module in torch_model.modules():
            if isinstance(module, torch.nn.BatchNorm2d):
                module.running_mean.normal_(0, 0.3)
                module.running_var.uniform_(0.7, 1.3)


def _forward_pair(ref_model, our_model, x):
    import torch

    ref_model.eval()
    with torch.inference_mode():
        t_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_out = our_model.forward(np.asarray(x))
    return t_out, f_out


class TestArchitectureWeightParity:
    """Converted reference torch weights reproduce forwards exactly."""

    def test_sccnn(self) -> None:
        import torch

        from tiatoolbox.models.architecture.sccnn import SCCNN as RefSCCNN

        from tiatoolbox_tpu.models.architecture.sccnn import SCCNN
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_sccnn_to_flax,
        )

        torch.manual_seed(0)
        ref = RefSCCNN()
        ours = SCCNN()
        ours.load_weights(
            torch_sccnn_to_flax({k: v for k, v in ref.state_dict().items()})
        )
        x = np.random.default_rng(0).random((1, 31, 31, 3)).astype(np.float32)
        t_out, f_out = _forward_pair(ref, ours, x)
        assert np.abs(
            t_out.numpy().transpose(0, 2, 3, 1) - np.asarray(f_out)
        ).max() < 1e-5

    def test_nuclick(self) -> None:
        import torch

        from tiatoolbox.models.architecture.nuclick import NuClick as RefNuClick

        from tiatoolbox_tpu.models.architecture.nuclick import NuClick
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_nuclick_to_flax,
        )

        torch.manual_seed(0)
        ref = RefNuClick(5, 1)
        _randomize_bn(ref)
        ours = NuClick(5, 1)
        ours.load_weights(
            torch_nuclick_to_flax({k: v for k, v in ref.state_dict().items()})
        )
        x = np.random.default_rng(0).random((1, 64, 64, 5)).astype(np.float32)
        t_out, f_out = _forward_pair(ref, ours, x)
        assert np.abs(
            t_out.numpy().transpose(0, 2, 3, 1) - np.asarray(f_out)
        ).max() < 1e-4

    def test_efficientunet_tissue_mask(self) -> None:
        """EfficientNet-B0 U-Net: converted weights reproduce the torch forward."""
        import torch

        from tiatoolbox.models.architecture.efficientunet_tissue_mask_model import (
            EfficientUNetTissueMaskModel as RefModel,
        )

        from tiatoolbox_tpu.models.architecture.efficientunet_tissue_mask_model import (
            EfficientUNetTissueMaskModel,
        )
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_efficientunet_to_flax,
        )

        torch.manual_seed(0)
        ref = RefModel()
        _randomize_bn(ref)
        ours = EfficientUNetTissueMaskModel()
        ours.init(input_shape=(1, 64, 64, 3))
        ours.load_weights(
            torch_efficientunet_to_flax(
                {k: np.asarray(v) for k, v in ref.state_dict().items()}
            )
        )
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        t_out, f_out = _forward_pair(ref, ours, x)
        assert np.abs(
            t_out.numpy().transpose(0, 2, 3, 1) - np.asarray(f_out)
        ).max() < 1e-4

    def test_grandqc(self) -> None:
        """GrandQC UNet++: converted weights reproduce the torch forward.

        Encoder: local timm-native B0 replica (timm not in env);
        decoder + head: the reference's own pure-torch modules.
        """
        import torch

        from tiatoolbox.models.architecture.grandqc import (
            UnetPlusPlusDecoder as RefDecoder,
        )
        from tiatoolbox.models.architecture.utils import (
            SegmentationHead as RefHead,
        )
        from torch_ref import TorchTimmEfficientNetB0Encoder

        from tiatoolbox_tpu.models.architecture.grandqc import GrandQCModel
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_grandqc_to_flax,
        )

        class RefGrandQC(torch.nn.Module):
            def __init__(self) -> None:
                super().__init__()
                self.encoder = TorchTimmEfficientNetB0Encoder()
                self.decoder = RefDecoder(
                    encoder_channels=[3, 32, 24, 40, 112, 320],
                    decoder_channels=(256, 128, 64, 32, 16),
                    n_blocks=5,
                )
                self.segmentation_head = RefHead(16, 2, kernel_size=3)

            def forward(self, x):
                return self.segmentation_head(self.decoder(self.encoder(x)))

        torch.manual_seed(0)
        ref = RefGrandQC()
        _randomize_bn(ref)
        ours = GrandQCModel()
        ours.init(input_shape=(1, 64, 64, 3))
        ours.load_weights(
            torch_grandqc_to_flax(
                {k: np.asarray(v) for k, v in ref.state_dict().items()}
            )
        )
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        t_out, f_out = _forward_pair(ref, ours, x)
        assert np.abs(
            t_out.numpy().transpose(0, 2, 3, 1) - np.asarray(f_out)
        ).max() < 1e-4

    def test_kongnet(self) -> None:
        """KongNet: converted weights reproduce the torch forward.

        Encoder: local timm-native EfficientNetV2 replica (timm/
        torchvision not in env); decoder + heads: the reference's own
        torch modules with Conv2dNormActivation substituted by an
        equivalent local Sequential(conv, BN, SiLU).
        """
        import torch
        from torch import nn as tnn

        import tiatoolbox.models.architecture.kongnet as ref_kongnet
        from tiatoolbox.models.architecture.utils import (
            SegmentationHead as RefHead,
        )
        from torch_ref import TorchTimmEfficientNetV2Features

        from tiatoolbox_tpu.models.architecture.kongnet import KongNet
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_kongnet_to_flax,
        )

        class Conv2dNormActivation(tnn.Sequential):
            """torchvision Conv2dNormActivation equivalent (conv/bn/act)."""

            def __init__(self, in_ch, out_ch, kernel_size=3, padding=None,
                         norm_layer=tnn.BatchNorm2d, activation_layer=tnn.ReLU):
                if padding is None:
                    padding = (kernel_size - 1) // 2
                super().__init__(
                    tnn.Conv2d(in_ch, out_ch, kernel_size,
                               padding=padding, bias=False),
                    norm_layer(out_ch),
                    activation_layer(inplace=True),
                )

        ref_kongnet.Conv2dNormActivation = Conv2dNormActivation
        variant = "efficientnetv2_s"
        enc_channels = [3, 24, 48, 64, 160, 256]
        num_channels_per_head = (3, 4)

        class WrappedEncoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.model = TorchTimmEfficientNetV2Features(variant)

            def forward(self, x):
                return [x, *self.model(x)]

        class RefKongNet(tnn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = WrappedEncoder()
                self.decoders = tnn.ModuleList([
                    ref_kongnet.KongNetDecoder(
                        encoder_channels=enc_channels,
                        decoder_channels=(256, 128, 64, 32, 16),
                        n_blocks=5,
                        center=True,
                        attention_type="scse",
                    )
                    for _ in num_channels_per_head
                ])
                self.heads = tnn.ModuleList([
                    RefHead(16, c, activation=None, kernel_size=1)
                    for c in num_channels_per_head
                ])

            def forward(self, x):
                feats = self.encoder(x)
                return torch.cat(
                    [h(d(*feats)) for d, h in zip(self.decoders, self.heads)], 1
                )

        torch.manual_seed(0)
        ref = RefKongNet()
        _randomize_bn(ref)
        ours = KongNet(
            num_heads=2,
            num_channels_per_head=list(num_channels_per_head),
            target_channels=[0, 4],
            min_distance=11,
            threshold_abs=0.5,
            variant=variant,
        )
        ours.init(input_shape=(1, 64, 64, 3))
        ours.load_weights(
            torch_kongnet_to_flax(
                {k: np.asarray(v) for k, v in ref.state_dict().items()},
                variant=variant,
            )
        )
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        t_out, f_out = _forward_pair(ref, ours, x)
        assert np.abs(
            t_out.numpy().transpose(0, 2, 3, 1) - np.asarray(f_out)
        ).max() < 1e-4

    def test_micronet_bicubic(self) -> None:
        """torch-matched bicubic resize (a=-0.75) used by MicroNet."""
        import torch
        import torch.nn.functional as F

        from tiatoolbox_tpu.models.architecture.micronet import (
            _torch_bicubic_resize,
        )

        x = np.random.default_rng(0).random((1, 100, 100, 3)).astype(np.float32)
        t_out = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(32, 32), mode="bicubic"
        ).numpy().transpose(0, 2, 3, 1)
        f_out = np.asarray(_torch_bicubic_resize(np.asarray(x), 32))
        assert np.abs(t_out - f_out).max() < 1e-5

    def test_hovernet(self) -> None:
        import torch

        from tiatoolbox.models.architecture.hovernet import HoVerNet as RefHoVerNet

        from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_hovernet_to_flax,
        )

        torch.manual_seed(0)
        ref = RefHoVerNet(num_types=6, mode="fast")
        _randomize_bn(ref)
        ours = HoVerNet(num_types=6, mode="fast")
        ours.load_weights(
            torch_hovernet_to_flax({k: v for k, v in ref.state_dict().items()})
        )
        x = (
            np.random.default_rng(0)
            .integers(0, 255, (1, 256, 256, 3))
            .astype(np.float32)
        )
        t_out, f_out = _forward_pair(ref, ours, x)
        for branch in ("np", "hv", "tp"):
            diff = np.abs(
                t_out[branch].numpy().transpose(0, 2, 3, 1)
                - np.asarray(f_out[branch])
            ).max()
            assert diff < 1e-4, branch

    def test_unet_unet_encoder(self) -> None:
        import torch

        from tiatoolbox.models.architecture.unet import UNetModel as RefUNet

        from tiatoolbox_tpu.models.architecture.unet import UNetModel
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_unet_to_flax,
        )

        torch.manual_seed(0)
        ref = RefUNet(
            num_input_channels=3, num_output_channels=2,
            encoder="unet", encoder_levels=[32, 64, 128],
        )
        _randomize_bn(ref)
        ours = UNetModel(
            num_input_channels=3, num_output_channels=2,
            encoder="unet", encoder_levels=[32, 64, 128],
        )
        ours.load_weights(
            torch_unet_to_flax({k: v for k, v in ref.state_dict().items()})
        )
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32) * 255
        t_out, f_out = _forward_pair(ref, ours, x)
        assert np.abs(
            t_out.numpy().transpose(0, 2, 3, 1) - np.asarray(f_out)
        ).max() < 1e-4

    def test_hovernet_proc_np_hv(self) -> None:
        """Watershed postproc yields identical instance partitions.

        The stubbed skimage functions are shimmed with this package's
        equivalents, so this validates the Sobel-energy/marker/
        morphology logic around the watershed core.
        """
        import importlib

        from tiatoolbox_tpu.models.architecture.hovernet import (
            HoVerNet,
            _remove_small_objects,
            _watershed,
        )

        morph = importlib.import_module("skimage.morphology")
        seg_mod = importlib.import_module("skimage.segmentation")

        def remove_small_objects(ar, max_size=None, min_size=None, **_kwargs):
            threshold = (max_size + 1) if max_size is not None else min_size
            if ar.dtype == bool:
                from scipy import ndimage

                labelled = ndimage.label(ar)[0]
                return _remove_small_objects(labelled, threshold) > 0
            return _remove_small_objects(ar, threshold)

        morph.remove_small_objects = remove_small_objects
        seg_mod.watershed = lambda image, markers=None, mask=None: _watershed(
            image, markers, mask
        )
        # the reference module may already be imported with the bare
        # stubs bound via from-imports; patch its globals too
        import tiatoolbox.models.architecture.hovernet as ref_hn_module

        ref_hn_module.remove_small_objects = remove_small_objects
        ref_hn_module.watershed = seg_mod.watershed
        from tiatoolbox.models.architecture.hovernet import HoVerNet as RefHN

        np_map = np.zeros((128, 128, 1), np.float32)
        hv = np.zeros((128, 128, 2), np.float32)
        yy, xx = np.mgrid[0:128, 0:128]
        for cx, cy, r in [(30, 30, 13), (60, 64, 11), (95, 40, 9), (80, 100, 12)]:
            blob = np.hypot(xx - cx, yy - cy) < r
            np_map[..., 0][blob] = 0.95
            hv[..., 0][blob] = ((xx - cx) / r)[blob]
            hv[..., 1][blob] = ((yy - cy) / r)[blob]
        ref_inst = RefHN._proc_np_hv(np_map, hv)
        our_inst = HoVerNet._proc_np_hv(np_map, hv)

        def canon(mask):
            out = np.zeros_like(mask)
            seen: dict = {}
            for v in mask.ravel():
                if v != 0 and v not in seen:
                    seen[v] = len(seen) + 1
            for old, new in seen.items():
                out[mask == old] = new
            return out

        assert np.array_equal(canon(ref_inst), canon(our_inst))

    def test_unet_resnet50_encoder(self) -> None:
        """Bottleneck ResNet encoder parity (fcn-tissue_mask path)."""
        import torch
        from torch_ref import TorchResNetEncoder

        from tiatoolbox_tpu.models.architecture.unet import ResNetEncoder
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            torch_resnet_to_flax,
        )

        torch.manual_seed(0)
        ref = TorchResNetEncoder()
        _randomize_bn(ref)
        ref.eval()
        variables = torch_resnet_to_flax(
            {k: v.numpy() for k, v in ref.state_dict().items()},
            backbone_name="enc",
        )
        variables = {
            "params": variables["params"]["enc"],
            "batch_stats": variables["batch_stats"]["enc"],
        }
        module = ResNetEncoder(layers=(3, 4, 6, 3))
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        with torch.inference_mode():
            t_feats = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_feats = module.apply(variables, np.asarray(x))
        for t_f, f_f in zip(t_feats, f_feats):
            assert np.abs(
                t_f.numpy().transpose(0, 2, 3, 1) - np.asarray(f_f)
            ).max() < 1e-4


def test_metrics_parity() -> None:
    """pair_coordinates / f1_detection / dice match the reference exactly."""
    from tiatoolbox.utils import metrics as ref_metrics

    from tiatoolbox_tpu.utils import metrics

    rng = np.random.default_rng(7)
    true = rng.random((120, 2)) * 500
    pred = true[: 90] + rng.normal(0, 2.0, (90, 2))
    pred = np.vstack([pred, rng.random((40, 2)) * 500])

    ours = metrics.pair_coordinates(true, pred, 6.0)
    refs = ref_metrics.pair_coordinates(true, pred, 6.0)
    for a, b in zip(ours, refs):
        assert np.array_equal(np.sort(np.asarray(a).ravel()),
                              np.sort(np.asarray(b).ravel()))
    assert metrics.f1_detection(true, pred, 6.0) == ref_metrics.f1_detection(
        true, pred, 6.0
    )
    gt = rng.random((64, 64)) > 0.5
    pr = rng.random((64, 64)) > 0.5
    assert metrics.dice(gt, pr) == ref_metrics.dice(gt, pr)


def test_zoomify_layout_parity() -> None:
    """Zoomify level/tile layout matches the reference generator."""
    from tiatoolbox.tools.pyramid import ZoomifyGenerator as RefZoomify
    from tiatoolbox.wsicore.wsireader import VirtualWSIReader as RefVirtual

    from tiatoolbox_tpu.tools.pyramid import ZoomifyGenerator
    from tiatoolbox_tpu.wsicore.wsireader import VirtualWSIReader

    img = np.zeros((768, 1024, 3), np.uint8)
    ref_gen = RefZoomify(RefVirtual(img), tile_size=256)
    our_gen = ZoomifyGenerator(VirtualWSIReader(img), tile_size=256)
    assert our_gen.level_count == ref_gen.level_count
    for level in range(ref_gen.level_count):
        assert tuple(our_gen.level_dimensions(level)) == tuple(
            ref_gen.level_dimensions(level)
        )
        assert tuple(our_gen.tile_grid_size(level)) == tuple(
            ref_gen.tile_grid_size(level)
        )
    grid_w, grid_h = ref_gen.tile_grid_size(ref_gen.level_count - 1)
    for x in range(grid_w):
        for y in range(grid_h):
            assert str(our_gen.tile_path(ref_gen.level_count - 1, x, y)) == str(
                ref_gen.tile_path(ref_gen.level_count - 1, x, y)
            )


def test_graph_helpers_parity() -> None:
    """delaunay_adjacency / affinity_to_edge_index match the reference."""
    from tiatoolbox.tools.graph import (
        affinity_to_edge_index as ref_ae,
        delaunay_adjacency as ref_da,
    )

    from tiatoolbox_tpu.tools.graph import (
        affinity_to_edge_index,
        delaunay_adjacency,
    )

    rng = np.random.default_rng(0)
    pts = rng.random((100, 2)) * 500
    a_ref = np.asarray(ref_da(pts, dthresh=60.0))
    a_our = np.asarray(delaunay_adjacency(pts, dthresh=60.0))
    assert np.array_equal(a_ref, a_our)
    e_ref = np.sort(np.asarray(ref_ae(a_ref)), axis=1)
    e_our = np.sort(np.asarray(affinity_to_edge_index(a_our)), axis=1)
    assert np.array_equal(e_ref, e_our)


def test_misc_helpers_parity(source) -> None:
    """ppu2mpp / get_bounding_box / contrast_enhancer match the reference."""
    from tiatoolbox.utils import misc as ref_misc

    from tiatoolbox_tpu.utils import misc

    for units in ("cm", "inch", 2, 3, "m", "mm"):
        assert misc.ppu2mpp(4000, units) == ref_misc.ppu2mpp(4000, units)

    mask = np.zeros((60, 80), bool)
    mask[10:30, 20:55] = True
    assert np.array_equal(
        misc.get_bounding_box(mask), ref_misc.get_bounding_box(mask)
    )

    assert np.array_equal(
        misc.contrast_enhancer(source.copy(), soft_cdf=False)
        if "soft_cdf" in misc.contrast_enhancer.__code__.co_varnames
        else misc.contrast_enhancer(source.copy()),
        ref_misc.contrast_enhancer(source.copy()),
    )

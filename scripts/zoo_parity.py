"""Full-zoo converted-weight logit-parity report → ZOO_PARITY.json.

Real checkpoints are gated/offline; parity is proven against
torch replicas with the exact reference graphs (tests/torch_ref.py and
the inline replicas in tests/test_reference_parity.py). This script:

1. runs the engine end-to-end on a CONVERTED torchvision-format
   resnet18 checkpoint and records the patch-for-patch prob delta and
   prediction agreement vs the torch pipeline;
2. records the ViT foundation-encoder converter delta (UNI-style);
3. runs the architecture-family parity test suites and records the
   pass/fail counts per family.

Usage: python scripts/zoo_parity.py  (writes ZOO_PARITY.json at repo root)
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def engine_resnet18_parity() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch
    from torch_ref import TorchResNet18

    from tiatoolbox_tpu.data.synth import make_synthetic_slide
    from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
    from tiatoolbox_tpu.models.dataset.dataset_abc import WSIPatchDataset
    from tiatoolbox_tpu.models.engine.io_config import IOPatchPredictorConfig
    from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

    torch.manual_seed(7)
    net = TorchResNet18(num_classes=9)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "resnet18-kather100k.pth"
        torch.save(net.state_dict(), ckpt)
        slide = Path(td) / "slide.tiff"
        make_synthetic_slide(slide, size=(2048, 1536), mpp=0.5, objective_power=20)
        ioconfig = IOPatchPredictorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.5}],
            patch_input_shape=(224, 224),
            stride_shape=(224, 224),
        )
        model = CNNModel("resnet18", num_classes=9)
        engine = PatchPredictor(model, weights=ckpt, batch_size=16)
        out = engine.run(
            [str(slide)],
            patch_mode=False,
            ioconfig=ioconfig,
            auto_get_mask=False,
            verbose=False,
        )
        result = next(iter(out.values()))
        ds = WSIPatchDataset(
            str(slide),
            patch_input_shape=(224, 224),
            stride_shape=(224, 224),
            resolution=0.5,
            units="mpp",
            auto_get_mask=False,
        )
        patches = np.stack([ds[i]["image"] for i in range(len(ds))])
        with torch.inference_mode():
            x = torch.from_numpy(patches).permute(0, 3, 1, 2).float() / 255.0
            t_probs = net(x).numpy()
    return {
        "n_patches": int(len(patches)),
        "max_prob_delta": float(
            np.abs(result["probabilities"] - t_probs).max()
        ),
        "prediction_agreement": float(
            (result["predictions"] == t_probs.argmax(-1)).mean()
        ),
    }


def vit_parity() -> dict:
    import numpy as np
    import torch
    from torch_ref import TorchViT

    from tiatoolbox_tpu.models.architecture.vit import VisionTransformer
    from tiatoolbox_tpu.models.architecture.weight_converter import (
        torch_vit_to_flax,
    )

    import jax.numpy as jnp

    torch.manual_seed(0)
    tm = TorchViT(
        img_size=224, patch_size=16, dim=384, depth=6, heads=6,
        init_values=1e-5, reg_tokens=4,
    ).eval()
    fv = torch_vit_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, num_heads=6
    )
    fm = VisionTransformer(
        patch_size=16, embed_dim=384, depth=6, num_heads=6,
        init_values=1e-5, reg_tokens=4,
    )
    rng = np.random.default_rng(0)
    x = rng.random((2, 224, 224, 3), dtype=np.float32)
    with torch.inference_mode():
        t = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f = np.asarray(fm.apply(fv, jnp.asarray(x)))
    return {"max_embedding_delta": float(np.abs(f - t).max())}


def family_suites() -> dict:
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q",
            "tests/test_reference_parity.py::TestArchitectureWeightParity",
            "tests/models/test_vit_converter.py",
            "tests/engines/test_weight_e2e.py",
        ],
        capture_output=True, text=True, cwd=REPO, check=False,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    return {"pytest_rc": proc.returncode, "summary": tail}


def main() -> None:
    t0 = time.time()
    report = {
        "engine_resnet18_converted_checkpoint": engine_resnet18_parity(),
        "vit_foundation_encoder": vit_parity(),
        "family_parity_suites": family_suites(),
        "families_covered": [
            "resnet18 (engine e2e)", "ViT (UNI/UNI2/GigaPath/H-optimus/"
            "Virchow/kaiko graphs)", "HoVerNet", "HoVerNetPlus", "MicroNet",
            "MapDe", "SCCNN", "NuClick", "KongNet", "GrandQC",
            "EfficientUNet", "UNet (unet+resnet50 encoders)",
        ],
        "seconds": round(time.time() - t0, 1),
    }
    out = REPO / "ZOO_PARITY.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""Data registry: pretrained-model YAML, sample assets, synthetic data.

The reference fetches remote sample assets from HuggingFace
(``tiatoolbox/data/__init__.py:27-93``); this build targets zero-egress
environments, so sample slides/patches are generated synthetically on
first use (``tiatoolbox_tpu.data.synth``) and cached under
``rcParam["TIATOOLBOX_HOME"]``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tiatoolbox_tpu import rcParam


def stain_norm_target() -> np.ndarray:
    """The default stain-normalization target image (synthetic H&E)."""
    from tiatoolbox_tpu.data.synth import synthetic_he_patch

    return synthetic_he_patch(size=(224, 224), seed=1234)


def sample_slide_path(name: str = "synthetic") -> Path:
    """Path to a cached synthetic sample slide, generating if needed."""
    from tiatoolbox_tpu.data.synth import make_synthetic_slide

    home = Path(rcParam["TIATOOLBOX_HOME"]) / "samples"
    home.mkdir(parents=True, exist_ok=True)
    path = home / f"{name}.tiff"
    if not path.exists():
        make_synthetic_slide(path)
    return path


def small_svs() -> Path:
    """Small slide for testing (reference ``data/__init__.py:123``
    downloads ``svs-1-small``; zero-egress stand-in: a cached small
    synthetic pyramidal slide)."""
    from tiatoolbox_tpu.data.synth import make_synthetic_slide

    home = Path(rcParam["TIATOOLBOX_HOME"]) / "samples"
    home.mkdir(parents=True, exist_ok=True)
    path = home / "small_svs.tiff"
    if not path.exists():
        make_synthetic_slide(path, size=(1024, 768), mpp=0.5)
    return path


def _fetch_remote_sample(key: str, tmp_path: Path | None = None) -> Path:
    """Fetch a registered sample asset (reference ``data/__init__.py:27-93``).

    Downloads from HuggingFace when network + huggingface_hub are
    available; otherwise generates a synthetic stand-in of the same
    modality (zero-egress environments).
    """
    import yaml

    registry_path = Path(__file__).parent / "remote_samples.yaml"
    registry = yaml.safe_load(registry_path.read_text())["files"]
    if key not in registry:
        msg = f"Unknown remote sample: {key!r}."
        raise KeyError(msg)
    entry = registry[key]
    dest_dir = Path(tmp_path) if tmp_path else (
        Path(rcParam["TIATOOLBOX_HOME"]) / "samples"
    )
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / entry["filename"]
    if dest.exists():
        return dest
    try:
        from huggingface_hub import hf_hub_download

        return Path(
            hf_hub_download(
                repo_id=entry["hf_repo_id"],
                repo_type="dataset",
                subfolder=entry.get("subfolder"),
                filename=entry["filename"],
                local_dir=dest_dir,
            )
        )
    except Exception:  # zero-egress or hub unavailable: synthetic stand-in
        kind = entry.get("synthetic")
        if kind is None:
            raise
        from tiatoolbox_tpu.data import synth

        if kind == "slide":
            out = dest.with_suffix(".tiff")
            synth.make_synthetic_slide(out)
        elif kind == "dicom":
            out = dest.with_suffix(".dcm")
            synth.make_synthetic_dicom(out)
        elif kind == "jp2":
            import cv2

            out = dest.with_suffix(".jp2")
            img = synth.synthetic_he_patch((1024, 768), seed=7)
            cv2.imwrite(str(out), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        else:  # patch
            from tiatoolbox_tpu.utils.misc import imwrite

            out = dest.with_suffix(".png")
            imwrite(out, synth.synthetic_he_patch((224, 224), seed=9))
        return out

"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: resnet18-kather100k whole-slide patch prediction
throughput in patches/sec/chip (BASELINE.json north star: >=5x a
reference GPU). The reference publishes no GPU number; vs_baseline is
computed against a nominal 1000 patches/sec/GPU for the same model+
pipeline (typical published resnet18 inference throughput with host
dataloading), so vs_baseline >= 5.0 meets the north star.

Secondary metrics (extra keys): Macenko stain-norm MPix/sec on device.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_patch_predictor() -> dict:
    import jax

    from tiatoolbox_tpu.data.synth import make_synthetic_slide
    from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

    slide_path = "/tmp/bench_slide.tiff"
    make_synthetic_slide(slide_path, size=(8192, 6144), mpp=0.5, objective_power=20)

    predictor = PatchPredictor(
        "resnet18-kather100k", batch_size=128, num_loader_workers=16
    )
    # Warmup: compile the forward program on a single batch.
    warm = np.zeros((128, 224, 224, 3), np.uint8)
    predictor.model.infer_batch(predictor.model, warm)
    jax.block_until_ready(predictor.model(np.zeros((128, 224, 224, 3), np.float32)))

    t0 = time.perf_counter()
    out = predictor.run(
        [slide_path], patch_mode=False, output_type="dict", auto_get_mask=False
    )
    elapsed = time.perf_counter() - t0
    n_patches = len(next(iter(out.values()))["predictions"])
    return {"patches": n_patches, "seconds": elapsed, "pps": n_patches / elapsed}


def bench_stainnorm() -> dict:
    import jax

    from tiatoolbox_tpu.data.synth import synthetic_he_patch
    from tiatoolbox_tpu.tools.stainnorm import get_normalizer

    target = synthetic_he_patch((224, 224), seed=1)
    source = synthetic_he_patch((224, 224), seed=9)
    norm = get_normalizer("macenko")
    norm.fit(target)
    consts = norm.prepare_tile_transform(source)
    tiles = np.stack([source] * 256)  # 256 tiles x 224x224 = 12.8 MPix
    out = norm.transform_tiles(tiles, consts)  # compile warmup
    jax.block_until_ready(out)
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = norm.transform_tiles(tiles, consts)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    mpix = n_iter * tiles.size / 3 / 1e6
    return {"mpix_per_sec": mpix / elapsed}


def main() -> None:
    pp = bench_patch_predictor()
    sn = bench_stainnorm()
    reference_gpu_pps = 1000.0  # nominal reference GPU throughput (see docstring)
    result = {
        "metric": "patches/sec/chip (resnet18-kather100k WSI)",
        "value": round(pp["pps"], 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(pp["pps"] / reference_gpu_pps, 3),
        "stainnorm_mpix_per_sec": round(sn["mpix_per_sec"], 2),
        "n_patches": pp["patches"],
        "wall_seconds": round(pp["seconds"], 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

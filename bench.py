"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: resnet18-kather100k whole-slide patch prediction
throughput in patches/sec/chip (BASELINE.json north star: >=5x a
reference GPU). The reference publishes no GPU number; vs_baseline is
computed against a nominal 1000 patches/sec/GPU for the same
model+pipeline, so vs_baseline >= 5.0 meets the north star.

Secondary metrics (extra keys): Macenko stain-norm MPix/sec on device
and the on-device-only forward throughput (isolates the host->device
link, which in this harness is a tunneled relay at ~50 MB/s — the
binding constraint for end-to-end throughput here, not TPU compute).
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_patch_predictor() -> dict:
    import jax
    import jax.numpy as jnp

    from tiatoolbox_tpu.data.synth import make_synthetic_slide
    from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
    from tiatoolbox_tpu.models.engine.io_config import IOPatchPredictorConfig
    from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

    import os

    slide_path = f"/tmp/bench_slide_{os.getpid()}.tiff"
    make_synthetic_slide(slide_path, size=(8192, 6144), mpp=0.5, objective_power=20)

    batch_size = 128
    model = CNNModel("resnet18", num_classes=9, compute_dtype=jnp.bfloat16)
    model.init(input_shape=(1, 224, 224, 3))
    ioconfig = IOPatchPredictorConfig(
        input_resolutions=[{"units": "mpp", "resolution": 0.5}],
        patch_input_shape=(224, 224),
        stride_shape=(224, 224),
    )
    predictor = PatchPredictor(
        model, batch_size=batch_size, num_loader_workers=8
    )

    # Warm up/compile exactly the shape the run uses.
    warm = np.zeros((batch_size, 224, 224, 3), np.uint8)
    jax.block_until_ready(
        jax.tree_util.tree_leaves(model.infer_batch(model, warm))
    )

    t0 = time.perf_counter()
    out = predictor.run(
        [slide_path],
        patch_mode=False,
        ioconfig=ioconfig,
        output_type="dict",
        auto_get_mask=False,
        verbose=False,
    )
    elapsed = time.perf_counter() - t0
    n_patches = len(next(iter(out.values()))["predictions"])

    # Device-only forward throughput: N forwards chained inside ONE
    # jitted program (input varied per iteration so nothing hoists),
    # forced by a scalar fetch — per-call timing over a remote-attached
    # device measures dispatch RPCs, not the forward.
    x = jax.device_put(jnp.asarray(warm))
    n_iter = 30

    @jax.jit
    def chain(x0):
        def body(i, carry):
            xc, acc = carry
            out = model.module.apply(
                model.variables, xc.astype(jnp.bfloat16) / 255.0
            )
            xc = jnp.roll(xc, 1, axis=0) + (acc[0, 0] > 2.0).astype(jnp.uint8)
            return (xc, out.astype(jnp.float32))

        _, out = jax.lax.fori_loop(
            0, n_iter, body, (x0, jnp.zeros((batch_size, 9), jnp.float32))
        )
        return jnp.sum(out)

    np.asarray(chain(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(x))
    device_pps = batch_size * n_iter / (time.perf_counter() - t0)

    return {
        "patches": n_patches,
        "seconds": elapsed,
        "pps": n_patches / elapsed,
        "device_only_pps": device_pps,
    }


def bench_stainnorm() -> dict:
    import jax

    from tiatoolbox_tpu.data.synth import synthetic_he_patch
    from tiatoolbox_tpu.tools.stainnorm import get_normalizer

    target = synthetic_he_patch((224, 224), seed=1)
    source = synthetic_he_patch((224, 224), seed=9)
    norm = get_normalizer("macenko")
    norm.fit(target)
    consts = norm.prepare_tile_transform(source)
    tiles = np.stack([source] * 256)  # 256 tiles = 12.8 MPix

    # end-to-end (host->HBM + kernel)
    out = norm.transform_tiles(tiles, consts)  # compile warmup
    jax.block_until_ready(out)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = norm.transform_tiles(tiles, consts)
    jax.block_until_ready(out)
    e2e = n_iter * tiles.size / 3 / 1e6 / (time.perf_counter() - t0)

    # kernel-only: chain the transform N times inside ONE jitted
    # program and force execution with a scalar fetch. Per-call timing
    # over a remote-attached device measures dispatch, not the kernel.
    import jax.numpy as jnp

    from tiatoolbox_tpu.ops.stain import stain_transform

    tiles_dev = jax.device_put(jnp.asarray(tiles))
    conc_proj = jnp.asarray(consts["conc_proj"], jnp.float32)
    target_stains = jnp.asarray(consts["target_stains"], jnp.float32)
    conc_scale = jnp.asarray(consts["conc_scale"], jnp.float32)
    n_iter = 50

    @jax.jit
    def chain(x):
        def body(_, acc):
            return stain_transform(acc, conc_proj, target_stains, conc_scale)

        out = jax.lax.fori_loop(0, n_iter, body, x)
        return jnp.sum(out.astype(jnp.int32))

    np.asarray(chain(tiles_dev))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(tiles_dev))  # scalar fetch forces the whole chain
    kernel = n_iter * tiles.size / 3 / 1e6 / (time.perf_counter() - t0)
    return {"mpix_per_sec": e2e, "kernel_mpix_per_sec": kernel}


def bench_segmentation_device() -> dict:
    """On-chip semantic-segmentation forward throughput (bf16 U-Net)."""
    import jax
    import jax.numpy as jnp

    from tiatoolbox_tpu.models.architecture.unet import UNetModel

    model = UNetModel(
        num_input_channels=3,
        num_output_channels=2,
        encoder="unet",
        compute_dtype=jnp.bfloat16,
    )
    model.init(input_shape=(1, 256, 256, 3))
    batch = 32
    warm = np.zeros((batch, 256, 256, 3), np.uint8)
    out = model.infer_batch(model, warm)
    x = jax.device_put(jnp.asarray(warm))

    def run(xd):
        return model._jitted_infer(model.variables, xd.astype(model.compute_dtype))

    if getattr(model, "_jitted_infer", None) is None:  # fallback: full path
        run = lambda xd: model.infer_batch(model, np.asarray(xd))  # noqa: E731
    out = run(x)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run(x)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    mpix = n_iter * batch * 256 * 256 / 1e6 / (time.perf_counter() - t0)
    return {"device_mpix_per_sec": mpix}


def main() -> None:
    pp = bench_patch_predictor()
    sn = bench_stainnorm()
    try:
        seg = bench_segmentation_device()
    except Exception:  # keep the headline metric robust
        seg = {"device_mpix_per_sec": None}
    reference_gpu_pps = 1000.0  # nominal reference GPU throughput (see docstring)
    result = {
        "metric": "patches/sec/chip (resnet18-kather100k WSI)",
        "value": round(pp["pps"], 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(pp["pps"] / reference_gpu_pps, 3),
        "device_only_patches_per_sec": round(pp["device_only_pps"], 1),
        "stainnorm_mpix_per_sec": round(sn["mpix_per_sec"], 2),
        "stainnorm_kernel_mpix_per_sec": round(sn["kernel_mpix_per_sec"], 2),
        "segmentation_device_mpix_per_sec": (
            round(seg["device_mpix_per_sec"], 2)
            if seg["device_mpix_per_sec"]
            else None
        ),
        "n_patches": pp["patches"],
        "wall_seconds": round(pp["seconds"], 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

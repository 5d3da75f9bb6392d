"""Deterministic FUNCTIONAL bench checkpoint for hovernet_fast-pannuke.

The driver environment cannot download the reference HoVerNet weights
(zero egress), and a random initialisation makes the instance bench
meaningless: random hv maps yield no watershed markers, so
``instances_per_sec`` is zero/degenerate (r02 verdict item 5).

Instead of random weights, this builds a HAND-CONSTRUCTED functional
checkpoint — real weights for the real architecture that make the full
graph compute an actual nucleus segmenter for H&E-stained tissue:

- ``conv0`` channel 0 becomes a 7x7 darkness detector (nuclei are
  haematoxylin-dark); ``bn0`` thresholds it into a smooth nucleus
  density map. All residual-branch convs are zeroed so the density
  channel rides the (1x1-conv) shortcuts through d0..d3 unchanged.
- Each decoder branch zeroes its u3/u2 stages (``u*_convf`` = 0), so
  ``u1 = upsample(0) + d0`` taps the full-resolution density map.
- np head: ``u0_conv`` turns density into foreground logits
  (bias calibrated so P(nucleus) > 0.5 exactly on the blobs).
- hv head: ``u1_conva`` computes MINUS the 3x3 Sobel of density —
  for a smooth blob, -d/dx(G) is (x-cx)-like: positive x-slope at the
  core, exactly the ramp structure real HoVerNet hv maps have, so the
  reference watershed marker logic (Sobel-energy < 0.4 at cores,
  ``hovernet.py:503-617``) fires on real nucleus centres.
- tp head: type-1 logits inside nuclei (argmax: type 1 vs background).

The result is deterministic (no RNG at all), loads through the same
``get_pretrained_model`` path as a converted real checkpoint, and
segments the synthetic bench slides' actual nuclei — so the
watershed/instance-info stages process representative instances.

Usage:
    python scripts/make_bench_checkpoints.py        # writes if missing
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DARKNESS_THRESHOLD = 0.70  # density = relu(thr - mean7x7(rgb/255))
NP_GAIN = 80.0  # foreground logit = gain * (density - NP_DENSITY_THR)
NP_DENSITY_THR = 0.03
HV_GAIN = -8.0  # hv = HV_GAIN * sobel3(density)  (minus: ramp at cores)
TP_GAIN = 40.0


def _identity_bn(params: dict, stats: dict) -> None:
    params["scale"] = np.ones_like(params["scale"])
    params["bias"] = np.zeros_like(params["bias"])
    stats["mean"] = np.zeros_like(stats["mean"])
    stats["var"] = np.ones_like(stats["var"])


def build_functional_hovernet_variables(model) -> dict:
    """Zero-init the tree, then implant the functional weights."""
    import jax

    model.init()  # correctly-shaped tree (values discarded below)
    variables = jax.tree_util.tree_map(
        lambda a: np.zeros_like(np.asarray(a)), model.variables
    )
    params, stats = variables["params"], variables["batch_stats"]
    # batch_stats all start var=0 -> set var=1 everywhere (harmless for
    # zeroed-scale BNs, required for identity BNs)
    for path, leaf in jax.tree_util.tree_leaves_with_path(stats):
        if path[-1].key == "var":
            parent = stats
            for p in path[:-1]:
                parent = parent[p.key]
            parent["var"] = np.ones_like(leaf)

    # stem: darkness detector on channel 0
    k0 = params["conv0"]["kernel"]  # [7,7,3,64]
    k0[:, :, :, 0] = 1.0 / (k0.shape[0] * k0.shape[1] * 3)
    params["bn0"]["scale"][0] = -1.0
    params["bn0"]["bias"][0] = DARKNESS_THRESHOLD

    # encoder stages: density rides the 1x1 shortcut convs on channel 0
    for stage in ("d0", "d1", "d2", "d3"):
        params[stage]["shortcut"]["kernel"][0, 0, 0, 0] = 1.0
        _identity_bn(params[stage]["blk_bn"], stats[stage]["blk_bn"])
    params["conv_bot"]["kernel"][0, 0, 0, 0] = 1.0

    sobel_x = np.array(
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32
    ) / 8.0

    for branch in ("np", "hv", "tp"):
        bp, bs = params[branch], stats[branch]
        # u3/u2 stages stay zero (their convf kernels are zero), so
        # u1 = upsample(0) + d0 = the density map.
        _identity_bn(bp["u0_bn"], bs["u0_bn"])
        conva = bp["u1_conva"]["kernel"]  # [3,3,64,64]
        head_k = bp["u0_conv"]["kernel"]  # [1,1,64,out]
        head_b = bp["u0_conv"]["bias"]
        if branch == "np":
            conva[1, 1, 0, 0] = 1.0  # centre tap of density
            head_k[0, 0, 0, 1] = NP_GAIN
            head_b[1] = -NP_GAIN * NP_DENSITY_THR
        elif branch == "hv":
            conva[:, :, 0, 0] = HV_GAIN * sobel_x  # d/dx
            conva[:, :, 0, 1] = HV_GAIN * sobel_x.T  # d/dy
            head_k[0, 0, 0, 0] = 1.0
            head_k[0, 0, 1, 1] = 1.0
        else:  # tp: type 1 inside nuclei
            conva[1, 1, 0, 0] = 1.0
            head_k[0, 0, 0, 1] = TP_GAIN
            head_b[1] = -TP_GAIN * NP_DENSITY_THR
    _densify(variables)
    return variables


# Computational-density noise: weights ride inside the compiled program
# as closure constants (``ModelABC.bind_jit``), and XLA's algebraic
# simplifier FOLDS convolutions whose kernel/BN-scale literals are all
# zero — a mostly-zero checkpoint times a gutted graph (measured r05:
# 77 ms/fwd vs 107.5 ms with dense weights — the source of the r04
# ``hovernet_device_mfu`` 0.62 vs MFU_HOVERNET.md 0.45 contradiction).
# The noise floor below keeps every kernel/scale literal nonzero so the
# compiled program does the full topology's work, while staying ~3
# orders of magnitude under the functional taps so the segmenter's
# outputs (and the watershed smoke check) are unaffected.
DENSIFY_EPS = 1e-3


def _densify(variables: dict, eps: float = DENSIFY_EPS) -> None:
    """Replace exact-zero kernel/scale entries with tiny nonzeros."""
    import jax

    rng = np.random.default_rng(20260820)

    def leaf_noise(path, leaf) -> None:
        name = path[-1].key
        if name not in ("kernel", "scale"):
            return  # biases/means may stay zero: adds don't fold convs
        arr = np.asarray(leaf)
        zeros = arr == 0.0
        if not zeros.any():
            return
        noise = rng.uniform(eps / 4, eps, size=int(zeros.sum())).astype(
            arr.dtype
        ) * rng.choice((-1.0, 1.0), size=int(zeros.sum())).astype(arr.dtype)
        arr[zeros] = noise

    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        leaf_noise(path, leaf)


# Bump when the construction changes in a way that invalidates cached
# copies. v2: the _densify noise floor (a v1 checkpoint cached on the
# driver host times a DCE-gutted graph — the r04 MFU 0.62 artifact).
CKPT_VERSION = "v2-dense"


def ensure_hovernet_bench_checkpoint(
    home: str | Path | None = None, *, force: bool = False
) -> Path:
    """Create+cache the functional hovernet_fast-pannuke checkpoint."""
    from tiatoolbox_tpu import rcParam
    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet
    from tiatoolbox_tpu.models.architecture.weight_converter import (
        save_flax_npz,
    )

    models_dir = Path(home or rcParam["TIATOOLBOX_HOME"]) / "models"
    target = models_dir / "hovernet_fast-pannuke.npz"
    version_file = target.with_suffix(".npz.version")
    cached_version = (
        version_file.read_text().strip() if version_file.exists() else None
    )
    if target.exists() and cached_version == CKPT_VERSION and not force:
        return target

    import contextlib

    import jax

    # generate + smoke-check on the host CPU: weight construction needs
    # no accelerator, and compiling the batch-1 graph on a tunneled chip
    # would cost minutes for nothing (the bench compiles its own run
    # shapes later).
    try:
        cpu_ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # no cpu backend registered
        cpu_ctx = contextlib.nullcontext()
    with cpu_ctx:
        # registry kwargs for hovernet_fast-pannuke: fast mode, 6 types
        model = HoVerNet(num_types=6, mode="fast")
        variables = build_functional_hovernet_variables(model)
        model.load_weights(variables)

        # smoke-check: the graph must segment synthetic nuclei
        from tiatoolbox_tpu.data.synth import synthetic_he_patch

        patch = synthetic_he_patch((256, 256), seed=3)
        np_p, hv, _tp = HoVerNet.infer_batch(model, patch[None])
    inst = HoVerNet._proc_np_hv(
        np.asarray(np_p)[0], np.asarray(hv)[0]
    )
    n_instances = int(inst.max())
    # a degenerate checkpoint (e.g. a renamed param key zeroing a head)
    # must fail loudly here, not get cached and silently re-create the
    # random-init instances/sec ≈ 0 bench this checkpoint exists to fix
    if n_instances < 3:
        msg = (
            f"functional HoVerNet checkpoint failed its smoke check: "
            f"{n_instances} instances segmented on the synthetic patch "
            "(expected >= 3); refusing to cache a degenerate checkpoint"
        )
        raise RuntimeError(msg)
    models_dir.mkdir(parents=True, exist_ok=True)
    save_flax_npz(variables, target)
    version_file.write_text(CKPT_VERSION + "\n")
    print(
        f"wrote {target} (functional checkpoint; "
        f"foreground {float((np.asarray(np_p) > 0.5).mean()):.3f}, "
        f"{n_instances} instances on a 256x256 smoke patch)"
    )
    return target


if __name__ == "__main__":
    ensure_hovernet_bench_checkpoint(force="--force" in sys.argv)

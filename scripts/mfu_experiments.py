"""MFU experiments for the serving forwards (run on a real chip).

Two sections, selected by argv: ``resnet`` (default, the r02/r03
record) and ``hovernet`` (the r03 0.58-MFU attribution, VERDICT r3
item 5): ``python scripts/mfu_experiments.py hovernet``.

Round-2 review (VERDICT.md) hypothesised the 0.56 reported MFU was an
MXU-underfill problem in the 64-channel stages, fixable by zero-padding
conv channels to 128 (numerics-preserving). Both halves of that were
tested on the real v5e chip; this script is the rerunnable record.

Findings (v5e-1, bf16, batch 128):

1. The 0.56 was a MEASUREMENT artifact, not a device plateau. A timed
   call through the tunneled relay carries a fixed ~25-30 ms
   dispatch+fetch RTT (an EMPTY 30-iteration fori_loop chain costs
   ~27 ms). The r02 bench amortised that over only 30 chained forwards,
   adding ~0.9 ms to every 3.34 ms forward. Differencing two chain
   lengths (the slope method, used by bench.py since r03) cancels every
   fixed term: true device-plane rate ~38k p/s -> MFU ~0.70.

2. Channel padding is numerics-preserving but SLOWER. Depth-differenced
   single-op timings at stage-1 shapes (batch 128, 56x56 spatial):

       conv 3x3  64->64   0.189 ms   79% of bf16 peak (on its own FLOPs)
       conv 3x3 128->128  0.631 ms   95% of bf16 peak

   Padding 64->128 on both sides quadruples the executed MACs; running
   them at 95% instead of 79% still costs 3.3x the wall time. XLA
   already tiles the 64-channel convs well (stages 2-4 measure 90-99%
   of peak). The remaining gap to 1.0 MFU is the stem maxpool (a pure
   HBM-bandwidth op measured at its roundtrip floor) and the N=64 MXU
   output-lane fill in stage 1 -- neither is addressable by padding
   (which pays 4x FLOPs) or by hand-written im2col (K=192/N=64 Pallas
   matmul computes to ~45% fill, below XLA's measured 64-79%).

The numerics-preservation claim itself is validated (on CPU, exactly)
by tests/test_channel_padding.py.

Usage: python scripts/mfu_experiments.py   (needs a real TPU; ~3 min)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B = 128


def _best(fn, x, reps=4):
    np.asarray(fn(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _chain(body_fn, n_iter, carry_shape, carry_dtype):
    @jax.jit
    def chain(x0):
        def body(_, carry):
            xc, acc = carry
            out = body_fn(xc)
            s = jnp.sum(out.astype(jnp.float32))
            xc = xc + (s * 0).astype(carry_dtype)
            return (xc, s)

        return lax.fori_loop(0, n_iter, body, (x0, jnp.float32(0)))[1]

    return chain


def op_cost(body_fn, x_np, tag):
    """Depth-differenced op cost: slope between 1x and 3x composition."""
    x = jax.device_put(x_np)
    times = []
    for k in (1, 3):
        def rep(xc, k=k):
            out = xc
            for _ in range(k):
                out = body_fn(out)
            return out

        times.append(_best(_chain(rep, 50, x_np.shape, x_np.dtype), x) / 50)
    per = (times[1] - times[0]) / 2
    print(f"  {tag:24s} {per * 1e3:7.3f} ms/op")
    return per


def main() -> None:
    print("== empty-chain fixed overhead (the r02 artifact) ==")
    xu = np.random.randint(0, 255, (B, 224, 224, 3), np.uint8)
    xd = jax.device_put(xu)
    empty = _chain(lambda xc: xc[:1, :1, :1, :1], 30, xu.shape, jnp.uint8)
    print(f"  empty 30-iter chain: {_best(empty, xd) * 1e3:.1f} ms total "
          "(pure per-call RTT; amortised as ~0.9 ms/forward at n=30)")

    print("== conv efficiency at resnet18 shapes (bf16) ==")

    def conv(k_np, stride=1):
        k = jax.device_put(k_np)

        def fn(x):
            return lax.conv_general_dilated(
                x, k, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        return fn

    cases = [
        ("3x3 64->64 @56 (stage1)", (B, 56, 56, 64), (3, 3, 64, 64)),
        ("3x3 128->128 @56 (PADDED stage1)", (B, 56, 56, 128), (3, 3, 128, 128)),
        ("3x3 128->128 @28 (stage2)", (B, 28, 28, 128), (3, 3, 128, 128)),
        ("3x3 256->256 @14 (stage3)", (B, 14, 14, 256), (3, 3, 256, 256)),
        ("3x3 512->512 @7 (stage4)", (B, 7, 7, 512), (3, 3, 512, 512)),
    ]
    for tag, xs, ks in cases:
        x_np = np.random.randn(*xs).astype(jnp.bfloat16)
        k_np = np.random.randn(*ks).astype(jnp.bfloat16)
        t = op_cost(conv(k_np), x_np, tag)
        macs = B * xs[1] * xs[2] * ks[0] * ks[1] * ks[2] * ks[3]
        print(f"      -> {2 * macs / t / 197e12 * 100:5.1f}% of bf16 peak")

    print("== full serving forward: slope-measured MFU ==")
    from tiatoolbox_tpu.models.architecture.vanilla import CNNModel

    model = CNNModel("resnet18", num_classes=9, compute_dtype=jnp.bfloat16)
    model.init(input_shape=(1, 224, 224, 3))
    model.optimize_for_inference()
    module, variables = model.module, model.variables

    def make(n_iter):
        @jax.jit
        def chain(x0):
            def body(_, carry):
                xc, acc = carry
                out = module.apply(variables, xc.astype(jnp.bfloat16) / 255.0)
                xc = xc + (acc[0, 0] > 2.0).astype(jnp.uint8)
                return (xc, out.astype(jnp.float32))

            _, out = lax.fori_loop(
                0, n_iter, body, (x0, jnp.zeros((B, 9), jnp.float32)))
            return jnp.sum(out)

        return chain

    t10 = _best(make(10), xd)
    t110 = _best(make(110), xd)
    per = (t110 - t10) / 100
    print(f"  {per * 1e3:.3f} ms/forward  {B / per:.0f} p/s  "
          f"MFU {B / per * 3.64e9 / 197e12:.3f}  "
          f"(fixed call overhead {1e3 * (t10 - 10 * per):.1f} ms)")


V5E_BF16_PEAK = 197e12


def _slope(fn_factory, x, n_lo=3, n_hi=13, reps=3):
    """Per-iteration seconds from two chain lengths (fixed RTT cancels)."""
    lo = _best(fn_factory(n_lo), x, reps)
    hi = _best(fn_factory(n_hi), x, reps)
    return (hi - lo) / (n_hi - n_lo)


def _stage_chain(apply_fn, variables, n_iter, out_reduce=None):
    """Chain `apply_fn(variables, x)` n_iter times with a data dep."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x0):
        def body(_, carry):
            xc, acc = carry
            out = apply_fn(variables, xc)
            s = (out_reduce or (lambda o: jnp.sum(o.astype(jnp.float32))))(out)
            xc = xc + (s * 0).astype(xc.dtype)
            return (xc, s)

        return lax.fori_loop(0, n_iter, body, (x0, jnp.float32(0)))[1]

    return chain


def _stage_flops(apply_fn, variables, x_np):
    import jax

    lowered = jax.jit(apply_fn).lower(variables, x_np)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def hovernet() -> None:
    """Per-stage FLOP/time attribution of the HoVerNet-fast forward.

    The bench's ``hovernet_device_mfu`` divides XLA's own FLOP count of
    the full graph by wall time x peak. This decomposes that number:
    encoder residual stages vs the three valid-padding dense-block
    decoder branches, plus op-level experiments on the decoder's
    grouped convs (feature_group_count=4, 128->32: each MXU pass fills
    only 8 of 128 output lanes) and their numerics-preserving
    block-diagonal dense rewrite.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tiatoolbox_tpu.models.architecture.hovernet import (
        DenseBlock,
        HoVerNet,
        ResidualBlock,
        _DecoderBranch,
    )

    B = 32
    rng = jax.random.PRNGKey(0)

    print("== full forward (batch 32, 256x256, fast, bf16) ==")
    model = HoVerNet(num_types=5, mode="fast", compute_dtype=jnp.bfloat16)
    model.init(input_shape=(1, 256, 256, 3))
    # bf16 cast WITHOUT the block-diag rewrite: grouped baseline first
    model.variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if getattr(a, "dtype", None) == jnp.float32
        else a,
        model.variables,
    )
    x_np = np.random.randn(B, 256, 256, 3).astype(jnp.bfloat16)
    x = jax.device_put(x_np)
    # algorithmic FLOPs: always the grouped graph (the block-diag
    # rewrite's zero blocks are not useful work)
    full_flops = _stage_flops(
        lambda v, xb: model.module.apply(v, xb),
        model.variables,
        x_np,
    )

    from tiatoolbox_tpu.models.architecture.hovernet import (
        _expand_dense_group_kernels,
    )

    variants = [("grouped (stock)", model.module, model.variables)]
    variants.append(
        (
            "block-diag dense (optimize_for_inference)",
            model.module.clone(dense_split=1),
            _expand_dense_group_kernels(model.variables, split=4),
        )
    )
    full_s = None
    for tag, module, variables in variants:
        def fwd_factory(n, module=module, variables=variables):
            return _stage_chain(
                lambda v, xc: module.apply(v, xc), variables, n,
                out_reduce=lambda o: sum(
                    jnp.sum(v.astype(jnp.float32)) for v in o.values()
                ),
            )

        s = _slope(fwd_factory, x)
        if full_s is None:
            full_s = s  # stage decomposition below compares vs grouped
        print(
            f"  {tag:42s} {s * 1e3:7.2f} ms  {full_flops / 1e12:.2f} TFLOP  "
            f"MFU {full_flops / s / V5E_BF16_PEAK:.3f}  "
            f"({B * 256 * 256 / s / 1e6:.0f} MPix/s)"
        )
    module, variables = model.module, model.variables

    # -- stage decomposition (standalone modules, random weights: the
    #    timings depend on shapes, not values) --------------------------
    stages = [
        # (tag, module, input shape NHWC)
        ("d0 res(64,64,256)x3 @256", ResidualBlock((64, 64, 256), 3),
         (B, 256, 256, 64)),
        ("d1 res(128,..,512)x4 s2", ResidualBlock((128, 128, 512), 4, 2),
         (B, 256, 256, 256)),
        ("d2 res(256,..,1024)x6 s2", ResidualBlock((256, 256, 1024), 6, 2),
         (B, 128, 128, 512)),
        ("d3 res(512,..,2048)x3 s2", ResidualBlock((512, 512, 2048), 3, 2),
         (B, 64, 64, 1024)),
    ]
    print("== encoder stages ==")
    total_stage_s, total_stage_fl = 0.0, 0.0
    for tag, mod, shape in stages:
        xs = np.random.randn(*shape).astype(jnp.bfloat16)
        xd = jax.device_put(xs)
        v = jax.jit(mod.init)(rng, xs)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, v
        )
        apply_fn = lambda vv, xx, m=mod: m.apply(vv, xx)
        s = _slope(lambda n, vv=v, f=apply_fn: _stage_chain(f, vv, n), xd)
        fl = _stage_flops(apply_fn, v, xs)
        total_stage_s += s
        total_stage_fl += fl
        print(f"  {tag:28s} {s * 1e3:7.2f} ms  {fl / 1e12:5.2f} TFLOP  "
              f"MFU {fl / s / V5E_BF16_PEAK:.3f}")

    print("== decoder branch (x3 in the full graph) ==")
    d_shapes = [
        (B, 164, 164, 256), (B, 92, 92, 512),
        (B, 64, 64, 1024), (B, 32, 32, 1024),
    ]
    d_np = [np.random.randn(*s).astype(jnp.bfloat16) for s in d_shapes]
    branch = _DecoderBranch(ksize=3, out_ch=2)
    vb = jax.jit(branch.init)(rng, d_np)
    vb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vb
    )
    d_dev = tuple(jax.device_put(a) for a in d_np)

    # NOTE 1: the skip tensors must be jit ARGUMENTS, not closure
    # constants — closed-over device arrays are baked into the HLO as
    # literals (~600 MB here), which breaks the remote-compile path.
    # NOTE 2: EVERY input must depend on the loop carry — if only d0
    # varies, XLA hoists the whole u3/u2 chain (loop-invariant in
    # d1..d3) out of the fori_loop and the slope measures just
    # u1_conva+u0 (first attempt read MFU 1.31, i.e. >1: impossible).
    def branch_chain(n):
        @jax.jit
        def chain(ds):
            def body(_, carry):
                s, acc = carry
                din = [d + (s * 0).astype(d.dtype) for d in ds]
                out = branch.apply(vb, din)
                s = jnp.sum(out.astype(jnp.float32))
                return (s, acc + s)

            return lax.fori_loop(0, n, body, (jnp.float32(0),) * 2)[1]

        return chain

    br_s = _slope(branch_chain, d_dev)
    br_fl = _stage_flops(lambda vv, ds: branch.apply(vv, list(ds)),
                         vb, tuple(d_np))
    print(f"  {'decoder branch':28s} {br_s * 1e3:7.2f} ms  "
          f"{br_fl / 1e12:5.2f} TFLOP  MFU {br_fl / br_s / V5E_BF16_PEAK:.3f}")
    acc_s = total_stage_s + 3 * br_s
    acc_fl = total_stage_fl + 3 * br_fl
    print(f"  {'stages + 3 branches':28s} {acc_s * 1e3:7.2f} ms  "
          f"{acc_fl / 1e12:5.2f} TFLOP  (full fwd {full_s * 1e3:.2f} ms)")

    print("== dense-block grouped conv (the decoder's inner op) ==")
    # u3 dense unit conv2 shapes: 128->32, g=4, ~58x58 spatial
    xs = np.random.randn(B, 58, 58, 128).astype(jnp.bfloat16)
    xd = jax.device_put(xs)

    def conv_fn(k_np, groups):
        k = jax.device_put(k_np)

        def fn(_, xx):
            out = lax.conv_general_dilated(
                xx, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
            return jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))

        return fn

    kg = np.random.randn(3, 3, 32, 32).astype(jnp.bfloat16)  # g=4: Cin/g=32
    kd = np.random.randn(3, 3, 128, 32).astype(jnp.bfloat16)
    # block-diagonal dense kernel == grouped conv numerics exactly
    kbd = np.zeros((3, 3, 128, 32), np.float32)
    for g in range(4):
        kbd[:, :, g * 32:(g + 1) * 32, g * 8:(g + 1) * 8] = kg[
            :, :, :, g * 8:(g + 1) * 8
        ]
    kbd = kbd.astype(jnp.bfloat16)
    for tag, k_np, g in [
        ("grouped g=4 128->32", kg, 4),
        ("dense 128->32 (4x FLOPs)", kd, 1),
        ("block-diag dense (exact)", kbd, 1),
    ]:
        fn = conv_fn(k_np, g)
        s = _slope(lambda n, f=fn: _stage_chain(f, None, n), xd)
        macs = B * 56 * 56 * 9 * (128 // g) * 32
        print(f"  {tag:28s} {s * 1e3:7.3f} ms  "
              f"{2 * macs / s / V5E_BF16_PEAK * 100:5.1f}% of peak "
              "(own FLOPs)")

    # Is the block-diag rewrite bit-identical ON THIS HARDWARE? (In
    # theory the K=128 MXU reduction could pair the 32 nonzero products
    # differently than the K=32 grouped pass; measure, don't assume.)
    out_g = np.asarray(jax.jit(conv_fn(kg, 4))(None, xd))
    out_bd = np.asarray(jax.jit(conv_fn(kbd, 1))(None, xd))
    bit_equal = np.array_equal(out_g, out_bd)
    max_diff = float(
        np.max(np.abs(out_g.astype(np.float32) - out_bd.astype(np.float32)))
    )
    print(f"  block-diag vs grouped: bit_identical={bit_equal} "
          f"max|diff|={max_diff:.3e}")

    print("== dense block: concat topology cost ==")
    # One u3-style dense block (8 units) vs the same convs without the
    # growing concat (feeding a fixed 384-ch input): isolates the
    # concat/copy overhead from the conv work.
    dense = DenseBlock((1, 3), (128, 32), 8)
    xs = np.random.randn(B, 62, 62, 256).astype(jnp.bfloat16)
    xd = jax.device_put(xs)
    vd = jax.jit(dense.init)(rng, xs)
    vd = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vd
    )
    s = _slope(
        lambda n: _stage_chain(
            lambda vv, xx: jnp.pad(
                dense.apply(vv, xx)[..., :256],
                ((0, 0), (8, 8), (8, 8), (0, 0)),
            ),
            vd, n,
        ),
        xd,
    )
    fl = _stage_flops(lambda vv, xx: dense.apply(vv, xx), vd, xs)
    print(f"  {'u3 dense block (8 units)':28s} {s * 1e3:7.2f} ms  "
          f"{fl / 1e12:5.2f} TFLOP  MFU {fl / s / V5E_BF16_PEAK:.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hovernet":
        hovernet()
    else:
        main()

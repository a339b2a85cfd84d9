"""Fused DenseNet dense-layer Pallas kernel (inference) — measured NEGATIVE result.

Hypothesis: the DenseNet feature extractor (the reference's flagship backbone,
reference train.py:204 / its ``--save_feats`` hot path train.py:530-545) looked
HBM-bandwidth-bound on TPU (1915 fps at 512² = 29% MFU), with the per-layer
concatenated-state materialization as the suspected traffic. This kernel removes
that materialization entirely: one ``pallas_call`` runs a whole dense layer —
BN1→ReLU→conv1×1→BN2→ReLU→conv3×3 — over a **preallocated, spatially
zero-padded state buffer**, so each layer reads the growing state exactly once
and writes one growth part in place.

Measured on v5e at 512², batch 128 (exact numeric agreement with the XLA
graph): **1232 frames/sec vs 1924 for XLA** — the XLA graph wins. Breakdown
(tap-count ablation): the nine conv2 matmuls cost ~190 µs/frame (the 3×3's
32 useful output lanes waste 3/4 of the MXU either way), and the remaining
DMA + conv1 + per-tile overheads alone (~620 µs) already exceed XLA's whole
forward (520 µs) — i.e. XLA's fused concat+conv pipeline moves less memory
than the worst-case model predicted and overlaps it better than this
hand-scheduled grid. Kept as a tested, non-default path (the same honest
status as the concat-free XLA formulation in models/backbones/densenet.py);
the mechanics below are a working recipe for Mosaic stencil kernels.

Design (all constraints discovered on real hardware):

- the block state lives in HBM as ``(B, H+2, W+16, C_block_final)`` (1 zero
  row top/bottom, 8 zero cols left/right so every DMA offset is 8-sublane
  aligned — Mosaic requires *provable* tile alignment on sliced refs); layer
  ``j`` reads channels ``[0, round_up(C_j, 128))`` of a haloed spatial tile
  and writes its growth part **in place** (``input_output_aliases``) as a full
  128-lane group — already-live lanes copied through bit-exactly, the 32 new
  lanes from conv2, zeros beyond (Mosaic lane slices must be 128-aligned) —
  so the concatenation never exists;
- eval-mode BatchNorm is folded host-side to per-channel (inv, shift) vectors,
  applied on the VPU; both convs run on the MXU with f32 accumulation (the 3×3
  as nine shifted matmuls, horizontal taps via three shared sublane relayouts);
- input tiles are double-buffered (DMA for tile t+1 issued while t computes);
- the halo ring outside the real image is masked to zero after BN2/ReLU,
  reproducing conv2's zero padding exactly.

In-flight channels above ``C_j`` may be concurrently written by this same layer
(neighbor tiles) — they are multiplied by structurally-zero BN/weight rows or
rewritten bit-exactly, so any torn DMA read still contributes exactly 0.

``densenet_features_pallas`` drives the full feature extractor: stem,
transitions and the final BN/avg-pool run as plain XLA ops, all dense layers
run through the kernel. Output matches ``DenseNet.apply(..., train=False)``
(tests/test_pallas_dense.py; bf16 agreement on TPU: max rel 6e-2 at |x|>1e-3,
mean rel 1.7e-3).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval BatchNorm as per-channel affine: x*inv + shift (f32)."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    return inv, shift


def _pick_tile(side: int, c_pad: int, interpret: bool = False) -> int:
    """Largest tile dividing ``side`` whose double-buffered input fits ~5 MB.

    The input scratch is (2, tile+2, tile+16, c_pad) in the compute dtype —
    the +16 is the 8-col left/right alignment padding of the read window.
    """
    for tile in (64, 32, 16, 8):
        if side % tile == 0 and 2 * (tile + 2) * (tile + 16) * c_pad * 2 <= 5 * 2**20:
            return min(tile, side)
    if interpret and side <= 64:
        # Interpret mode does not enforce Mosaic's alignment rules, so small
        # unaligned sides (tests run 32² inputs down to side 4) are fine.
        return side
    # No 8-aligned divisor fits: Mosaic's sublane rule (DMA extents/offsets
    # provably 8-aligned) rules out non-multiple-of-8 tiles, so signal
    # "unsupported spatial size" rather than emit a kernel that fails to
    # compile on real TPU (e.g. side 28/14/7 for 224² inputs). Compiled-mode
    # support is 8-aligned spatial sizes only (the production path is 512²).
    return -1


def _layer_kernel(TH, TW, nH, nW, C_pad, C_in, H, W, dtype,
                  inv1, sh1, w1, inv2, sh2, w2, x_hbm, out_hbm,
                  xs, osc, in_sem, out_sem):
    t = pl.program_id(0)
    nsteps = pl.num_programs(0)
    TWW = TW + 16  # read-window width: left/right 8-col pads keep every DMA
    # offset 8-sublane aligned (Mosaic requires provable tile alignment)
    G = (C_in // 128) * 128  # 128-lane write group containing our part

    def tile_of(tt):
        b = tt // (nH * nW)
        r = tt % (nH * nW)
        y0 = pl.multiple_of((r // nW) * TH, TH)
        x0 = pl.multiple_of((r % nW) * TW, TW)
        return b, y0, x0

    def in_copy(tt, slot):
        b, y0, x0 = tile_of(tt)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(y0, TH + 2), pl.ds(x0, TWW), pl.ds(0, C_pad)],
            xs.at[slot], in_sem.at[slot],
        )

    def out_copy(tt):
        # single-buffered full-128-lane write: lanes [G, C_in) are rewritten
        # with their (unchanged) input values, [C_in, C_in+32) is the new part,
        # the rest zeros (they are zero/unwritten future-layer lanes). A plain
        # 32-lane slice write is impossible: Mosaic lane slices must be
        # 128-aligned. The ~512 KB DMA overlaps the next tile's compute.
        b, y0, x0 = tile_of(tt)
        return pltpu.make_async_copy(
            osc,
            out_hbm.at[b, pl.ds(y0 + 1, TH), pl.ds(x0 + 8, TW),
                       pl.ds(G, 128)],
            out_sem,
        )

    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        in_copy(0, 0).start()

    @pl.when(t + 1 < nsteps)
    def _():
        in_copy(t + 1, nslot).start()

    in_copy(t, slot).wait()

    raw = xs[slot]  # (TH+2, TWW, C_pad), compute dtype
    P = (TH + 2) * TWW
    h = jnp.maximum(raw * inv1[0].astype(dtype) + sh1[0].astype(dtype), 0)
    b1 = jax.lax.dot_general(
        h.reshape(P, C_pad), w1[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    b2 = jnp.maximum(b1 * inv2[0] + sh2[0], 0.0).reshape(TH + 2, TWW, 128)

    # zero everything outside the real image (conv2 zero padding; also kills
    # the values the alignment pads contribute). Image coords: buffer row
    # 1 + iy, buffer col 8 + ix.
    _, y0, x0 = tile_of(t)
    iy = y0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, TWW), 0)
    ix = x0 - 8 + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, TWW), 1)
    valid = ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)).astype(jnp.float32)
    b2 = (b2 * valid[:, :, None]).astype(dtype)

    # 3x3 conv as 9 matmuls. The three horizontal taps each cost ONE sublane
    # relayout (unaligned column slice), shared across the three row taps —
    # row slices are free vreg selections. (Naive per-tap slicing forced nine
    # relayouts and measured slower than the XLA graph; pltpu.roll would be
    # relayout-free but only supports 32-bit data.)
    # w2 arrives padded to (3, 3, 128, 128) with the part's 32 output columns
    # at lanes [C_in-G, C_in-G+32) — N<=128 costs the same MXU cycles, and the
    # result lands at its final lane offset.
    shifted = tuple(b2[:, 7 + dx:7 + dx + TW, :] for dx in range(3))
    acc = jnp.zeros((TH * TW, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = shifted[dx][dy:dy + TH].reshape(TH * TW, 128)
            acc = acc + jax.lax.dot_general(
                win, w2[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    part = acc.reshape(TH, TW, 128).astype(osc.dtype)

    # assemble the 128-lane write group: lanes [0, live) copy the (unchanged)
    # input values bit-exactly, the rest is the conv output (zero beyond +32)
    live = C_in - G  # 0, 32, 64 or 96 lanes already live in the group
    if live > 0:
        x_cp = raw[1:1 + TH, 8:8 + TW, G:G + 128].astype(osc.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TH, TW, 128), 2)
        group = jnp.where(lane < live, x_cp, part)
    else:
        group = part

    # reclaim the output buffer (previous step's DMA) before overwriting it
    @pl.when(t >= 1)
    def _():
        out_copy(t - 1).wait()

    osc[:] = group
    out_copy(t).start()

    @pl.when(t == nsteps - 1)
    def _():
        out_copy(t).wait()


def dense_layer_pallas(state, inv1, sh1, w1, inv2, sh2, w2, *, c_in: int,
                       dtype=jnp.bfloat16, interpret: bool = False):
    """One dense layer over the padded state buffer, in place.

    Args:
        state: (B, H+2, W+16, C_max) block state — 1 zero row of conv padding
            top/bottom, 8 zero cols left/right (so every DMA window offset and
            the interior write offset are 8-sublane aligned); channels
            ``[0, c_in)`` live; donated and returned with ``[c_in, c_in+32)``
            filled by this layer's growth part.
        inv1/sh1: (C_pad,) f32 folded BN1 (zero beyond ``c_in``).
        w1: (C_pad, F) conv1 kernel, rows beyond ``c_in`` zero.
        inv2/sh2: (F,) f32 folded BN2. w2: (3, 3, F, 32) conv2 kernel.
    """
    B, Hp, Wp, C_max = state.shape
    H, W = Hp - 2, Wp - 16
    C_pad = w1.shape[0]
    F = w1.shape[1]
    assert F == 128, "kernel assumes the DenseNet-121 bottleneck width"
    assert C_pad % 128 == 0 and C_pad <= C_max
    assert (c_in // 128 + 1) * 128 <= C_max  # the write group stays in bounds
    TH = _pick_tile(H, C_pad, interpret)
    TW = _pick_tile(W, C_pad, interpret)
    if TH <= 0 or TW <= 0:
        raise ValueError(f"unsupported spatial size ({H}, {W})")
    nH, nW = H // TH, W // TW

    kernel = functools.partial(_layer_kernel, TH, TW, nH, nW, C_pad, c_in,
                               H, W, dtype)
    return pl.pallas_call(
        kernel,
        grid=(B * nH * nW,),
        out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, TW + 16, C_pad), dtype),
            pltpu.VMEM((TH, TW, 128), state.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={6: 0},
        interpret=interpret,
    )(
        inv1.reshape(1, -1), sh1.reshape(1, -1), w1.astype(dtype),
        inv2.reshape(1, -1), sh2.reshape(1, -1), w2.astype(dtype),
        state,
    )


def _layer_operands(params, stats, c_in: int, dtype):
    """Fold one dense layer's BN params and zero-pad to the MXU-aligned width."""
    c_pad = _round_up(c_in, 128)
    inv1, sh1 = fold_bn(params["bn1"]["scale"], params["bn1"]["bias"],
                        stats["bn1"]["mean"], stats["bn1"]["var"])
    pad = c_pad - c_in
    inv1 = jnp.pad(inv1, (0, pad))
    sh1 = jnp.pad(sh1, (0, pad))
    w1 = jnp.pad(params["conv1"]["kernel"][0, 0], ((0, pad), (0, 0)))
    inv2, sh2 = fold_bn(params["bn2"]["scale"], params["bn2"]["bias"],
                        stats["bn2"]["mean"], stats["bn2"]["var"])
    # place the 32 conv2 output columns at the part's lane offset within its
    # 128-lane write group (see _layer_kernel): (3, 3, 128, 32) -> (3,3,128,128)
    live = c_in - (c_in // 128) * 128
    w2 = jnp.pad(params["conv2"]["kernel"], ((0, 0), (0, 0), (0, 0),
                                             (live, 128 - live - 32)))
    return inv1, sh1, w1.astype(dtype), inv2, sh2, w2


def densenet_features_pallas(spec, variables, x, *, dtype=jnp.bfloat16,
                             interpret: bool = False):
    """DenseNet feature extraction with Pallas dense layers.

    Equivalent to ``DenseNet(spec, dtype).apply(variables, x, train=False)``
    (reference backbone semantics: gluoncv DenseNet121.features + fixed
    AvgPool2D(7), reference train.py:204); stem/transitions/head are XLA ops,
    every dense layer runs through :func:`dense_layer_pallas`.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    dn = ("NHWC", "HWIO", "NHWC")

    x = x.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, params["conv0"]["kernel"].astype(dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    inv, sh = fold_bn(params["bn0"]["scale"], params["bn0"]["bias"],
                      stats["bn0"]["mean"], stats["bn0"]["var"])
    x = jnp.maximum(x * inv + sh, 0.0).astype(dtype)
    x = jax.lax.reduce_window(
        x, jnp.array(-jnp.inf, dtype), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    channels = spec.num_init_features
    for i, num_layers in enumerate(spec.block_config):
        c_final = channels + num_layers * spec.growth_rate
        assert c_final % 128 == 0, "block-final width must be MXU-aligned"
        # padded state buffer: 1 zero row top/bottom, 8 zero cols left/right
        # (8-sublane-aligned DMA offsets), block-final channel width
        state = jnp.pad(
            x, ((0, 0), (1, 1), (8, 8), (0, c_final - channels))
        )
        for j in range(num_layers):
            ops = _layer_operands(params[f"block{i}_layer{j}"],
                                  stats[f"block{i}_layer{j}"], channels, dtype)
            state = dense_layer_pallas(state, *ops, c_in=channels, dtype=dtype,
                                       interpret=interpret)
            channels += spec.growth_rate
        x = state[:, 1:-1, 8:-8, :]

        if i != len(spec.block_config) - 1:
            inv, sh = fold_bn(
                params[f"transition{i}"]["bn"]["scale"],
                params[f"transition{i}"]["bn"]["bias"],
                stats[f"transition{i}"]["bn"]["mean"],
                stats[f"transition{i}"]["bn"]["var"],
            )
            h = jnp.maximum(x.astype(jnp.float32) * inv + sh, 0.0).astype(dtype)
            x = jnp.einsum(
                "bhwc,cf->bhwf", h,
                params[f"transition{i}"]["conv"]["kernel"][0, 0].astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            x = jax.lax.reduce_window(
                x, jnp.array(0, dtype), jax.lax.add, (1, 2, 2, 1),
                (1, 2, 2, 1), ((0, 0), (0, 0), (0, 0), (0, 0)),
            ) / jnp.array(4, dtype)
            channels //= 2

    inv, sh = fold_bn(params["bn_final"]["scale"], params["bn_final"]["bias"],
                      stats["bn_final"]["mean"], stats["bn_final"]["var"])
    x = jnp.maximum(x.astype(jnp.float32) * inv + sh, 0.0).astype(dtype)
    k = min(7, x.shape[1])
    x = jax.lax.reduce_window(
        x, jnp.array(0, dtype), jax.lax.add, (1, k, k, 1), (1, k, k, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)),
    ) / jnp.array(k * k, dtype)
    return x.reshape(x.shape[0], -1)


def frame_model_apply_pallas(model, variables, x, *, interpret: bool = False):
    """Inference fast path for ``FrameModel(DenseNet...)``: Pallas dense layers
    for the backbone plus the Dense head — a drop-in for
    ``model.apply(variables, x, train=False)`` on prepared (normalized) inputs.
    """
    from tennis_tpu.models.backbones.densenet import DenseNet

    backbone = model.backbone
    if not isinstance(backbone, DenseNet):
        raise TypeError(f"pallas fast path needs a DenseNet backbone, "
                        f"got {type(backbone).__name__}")
    feats = densenet_features_pallas(
        backbone.spec,
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        x, dtype=backbone.dtype, interpret=interpret,
    )
    if model.num_classes > 0:
        head = variables["params"]["classes"]
        feats = (feats.astype(model.dtype) @ head["kernel"].astype(model.dtype)
                 + head["bias"].astype(model.dtype))
    return feats.astype(jnp.float32)

"""Strided-lane stage-transition kernels (ops/pallas/transition.py) and
their model integration (ResidualBlock.apply_lane_through, the Sequential
lane-through branch).

Reference parity target: the transition composite in models/blocks.py
ResidualBlock._forward (preact branch) — norm1/relu/dropout, stride-2
conv1 with symmetric padding 1, subsample(+proj | +zero-pad) — itself the
analog of reference resnet/architectures/residual_block.py:8-99. Values
are compared at int8-quantization tolerance; gradients (straight-through
mode, f32 on CPU) against the float composite's VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models.blocks import ResidualBlock
from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    dropout_thresh,
    fold_bn,
)
from pytorch_ddp_resnet_tpu.ops.pallas.transition import (
    parity_pack,
    parity_unpack,
    transition_half_int8,
)

B, H, W, CIN, COUT = 8, 16, 16, 32, 64
N = B * H * W


def transition_reference(x_cs, w1, wp, scale, shift, bits, rate, h, w):
    """Float composite the kernel replaces, in lane layout: prologue
    (with the kernel's parity-packed bit placement), lax stride-2 conv
    with symmetric padding 1, proj/option-A shortcut, norm2 stats."""
    cd = x_cs.dtype
    cin, n = x_cs.shape
    b = n // (h * w)
    xp = parity_pack(x_cs, h, w)
    scale4 = jnp.tile(scale.astype(jnp.float32), 4)
    shift4 = jnp.tile(shift.astype(jnp.float32), 4)
    nrm = (xp.astype(jnp.float32) * scale4[:, None]
           + shift4[:, None]).astype(jnp.float32)
    r = jnp.maximum(nrm, 0)
    thresh = dropout_thresh(rate)
    if thresh < 256 and bits is not None:
        r = jnp.where(bits < jnp.uint8(thresh), r / (thresh / 256.0),
                      jnp.zeros_like(r))
    d_cs = parity_unpack(r, h, w).astype(cd)
    d = jnp.transpose(d_cs.reshape(cin, b, h, w), (1, 2, 3, 0))
    z = jax.lax.conv_general_dilated(
        d, w1.astype(cd), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    cout = z.shape[-1]
    oh, ow = h // 2, w // 2
    z_cs = jnp.transpose(z, (3, 0, 1, 2)).reshape(cout, b * oh * ow)
    x_nhwc = jnp.transpose(x_cs.reshape(cin, b, h, w), (1, 2, 3, 0))
    sub = x_nhwc[:, ::2, ::2, :]
    if wp is not None:
        res = jnp.einsum("bhwc,cd->bhwd", sub.astype(cd), wp.astype(cd))
    else:
        res = jnp.pad(sub, ((0, 0), (0, 0), (0, 0), (0, cout - cin)))
    res_cs = jnp.transpose(res, (3, 0, 1, 2)).reshape(cout, b * oh * ow)
    zf = z_cs.astype(jnp.float32)
    return (z_cs, jnp.sum(zf, axis=1), jnp.sum(jnp.square(zf), axis=1),
            res_cs.astype(cd))


def _inputs(rng_np, use_proj=True, cin=CIN, cout=COUT, dtype=jnp.float32):
    x = jnp.asarray(rng_np.normal(size=(cin, N)), dtype)
    w1 = jnp.asarray(rng_np.normal(size=(3, 3, cin, cout))
                     * (9 * cin) ** -0.5, jnp.float32)
    wp = (jnp.asarray(rng_np.normal(size=(cin, cout)) * cin ** -0.5,
                      jnp.float32) if use_proj else None)
    gamma = jnp.asarray(rng_np.normal(size=(cin,)) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng_np.normal(size=(cin,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng_np.normal(size=(cin,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng_np.uniform(0.5, 2, size=(cin,)), jnp.float32)
    scale, shift = fold_bn(gamma, beta, mean, var)
    bits = jnp.asarray(rng_np.integers(0, 256, size=(4 * cin, N // 4)),
                       jnp.uint8)
    return x, w1, wp, scale, shift, bits


def test_parity_pack_roundtrip(rng_np):
    x = jnp.asarray(rng_np.normal(size=(CIN, N)), jnp.float32)
    xp = parity_pack(x, H, W)
    assert xp.shape == (4 * CIN, N // 4)
    np.testing.assert_array_equal(np.asarray(parity_unpack(xp, H, W)),
                                  np.asarray(x))
    # plane semantics: plane p = 2*(h%2)+(w%2) at output coords
    xn = np.transpose(np.asarray(x).reshape(CIN, B, H, W), (1, 2, 3, 0))
    xpn = np.asarray(xp)
    for ph in range(2):
        for pw in range(2):
            p = 2 * ph + pw
            plane = xpn[p * CIN:(p + 1) * CIN].reshape(
                CIN, B, H // 2, W // 2)
            np.testing.assert_array_equal(
                np.transpose(plane, (1, 2, 3, 0)),
                xn[:, ph::2, pw::2, :])


@pytest.mark.parametrize("rate,use_proj", [
    (0.0, True), (0.3, True), (0.0, False), (0.3, False)])
def test_forward_close_to_float_reference(rng_np, rate, use_proj):
    x, w1, wp, scale, shift, bits = _inputs(rng_np, use_proj)
    bb = bits if rate > 0 else None
    z1, s1, q1, r1 = transition_half_int8(
        x, w1, wp, scale, shift, bb, dropout_rate=rate, h=H, w_img=W,
        interpret=True)
    z2, s2, q2, r2 = transition_reference(x, w1, wp, scale, shift, bb,
                                          rate, H, W)
    zd = np.abs(np.asarray(z1, np.float32) - np.asarray(z2, np.float32))
    assert zd.max() / (np.abs(np.asarray(z2, np.float32)).max() + 1e-9) \
        < 0.05
    sd = np.abs(np.asarray(s1) - np.asarray(s2))
    assert sd.max() / (np.abs(np.asarray(s2)).max() + 1e-9) < 0.05
    # the shortcut path does not quantize: bf16/f32-exact
    np.testing.assert_allclose(np.asarray(r1, np.float32),
                               np.asarray(r2, np.float32), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("use_proj", [True, False])
def test_gradients_match_float_composite(rng_np, use_proj):
    """Straight-through mode on f32 inputs: backward kernels evaluate at
    the unquantized point in f32, so all gradients must match the float
    composite's VJP to rounding (the only linearization difference is
    dzsum/dzssq folding around the quantized z — exercised separately)."""
    x, w1, wp, scale, shift, bits = _inputs(rng_np, use_proj)
    cout = w1.shape[3]
    n_out = N // 4
    ct_z = jnp.asarray(rng_np.normal(size=(cout, n_out)), jnp.float32)
    ct_r = jnp.asarray(rng_np.normal(size=(cout, n_out)), jnp.float32)

    def loss_with(fn):
        def loss(*args):
            z, zsum, zssq, res = fn(*args)
            return jnp.sum(z * ct_z) + jnp.sum(res * ct_r)
        return loss

    def run_kernel(x, w1, *rest):
        wp_, scale_, shift_ = ((rest[0], rest[1], rest[2]) if use_proj
                               else (None, rest[0], rest[1]))
        return transition_half_int8(
            x, w1, wp_, scale_, shift_, bits, dropout_rate=0.3, h=H,
            w_img=W, interpret=True)

    def run_ref(x, w1, *rest):
        wp_, scale_, shift_ = ((rest[0], rest[1], rest[2]) if use_proj
                               else (None, rest[0], rest[1]))
        return transition_reference(x, w1, wp_, scale_, shift_, bits,
                                    0.3, H, W)

    args = (x, w1) + ((wp,) if use_proj else ()) + (scale, shift)
    nargs = len(args)
    g_k = jax.grad(loss_with(run_kernel), argnums=tuple(range(nargs)))(*args)
    g_r = jax.grad(loss_with(run_ref), argnums=tuple(range(nargs)))(*args)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_stats_cotangents_flow(rng_np):
    """A loss through zsum/zssq (norm2 differentiating its batch stats)
    stays finite and close to the float composite's gradient."""
    x, w1, wp, scale, shift, _ = _inputs(rng_np)

    def loss_with(fn):
        def loss(x, w1):
            z, zsum, zssq, res = fn(x, w1, wp, scale, shift, None)
            return jnp.sum(zsum * zssq) * 1e-3
        return loss

    run_k = lambda *a: transition_half_int8(  # noqa: E731
        *a, dropout_rate=0.0, h=H, w_img=W, interpret=True)
    run_r = lambda *a: transition_reference(*a, 0.0, H, W)  # noqa: E731
    g_k = jax.grad(loss_with(run_k), argnums=(0, 1))(x, w1)
    g_r = jax.grad(loss_with(run_r), argnums=(0, 1))(x, w1)
    for a, b in zip(g_k, g_r):
        an, bn = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(an))
        # linearized around the quantized z: int8-grain agreement
        denom = np.abs(bn).max() + 1e-9
        assert np.abs(an - bn).max() / denom < 0.05


def test_fqt_gradients_close_to_exact(rng_np):
    """quant_bwd=True (FQT): int8 dgrad/wgrad with per-tile cotangent
    scales — gradients finite and within int8-grain distance of the
    straight-through (exact) backward."""
    x, w1, wp, scale, shift, bits = _inputs(rng_np)
    cout = w1.shape[3]
    ct_z = jnp.asarray(rng_np.normal(size=(cout, N // 4)), jnp.float32)

    def loss_for(quant_bwd):
        def loss(x, w1, wp):
            z, zsum, zssq, res = transition_half_int8(
                x, w1, wp, scale, shift, bits, dropout_rate=0.3, h=H,
                w_img=W, quant_bwd=quant_bwd, interpret=True)
            return jnp.sum(z * ct_z) + jnp.sum(res)
        return loss

    g_q = jax.grad(loss_for(True), argnums=(0, 1, 2))(x, w1, wp)
    g_e = jax.grad(loss_for(False), argnums=(0, 1, 2))(x, w1, wp)
    for a, b in zip(g_q, g_e):
        an, bn = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(an))
        assert np.abs(an - bn).max() / (np.abs(bn).max() + 1e-9) < 0.08
    # the proj chain stays bf16/f32 in both modes: exact agreement
    np.testing.assert_allclose(np.asarray(g_q[2]), np.asarray(g_e[2]),
                               rtol=1e-5, atol=1e-6)


def test_input_validation(rng_np):
    x, w1, wp, scale, shift, bits = _inputs(rng_np)
    with pytest.raises(ValueError, match="needs a bits"):
        transition_half_int8(x, w1, wp, scale, shift, None,
                             dropout_rate=0.3, h=H, w_img=W,
                             interpret=True)
    with pytest.raises(ValueError, match="even"):
        transition_half_int8(x[:, :B * 7 * W], w1, wp, scale, shift, None,
                             dropout_rate=0.0, h=7, w_img=W,
                             interpret=True)


def _block(use_proj, mesh=None, quant_bwd=True, dropout=0.3):
    return ResidualBlock(
        channels=CIN, downsample=True, preact=True, use_proj=use_proj,
        dropout_prob=dropout, compute_dtype=jnp.float32, int8_train=True,
        int8_train_bwd=quant_bwd, lane_transition=True, shard_mesh=mesh)


@pytest.mark.parametrize("use_proj", [True, False])
def test_block_lane_through_matches_lane_entry_class(rng_np, use_proj):
    """ResidualBlock.apply_lane_through vs the standard layer path: same
    int8-grain agreement class as the lane-entry path, and gradients
    finite/nonzero. (Bit streams differ by sanctioned divergence — run
    dropout-free for value comparison.)"""
    blk = _block(use_proj, dropout=0.0)
    x_shape = (B, H, W, CIN)
    params, state, out_shape = blk.init(jax.random.key(0), (H, W, CIN))
    x = jax.random.normal(jax.random.key(1), x_shape, jnp.float32)
    x_cs = jnp.transpose(x, (3, 0, 1, 2)).reshape(CIN, N)

    assert blk.lane_through_eligible(x_shape, train=True)
    y_cs, oshape, ns = blk.apply_lane_through(
        params, state, x_cs, x_shape, train=True, rng=jax.random.key(2))
    assert oshape == (B, H // 2, W // 2, COUT)
    y_lane = jnp.transpose(
        y_cs.reshape(COUT, B, H // 2, W // 2), (1, 2, 3, 0))

    y_ref, ns_ref = super(ResidualBlock, blk)._apply_impl(
        params, state, x, train=True, rng=jax.random.key(2))
    yd = np.abs(np.asarray(y_lane, np.float32)
                - np.asarray(y_ref, np.float32))
    assert yd.max() / (np.abs(np.asarray(y_ref, np.float32)).max()
                       + 1e-9) < 0.08
    # BatchNorm EMA states advanced identically (stats are exact sums
    # of the respective z's — int8-grain apart)
    for k in ("norm1", "norm2"):
        a = np.asarray(ns[k]["mean"], np.float32)
        b = np.asarray(ns_ref[k]["mean"], np.float32)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-9) < 0.05


def test_block_lane_through_gradients(rng_np):
    blk = _block(True)
    params, state, _ = blk.init(jax.random.key(0), (H, W, CIN))
    x_cs = jax.random.normal(jax.random.key(1), (CIN, N), jnp.float32)

    def loss(p):
        y, _, _ = blk.apply_lane_through(
            p, state, x_cs, (B, H, W, CIN), train=True,
            rng=jax.random.key(2))
        return jnp.sum(jnp.square(y))

    val, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in leaves)
    # every parameter participates: conv1, conv2, proj, both norms
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, v in flat:
        assert float(jnp.max(jnp.abs(v))) > 0, path


def test_sequential_lane_through_integration():
    """A mini trunk (fused stage-1 block -> transition -> fused stage-2
    block) runs end-to-end with the lane run crossing the transition, and
    matches the layer-by-layer path at int8 grain (dropout-free)."""
    from pytorch_ddp_resnet_tpu.models.layers import Sequential

    def make(int8):
        blocks = (
            ("b0", ResidualBlock(
                channels=CIN, downsample=False, preact=True,
                use_proj=True, dropout_prob=0.0,
                compute_dtype=jnp.float32, int8_train=int8,
                int8_train_bwd=int8)),
            ("t", ResidualBlock(
                channels=CIN, downsample=True, preact=True, use_proj=True,
                dropout_prob=0.0, compute_dtype=jnp.float32,
                int8_train=int8, int8_train_bwd=int8,
                lane_transition=int8)),
            ("b1", ResidualBlock(
                channels=COUT, downsample=False, preact=True,
                use_proj=True, dropout_prob=0.0,
                compute_dtype=jnp.float32, int8_train=int8,
                int8_train_bwd=int8)),
        )
        return Sequential(blocks)

    seq = make(True)
    params, state, _ = seq.init(jax.random.key(0), (H, W, CIN))
    x = jax.random.normal(jax.random.key(1), (B, H, W, CIN), jnp.float32)
    y, ns = seq.apply(params, state, x, train=True, rng=jax.random.key(2))
    assert y.shape == (B, H // 2, W // 2, COUT)
    y_ref, _ = make(False).apply(params, state, x, train=True,
                                 rng=jax.random.key(2))
    yd = np.abs(np.asarray(y, np.float32) - np.asarray(y_ref, np.float32))
    assert yd.max() / (np.abs(np.asarray(y_ref, np.float32)).max()
                       + 1e-9) < 0.10
    assert np.all(np.isfinite(np.asarray(y, np.float32)))


def test_shard_map_equivalence():
    """8-device CPU mesh: the lane-through transition under shard_map
    (psum'd norm2 stats, per-shard bits) equals the single-device run at
    int8 grain for values and EXACTLY for the dropout-free stats sums."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    blk1 = _block(True, mesh=None, dropout=0.0)
    blk8 = _block(True, mesh=mesh, dropout=0.0)
    params, state, _ = blk1.init(jax.random.key(0), (H, W, CIN))
    b = 16
    x_cs = jax.random.normal(jax.random.key(1), (CIN, b * H * W),
                             jnp.float32)
    shape = (b, H, W, CIN)
    assert blk8.lane_through_eligible(shape, train=True)
    y1, s1, n1 = blk1.apply_lane_through(params, state, x_cs, shape,
                                         train=True, rng=jax.random.key(2))
    y8, s8, n8 = blk8.apply_lane_through(params, state, x_cs, shape,
                                         train=True, rng=jax.random.key(2))
    assert s1 == s8
    a, bb = np.asarray(y1, np.float32), np.asarray(y8, np.float32)
    # per-shard tile decomposition differs -> int8-grain agreement
    assert np.abs(a - bb).max() / (np.abs(bb).max() + 1e-9) < 0.05
    np.testing.assert_allclose(
        np.asarray(n1["norm2"]["mean"]), np.asarray(n8["norm2"]["mean"]),
        rtol=2e-2, atol=2e-3)
